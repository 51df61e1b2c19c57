"""The precompute / detect+describe split (reference lib.rs:131-177 seam)."""

import numpy as np

from sift_features_tpu.models import extractor


def test_split_matches_fused(bird_small_cv2):
    img = bird_small_cv2[:96, :128]
    octs, dogs = extractor.precompute(img[None])
    assert len(octs) == len(dogs)
    assert octs[0].shape[1] == 6 and dogs[0].shape[1] == 5
    res_split = extractor.extract_with_precomputed(octs, dogs)
    res_fused = extractor.extract_batch(img[None])
    v_s = np.asarray(res_split["valid"])[0]
    v_f = np.asarray(res_fused["valid"])[0]
    assert v_s.sum() == v_f.sum()
    k_s = np.asarray(res_split["kps"])[0][v_s]
    k_f = np.asarray(res_fused["kps"])[0][v_f]
    # same program math, but separately compiled graphs may fuse FMAs
    # differently -> tiny float slack
    np.testing.assert_allclose(k_s, k_f, rtol=0, atol=1e-4)
    d_s = np.asarray(res_split["desc"])[0][v_s].astype(np.int32)
    d_f = np.asarray(res_fused["desc"])[0][v_f].astype(np.int32)
    assert (np.abs(d_s - d_f) <= 1).all()


def test_pyramid_shapes(bird_small_cv2):
    img = bird_small_cv2[:64, :80]
    octs, _ = extractor.precompute(img[None])
    h, w = 128, 160
    for o in octs:
        assert o.shape[-2:] == (h, w)
        h, w = h // 2, w // 2
