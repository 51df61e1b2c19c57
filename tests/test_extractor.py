"""End-to-end JAX extractor vs the exact-semantics oracle.

The oracle runs the NumpyProcessing backend (bit-level twin of the JAX pixel
ops) so the only differences are XLA FMA fusion ULPs and scatter-accumulation
order — measured here: identical keypoint sets, fields within ~3e-4, ~99%
descriptor rows byte-exact.
"""

import numpy as np
import pytest

from sift_features_tpu.models import extractor
from sift_features_tpu.oracle import oracle
from sift_features_tpu.oracle.processing import NumpyProcessing


def _compare(img, kp_tol, desc_row_frac, count_slack=0):
    kps_j, desc_j = extractor.extract(img)
    kps_o, desc_o = oracle.sift(img, proc=NumpyProcessing)
    assert abs(len(kps_j) - len(kps_o)) <= count_slack, (len(kps_j), len(kps_o))
    if len(kps_j) == len(kps_o):
        np.testing.assert_allclose(kps_j, kps_o, rtol=0, atol=kp_tol)
        frac = (desc_j == desc_o).all(axis=1).mean()
        assert frac >= desc_row_frac, f"desc rows byte-exact: {frac}"
    return kps_j, desc_j


def test_extractor_vs_oracle_crop(bird_small_cv2):
    img = bird_small_cv2[:96, :128]
    _compare(img, kp_tol=1e-3, desc_row_frac=0.95)


def test_extractor_determinism(bird_small_cv2):
    img = bird_small_cv2[:96, :128]
    a_k, a_d = extractor.extract(img)
    b_k, b_d = extractor.extract(img)
    assert np.array_equal(a_k, b_k) and np.array_equal(a_d, b_d)


def test_extractor_features_limit(bird_small_cv2):
    img = bird_small_cv2[:96, :128]
    kps, desc = extractor.extract(img, features_limit=5)
    assert kps.shape == (5, 5) and desc.shape == (5, 128)
    assert np.all(np.diff(kps[:, 4]) <= 0)


def test_extractor_stage_counters(bird_small_cv2):
    img = bird_small_cv2[:96, :128]
    res = extractor.extract_batch(img[None])
    n_cand = np.asarray(res["n_candidates"])[0]
    n_emit = np.asarray(res["n_emitted"])[0]
    assert (n_cand >= 0).all() and n_cand.sum() > 0
    assert n_emit.sum() == np.asarray(res["valid"])[0].sum()


@pytest.mark.slow
def test_extractor_vs_oracle_full(bird_small_cv2):
    _compare(bird_small_cv2, kp_tol=1e-3, desc_row_frac=0.98)


@pytest.mark.slow
def test_extractor_batch_consistency(bird_small_cv2):
    """Batched extraction must equal single extraction per frame."""
    img = bird_small_cv2[:96, :128]
    imgs = np.stack([img, img[::-1, ::-1].copy()])
    res = extractor.extract_batch(imgs)
    k0, d0 = extractor.extract(imgs[0])
    k1, d1 = extractor.extract(imgs[1])
    v = np.asarray(res["valid"])
    assert np.array_equal(np.asarray(res["kps"])[0][v[0]], k0)
    assert np.array_equal(np.asarray(res["kps"])[1][v[1]], k1)
    assert np.array_equal(np.asarray(res["desc"])[1][v[1]], d1)
