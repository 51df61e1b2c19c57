"""Native C++ output tier: compaction parity vs numpy, render/encode."""

import numpy as np
import pytest

from sift_features_tpu.io import native_output


@pytest.fixture(scope="module")
def lib_available():
    try:
        native_output._get_lib()
    except native_output.NativeOutputUnavailable as e:
        pytest.skip(f"native output unavailable: {e}")


@pytest.mark.smoke
def test_compact_matches_numpy(lib_available):
    rng = np.random.RandomState(0)
    B, K, D = 5, 193, 128
    kps = rng.rand(B, K, 5).astype(np.float32)
    desc = (rng.rand(B, K, D) * 255).astype(np.uint8)
    valid = rng.rand(B, K) > 0.6
    valid[2] = False   # empty frame
    valid[3] = True    # full frame
    got = native_output.compact_batch(kps, desc, valid, n_threads=3)
    assert len(got) == B
    for f in range(B):
        np.testing.assert_array_equal(got[f][0], kps[f][valid[f]])
        np.testing.assert_array_equal(got[f][1], desc[f][valid[f]])


@pytest.mark.smoke
def test_render_and_encode(lib_available, tmp_path):
    rng = np.random.RandomState(1)
    img1 = (rng.rand(60, 80) * 255).astype(np.uint8)
    img2 = (rng.rand(50, 70) * 255).astype(np.uint8)
    k1 = np.array([[10, 10, 6, 0, 1], [60, 40, 4, 0, 1]], np.float32)
    k2 = np.array([[30, 20, 8, 0, 1]], np.float32)
    pairs = np.array([[0, 0], [1, 0]], np.int32)
    out = native_output.render_matches(img1, k1, img2, k2, pairs)
    assert out.shape == (60, 150, 3)
    # untouched gray regions replicate the source; drawings cover the rest
    assert (out[:60, :80, 0] == img1).mean() > 0.9
    assert (out[50:, 80:] == 0).all()  # below img2: black padding
    colored = (out[..., 0] != out[..., 1]) | (out[..., 1] != out[..., 2])
    assert colored.sum() > 50  # circles + lines actually drawn
    # deterministic
    np.testing.assert_array_equal(
        out, native_output.render_matches(img1, k1, img2, k2, pairs))
    # out-of-range match index is an error, not a scribble
    with pytest.raises(RuntimeError, match="out of range"):
        native_output.render_matches(img1, k1, img2, k2,
                                     np.array([[5, 0]], np.int32))

    path = str(tmp_path / "m.jpg")
    native_output.write_jpeg(path, out)
    from sift_features_tpu.io.native_loader import (NativeLoaderUnavailable,
                                                    decode_gray)

    try:
        dec = decode_gray(path)
    except NativeLoaderUnavailable:
        pytest.skip("loader unavailable for decode check")
    assert dec.shape == (60, 150)
    # gray background survives the jpeg roundtrip approximately
    assert np.abs(dec[:50, :60].astype(int)
                  - img1[:50, :60].astype(int)).mean() < 16


@pytest.mark.smoke
def test_encode_gray(lib_available, tmp_path):
    img = np.tile(np.arange(128, dtype=np.uint8), (64, 1))
    path = str(tmp_path / "g.jpg")
    native_output.write_jpeg(path, img, quality=95)
    from sift_features_tpu.io.native_loader import (NativeLoaderUnavailable,
                                                    decode_gray)

    try:
        dec = decode_gray(path)
    except NativeLoaderUnavailable:
        pytest.skip("loader unavailable for decode check")
    assert dec.shape == img.shape
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 8
