"""Native C++ data loader: decode parity vs cv2 and batch-pool behavior."""

import numpy as np
import pytest

from sift_features_tpu.io import native_loader


@pytest.fixture(scope="module")
def lib_available():
    try:
        native_loader._get_lib()
    except native_loader.NativeLoaderUnavailable as e:
        pytest.skip(f"native loader unavailable: {e}")


def test_decode_matches_cv2(reference_root, lib_available):
    import cv2

    path = f"{reference_root}/images/bird_small.jpg"
    ours = native_loader.decode_gray(path, luma="jpeg-gray")
    cv = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
    assert ours.shape == cv.shape
    # same libjpeg color path; allow <=1 gray level for DCT implementation
    # differences between system libjpeg and cv2's bundled turbo
    diff = np.abs(ours.astype(np.int16) - cv.astype(np.int16))
    assert diff.max() <= 1 and (diff > 0).mean() < 0.05, (
        diff.max(), (diff > 0).mean())


def test_decode_bt709_matches_python(reference_root, lib_available):
    from sift_features_tpu.io.image import load_gray

    path = f"{reference_root}/images/bird_small.jpg"
    ours = native_loader.decode_gray(path, luma="bt709")
    ref = load_gray(path, "image-crate")
    diff = np.abs(ours.astype(np.int16) - ref.astype(np.int16))
    assert diff.max() <= 1, diff.max()


def test_batch_loader(reference_root, lib_available):
    paths = [f"{reference_root}/images/bird_small.jpg",
             f"{reference_root}/images/tree_small.jpg",
             f"{reference_root}/images/bird_small.jpg"]
    bl = native_loader.BatchLoader(paths, batch=2, hw=(320, 416),
                                   luma="jpeg-gray")
    batches = [b.copy() for b in bl]
    bl.close()
    assert len(batches) == 2
    assert batches[0].shape == (2, 320, 416)
    assert batches[1].shape == (1, 320, 416)
    single = native_loader.decode_gray(paths[0], luma="jpeg-gray")
    h = min(320, single.shape[0])
    w = min(416, single.shape[1])
    np.testing.assert_array_equal(batches[0][0, :h, :w], single[:h, :w])
    # zero padding outside the decoded region
    assert (batches[0][0, single.shape[0]:, :] == 0).all()
    np.testing.assert_array_equal(batches[1][0], batches[0][0])
