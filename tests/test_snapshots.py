"""Golden fixture parsing (reference snapshots, src/snapshots/*.snap)."""

import numpy as np
import pytest

from sift_features_tpu.io.snapshots import load_golden


pytestmark = pytest.mark.smoke


def test_load_bird_small(reference_root):
    kps, desc = load_golden(reference_root, "bird_small")
    assert kps.shape == (225, 5)
    assert desc.shape == (225, 128)
    assert kps.dtype == np.float32 and desc.dtype == np.uint8
    # spot values from sift__sift_end2end-3.snap lines 5-9
    assert np.isclose(kps[0, 0], 13.518987)
    assert np.isclose(kps[0, 3], 97.77814)
    # sorted by (x, y, size) per lib.rs:1021-1031
    assert np.all(np.diff(kps[:, 0]) >= 0)


def test_load_tree_small(reference_root):
    kps, desc = load_golden(reference_root, "tree_small")
    assert kps.shape == (1270, 5)
    assert desc.shape == (1270, 128)
