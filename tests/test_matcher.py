"""Matcher parity vs cv2.BFMatcher (NORM_L2, crossCheck=True) — the behavior
the reference demonstrates via OpenCV in examples/sift-match.rs:30-39."""

import numpy as np
import pytest

from sift_features_tpu.ops.matcher import match_brute_force


pytestmark = pytest.mark.smoke


def _cv2_matches(d1, d2, cross_check=True):
    import cv2

    bf = cv2.BFMatcher(cv2.NORM_L2, crossCheck=cross_check)
    bf.add([d1.astype(np.float32)])
    ms = bf.match(d2.astype(np.float32))
    return sorted((m.queryIdx, m.trainIdx, m.distance) for m in ms)


def test_matcher_parity_random():
    rng = np.random.RandomState(0)
    d1 = rng.randint(0, 256, (500, 128)).astype(np.uint8)
    d2 = rng.randint(0, 256, (400, 128)).astype(np.uint8)
    ours = match_brute_force(d1, d2, cross_check=True)
    ours_set = sorted(zip(ours.query_idx.tolist(), ours.train_idx.tolist(),
                          ours.distance.tolist()))
    cv = _cv2_matches(d1, d2)
    assert len(ours_set) == len(cv)
    for (q1, t1, dd1), (q2, t2, dd2) in zip(ours_set, cv):
        assert q1 == q2 and t1 == t2
        assert abs(dd1 - dd2) < 1e-2


def test_matcher_no_crosscheck():
    rng = np.random.RandomState(1)
    d1 = rng.randint(0, 256, (100, 128)).astype(np.uint8)
    d2 = rng.randint(0, 256, (64, 128)).astype(np.uint8)
    ours = match_brute_force(d1, d2, cross_check=False)
    assert len(ours.query_idx) == 64
    cv = _cv2_matches(d1, d2, cross_check=False)
    ours_set = sorted(zip(ours.query_idx.tolist(), ours.train_idx.tolist()))
    assert ours_set == [(q, t) for q, t, _ in cv]


def test_matcher_identical_descriptors():
    rng = np.random.RandomState(2)
    d = rng.randint(0, 256, (64, 128)).astype(np.uint8)
    ours = match_brute_force(d, d, cross_check=True)
    assert np.array_equal(ours.query_idx, ours.train_idx)
    assert np.allclose(ours.distance, 0)
