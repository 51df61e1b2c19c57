"""Validation of the NumPy oracle — the exact-semantics CPU reference that the
TPU kernels unit-test against.

Two independent cross-checks:
 1. vs cv2.SIFT on the identical gray input (same OpenCV blur backend ⇒ the
    detection/orientation math must agree to ~1e-3 px; OpenCV reports size 2x).
 2. vs the reference crate's committed snapshot goldens, as a correspondence
    test. Byte-exactness vs the goldens is unattainable in this environment:
    the goldens bake in zune-jpeg decode (image 0.25.2) whose exact IDCT /
    upsampling rounding cannot be reproduced here (no crate source, zero
    egress). FIRST-DIVERGENCE ATTRIBUTION (round 2): the divergence is
    entirely at STAGE 0 (decoded u8 pixels) —
      * same pipeline + same decoder (test 1): 99.1% (bird) / 100.0% (tree)
        keypoint-exact at 1e-3 px vs this machine's cv2.SIFT;
      * goldens (identical pipeline semantics, different decoder): a sweep
        of libjpeg decode knobs (DCT islow/ifast/float x fancy/plain chroma
        upsampling, native/sift_loader.cpp options bits) moves bird_small
        correspondence 84.4-88.4% and tree_small 91.3-93.1%, with no
        consistent winner — i.e. ±1-gray-level decoder noise alone moves
        correspondence by several points, fully covering the gap;
      * round-1 control: re-running the SAME pipeline on two decodes that
        differ by mean 1.8 gray levels drops self-correspondence to ~89%.
"""

import numpy as np
import pytest

from sift_features_tpu.io.snapshots import load_golden
from sift_features_tpu.oracle import oracle


@pytest.fixture(scope="module")
def oracle_result_cv2gray(bird_small_cv2):
    return oracle.sift(bird_small_cv2)


def test_oracle_matches_cv2_sift(bird_small_cv2, oracle_result_cv2gray):
    import cv2

    kps, desc = oracle_result_cv2gray
    s = cv2.SIFT_create(contrastThreshold=0.04, edgeThreshold=10, sigma=1.6)
    ckps, cdesc = s.detectAndCompute(bird_small_cv2, None)
    carr = np.array([[k.pt[0], k.pt[1], k.size / 2, k.angle, k.response] for k in ckps],
                    np.float32)
    # cv2 dedups keypoints (removeDuplicatedSorted); the crate does not — so
    # match cv2 -> ours.
    matched = 0
    desc_dists = []
    for i, c in enumerate(carr):
        d = np.hypot(kps[:, 0] - c[0], kps[:, 1] - c[1])
        j = np.argmin(d)
        if (d[j] < 1e-3 and abs(kps[j, 2] - c[2]) < 1e-3
                and abs(kps[j, 4] - c[4]) < 1e-4):
            matched += 1
            desc_dists.append(np.linalg.norm(
                desc[j].astype(np.float32) - cdesc[i].astype(np.float32)))
    frac = matched / len(carr)
    # measured 99.1% on bird_small / 100% on tree_small (tools/parity_gap.py);
    # residuals attributed: one 1e-3-px tolerance edge, one marginal Newton
    # convergence difference on a single keypoint
    assert frac >= 0.985, f"only {matched}/{len(carr)} cv2.SIFT keypoints reproduced"
    # descriptors: cv2 uses fastAtan2 (~0.3 deg error) so bytes differ slightly,
    # but the vectors must be the same feature (inter-feature L2 is ~450).
    assert np.median(desc_dists) < 30, np.median(desc_dists)


def _golden_correspondence(img, reference_root, name):
    g_kps, g_desc = load_golden(reference_root, name)
    kps, desc = oracle.sift(img)
    assert abs(len(kps) - len(g_kps)) <= 10
    used = np.zeros(len(kps), bool)
    corr = 0
    desc_l2 = []
    for gi, g in enumerate(g_kps):
        d = np.hypot(kps[:, 0] - g[0], kps[:, 1] - g[1])
        ang = np.minimum(np.abs(kps[:, 3] - g[3]), 360 - np.abs(kps[:, 3] - g[3]))
        ok = (d < 0.5) & (np.abs(kps[:, 2] - g[2]) < 0.05 * g[2]) & (ang < 2.0) & ~used
        if ok.any():
            j = np.where(ok)[0][np.argmin(d[ok])]
            used[j] = True
            corr += 1
            desc_l2.append(np.linalg.norm(
                desc[j].astype(np.float32) - g_desc[gi].astype(np.float32)))
    assert np.median(desc_l2) < 30  # same feature; inter-feature distance ~450
    return corr / len(g_kps)


def test_oracle_golden_correspondence(bird_small_golden, reference_root):
    """Floors pinned to the decoder-sweep winner (float DCT + fancy
    upsampling, tools/decoder_sweep.py round 3: bird 0.871 / tree 0.935);
    any decoder or pipeline regression drops below them. The residual gap to
    1.0 is the irreducible zune-jpeg-vs-libjpeg stage-0 decode difference
    (module docstring)."""
    frac = _golden_correspondence(bird_small_golden, reference_root,
                                  "bird_small")
    assert frac >= 0.86, f"golden correspondence {frac:.3f}"


def test_oracle_golden_correspondence_tree(tree_small_golden, reference_root):
    frac = _golden_correspondence(tree_small_golden, reference_root,
                                  "tree_small")
    assert frac >= 0.93, f"golden correspondence {frac:.3f}"


def test_oracle_features_limit(bird_small_cv2):
    kps, desc = oracle.sift(bird_small_cv2, features_limit=50)
    assert len(kps) == 50 and desc.shape == (50, 128)
    # sorted by response desc (lib.rs:156-161)
    assert np.all(np.diff(kps[:, 4]) <= 0)


@pytest.mark.smoke
def test_rust_round():
    r = oracle.rust_round_f32
    assert r(np.float32(0.5)) == 1.0
    assert r(np.float32(-0.5)) == -1.0
    assert r(np.float32(2.5)) == 3.0
    assert r(np.float32(-2.5)) == -3.0
    assert r(np.float32(0.49999997)) == 0.0
    assert r(np.float32(1.4999999)) == 1.0
    assert r(np.float32(2.4999998)) == 2.0


def test_imageproc_backend_runs(bird_small_cv2):
    """C19 twin: the oracle pipeline runs end-to-end with the imageproc-
    semantics backend (reference default path, lib.rs:992-1007). No golden
    parity is claimed (goldens use the OpenCV backend; imageproc semantics
    are reconstructed from crate docs — see ImageprocProcessing docstring).
    Keypoint counts should land in the same ballpark as the OpenCV-blur
    pipeline on the same image."""
    from sift_features_tpu.oracle import oracle
    from sift_features_tpu.oracle.processing import (ImageprocProcessing,
                                                     NumpyProcessing)

    img = bird_small_cv2[:128, :160]
    kp_ip, desc_ip = oracle.sift(img, proc=ImageprocProcessing)
    kp_np, _ = oracle.sift(img, proc=NumpyProcessing)
    assert len(kp_ip) > 0
    assert 0.5 < (len(kp_ip) + 1) / (len(kp_np) + 1) < 2.0
    assert desc_ip.shape[1] == 128 and desc_ip.dtype == np.uint8
    # blur border semantics: replicate (constant rows stay constant)
    flat = np.full((16, 16), 7.0, np.float32)
    b = ImageprocProcessing.gaussian_blur(flat, 1.6)
    np.testing.assert_allclose(b, 7.0, rtol=1e-6)
