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


def _canon_order(kps, desc):
    """Canonical (x, y, size)-sorted order, like the reference's own snapshot
    test (lib.rs:1021-1031): the pipeline does not guarantee emission order
    (a single ULP flip in Newton convergence can swap two candidates' slots),
    so parity is asserted on the sorted lists. Keys are rounded to the
    snapshot's 4 decimals so ULP-level field noise cannot reorder the sort."""
    key = np.round(kps[:, :3].astype(np.float64), 4)
    order = np.lexsort((key[:, 2], key[:, 1], key[:, 0]))
    return kps[order], desc[order]


def _compare(img, kp_tol, desc_row_frac, count_slack=0):
    kps_j, desc_j = extractor.extract(img)
    kps_o, desc_o = oracle.sift(img, proc=NumpyProcessing)
    assert abs(len(kps_j) - len(kps_o)) <= count_slack, (len(kps_j), len(kps_o))
    if len(kps_j) == len(kps_o):
        kj, dj = _canon_order(kps_j, desc_j)
        ko, do = _canon_order(kps_o, desc_o)
        cols = [0, 1, 2, 4]
        np.testing.assert_allclose(kj[:, cols], ko[:, cols], rtol=0,
                                   atol=kp_tol)
        # angle: histogram ULP noise is amplified by the peak-parabola
        # interpolation (measured up to ~0.02 deg on one keypoint in 223)
        np.testing.assert_allclose(kj[:, 3], ko[:, 3], rtol=0,
                                   atol=max(kp_tol, 0.05))
        frac = (dj == do).all(axis=1).mean()
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
    k_all, d_all = extractor.extract(img)
    kps, desc = extractor.extract(img, features_limit=5)
    assert kps.shape == (5, 5) and desc.shape == (5, 128)
    assert np.all(np.diff(kps[:, 4]) <= 0)
    # budgeted == host-side stable response sort + truncate (C15)
    order = np.argsort(-k_all[:, 4], kind="stable")[:5]
    np.testing.assert_array_equal(kps, k_all[order])
    np.testing.assert_array_equal(desc, d_all[order])
    # limit >= N: emission order preserved (the reference only sorts when
    # the limit actually truncates, lib.rs:156-161)
    k_big, d_big = extractor.extract(img, features_limit=10 ** 6)
    np.testing.assert_array_equal(k_big, k_all)
    np.testing.assert_array_equal(d_big, d_all)


def test_extractor_stage_counters(bird_small_cv2):
    img = bird_small_cv2[:96, :128]
    res = extractor.extract_batch(img[None])
    n_cand = np.asarray(res["n_candidates"])[0]
    n_emit = np.asarray(res["n_emitted"])[0]
    assert (n_cand >= 0).all() and n_cand.sum() > 0
    assert n_emit.sum() == np.asarray(res["valid"])[0].sum()


@pytest.mark.mid
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


def test_capacity_overflow_prefix(bird_small_cv2):
    """Candidate-capacity overflow drops the scan-order TAIL: the limited
    run's keypoints must be a prefix of the full run's per-octave keypoint
    list, the overflow must be observable via n_candidates > capacity, and
    the truncated output must be deterministic."""
    import dataclasses

    from sift_features_tpu.config import DEFAULT_CONFIG

    img = bird_small_cv2[:128, :192]
    full = extractor.extract_batch(img[None])
    cfg_small = dataclasses.replace(DEFAULT_CONFIG,
                                    max_candidates_per_octave=128)
    lim = extractor.extract_batch(img[None], cfg_small)
    lim2 = extractor.extract_batch(img[None], cfg_small)

    nc_full = np.asarray(full["n_candidates"])[0]
    nc_lim = np.asarray(lim["n_candidates"])[0]
    # true candidate counts are reported unclamped -> overflow observable
    np.testing.assert_array_equal(nc_full, nc_lim)
    assert (nc_lim > 128).any(), "test image must overflow a 128 capacity"

    # determinism of the truncated program
    np.testing.assert_array_equal(np.asarray(lim["kps"]), np.asarray(lim2["kps"]))
    np.testing.assert_array_equal(np.asarray(lim["desc"]), np.asarray(lim2["desc"]))

    # per-octave PREFIX property: survivors come from the first 128
    # candidates in scan order, so each octave's limited keypoints are the
    # leading slice of the full run's. (Different buffer capacities change
    # XLA reduction tiling, so angles may move by ~1 ULP — compare to 1e-3.)
    ne_full = np.asarray(full["n_emitted"])[0]
    ne_lim = np.asarray(lim["n_emitted"])[0]
    assert (ne_lim <= ne_full).all()
    def octave_blocks(res, cfg):
        """Split the concatenated result rows back into per-octave lists."""
        kps = np.asarray(res["kps"])[0]
        valid = np.asarray(res["valid"])[0]
        h, w = img.shape[0] * 2, img.shape[1] * 2
        out, off = [], 0
        for _ in range(len(np.asarray(res["n_emitted"])[0])):
            M = extractor._octave_capacities(h, w, cfg)[2]
            out.append(kps[off:off + M][valid[off:off + M]])
            off += M
            h, w = h // 2, w // 2
        return out

    for o, (a, b) in enumerate(zip(octave_blocks(lim, cfg_small),
                                   octave_blocks(full, DEFAULT_CONFIG))):
        np.testing.assert_allclose(a, b[:len(a)], rtol=0, atol=1e-3,
                                   err_msg=f"octave {o} not a prefix")


@pytest.mark.slow
def test_fused_budget_matches_truncation_interpret(bird_small_cv2):
    """The fused TPU batch path in interpret mode: budgeted extraction
    (truncate-before-describe, _assemble_budget/_describe_subset) must be
    byte-identical to the unbudgeted fused result truncated afterwards —
    same kernels, so keypoints AND descriptor bytes must agree exactly."""
    import jax.numpy as jnp

    from sift_features_tpu.config import DEFAULT_CONFIG
    from sift_features_tpu.models.extractor import _extract_batch_fused

    img = bird_small_cv2[:64, :96]
    imgs = jnp.asarray(np.stack([img, img[::-1, ::-1].copy()]))
    cfg = DEFAULT_CONFIG
    n_oct = cfg.n_octaves(64 * 2, 96 * 2)
    budget = 40

    full = _extract_batch_fused(imgs, n_oct, cfg, interpret=True)
    bud = _extract_batch_fused(imgs, n_oct, cfg, budget=budget,
                               interpret=True)
    kf = np.asarray(full["kps"])
    df = np.asarray(full["desc"])
    vf = np.asarray(full["valid"])
    kb = np.asarray(bud["kps"])
    db = np.asarray(bud["desc"])
    vb = np.asarray(bud["valid"])
    assert kb.shape[1] == budget
    for b in range(kf.shape[0]):
        resp = np.where(vf[b], kf[b][:, 4], -np.inf)
        order = np.argsort(-resp, kind="stable")[:budget]
        order = order[resp[order] > -np.inf]
        got_k, got_d = kb[b][vb[b]], db[b][vb[b]]
        assert len(got_k) == len(order)
        np.testing.assert_array_equal(got_k, kf[b][order])
        np.testing.assert_array_equal(got_d, df[b][order])
