"""Pallas TPU kernels vs their jnp twins (interpret mode on the CPU mesh)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sift_features_tpu.config import DEFAULT_CONFIG
from sift_features_tpu.ops import descriptor as desc_ops
from sift_features_tpu.ops import orientation as ori_ops
from sift_features_tpu.ops.pallas.orientation_kernel import (
    orientation_histograms_pallas)


@pytest.fixture(scope="module")
def ori_case():
    rng = np.random.RandomState(0)
    h, w = 96, 128
    S = 6
    gauss = rng.rand(S, h, w).astype(np.float32)
    from sift_features_tpu.ops import descriptor as desc_ops
    import jax.numpy as _jnp
    gp = np.asarray(desc_ops.pad_stack_for_kernels(_jnp.asarray(gauss)))
    K = 24
    count = 17
    s = rng.randint(1, 4, K).astype(np.int32)
    y = rng.randint(8, h - 8, K).astype(np.int32)
    x = rng.randint(8, w - 8, K).astype(np.int32)
    ks = (rng.rand(K).astype(np.float32) * 2.0 + 1.6)
    s[count:] = 0
    y[count:] = 0
    x[count:] = 0
    ks[count:] = 0
    return gp, s, y, x, ks, count, h, w


def test_orientation_kernel_matches_jnp(ori_case):
    gp, s, y, x, ks, count, h, w = ori_case
    cfg = DEFAULT_CONFIG
    hist_p = orientation_histograms_pallas(
        jnp.asarray(gp), jnp.asarray(s), jnp.asarray(y), jnp.asarray(x),
        jnp.asarray(ks), count, h, w, desc_ops.PAD_DESC, cfg,
        interpret=True)
    valid = np.arange(len(s)) < count
    hist_j = ori_ops.orientation_histograms(
        jnp.asarray(gp), h, w, jnp.asarray(s), jnp.asarray(y),
        jnp.asarray(x), jnp.asarray(ks), jnp.asarray(valid), cfg, pad=desc_ops.PAD_DESC)
    hp = np.asarray(hist_p)[:count]
    hj = np.asarray(hist_j)[:count]
    # jnp twin computes atan2/exp in f64 under x64; kernel is pure f32
    np.testing.assert_allclose(hp, hj, rtol=2e-4, atol=2e-5)
    # identical peak structure
    from sift_features_tpu.ops.orientation import orientation_peaks

    a_p, e_p = orientation_peaks(jnp.asarray(hist_p), cfg)
    a_j, e_j = orientation_peaks(jnp.asarray(np.asarray(hist_j)), cfg)
    np.testing.assert_array_equal(np.asarray(e_p)[:count],
                                  np.asarray(e_j)[:count])
    # invalid lanes produce all-zero histograms
    assert (np.asarray(hist_p)[count:] == 0).all()


@pytest.mark.smoke
def test_refine_kernel_matches_jnp():
    from sift_features_tpu.ops import extrema as ext_ops
    from sift_features_tpu.ops.pallas.refine_kernel import refine_step_pallas

    rng = np.random.RandomState(2)
    h, w = 96, 160
    dog = rng.randn(5, h, w).astype(np.float32) * 0.05
    gp = np.asarray(desc_ops.pad_stack_for_kernels(jnp.asarray(dog)))
    P = desc_ops.PAD_DESC
    cfg = DEFAULT_CONFIG
    K = 32
    count = 23
    s = rng.randint(1, 4, K).astype(np.int32)
    y = rng.randint(6, h - 6, K).astype(np.int32)
    x = rng.randint(6, w - 6, K).astype(np.int32)
    active = (np.arange(K) < count).astype(np.int32)

    out = refine_step_pallas(
        jnp.asarray(gp), jnp.asarray(s), jnp.asarray(y + P),
        jnp.asarray(x + P), jnp.asarray(active), gp.shape[2], cfg,
        interpret=True)
    out = np.asarray(out)

    cube = ext_ops._gather_cubes(jnp.asarray(dog), jnp.asarray(s),
                                 jnp.asarray(y), jnp.asarray(x))
    ref = {k: np.asarray(v) for k, v in
           ext_ops._newton_from_cubes(cube, cfg).items()}

    a = slice(0, count)
    np.testing.assert_array_equal(out[a, 0] > 0, ref["ok"][a])
    np.testing.assert_allclose(out[a, 4], ref["off_s"][a], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(out[a, 5], ref["off_y"][a], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(out[a, 6], ref["off_x"][a], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(out[a, 7], ref["response"][a], rtol=1e-5,
                               atol=1e-7)
    np.testing.assert_array_equal(out[a, 8] > 0, ref["keep"][a])
    np.testing.assert_array_equal(out[a, 1], ref["step_s"][a].astype(np.float32))
    np.testing.assert_array_equal(out[a, 2], ref["step_y"][a].astype(np.float32))
    np.testing.assert_array_equal(out[a, 3], ref["step_x"][a].astype(np.float32))


@pytest.mark.smoke
def test_pyramid_kernel_matches_jnp():
    from sift_features_tpu.ops.gaussian import gaussian_blur
    from sift_features_tpu.ops.pallas.pyramid_kernel import (
        build_octave_padded, reflect_pad_image)

    cfg = DEFAULT_CONFIG
    rng = np.random.RandomState(3)
    h, w = 200, 300
    P = desc_ops.PAD_DESC
    h_pad = -(-(h + 2 * P) // 128) * 128
    w_pad = -(-(w + 2 * P) // 128) * 128
    img = rng.rand(h, w).astype(np.float32)

    base = reflect_pad_image(jnp.asarray(img), P, w_pad - w - 2 * P,
                             h_pad - h - 2 * P)
    g_slots, dog = build_octave_padded(base, cfg, interpret=True)
    g_slots, dog = np.asarray(g_slots), np.asarray(dog)

    ref = [jnp.asarray(img)]
    for sig in cfg.octave_sigmas()[1:]:
        ref.append(gaussian_blur(ref[-1], sig))
    ref = [np.asarray(r) for r in ref]

    sl = (slice(P, P + h), slice(P, P + w))
    for lvl in range(1, 6):
        np.testing.assert_allclose(g_slots[lvl - 1][sl], ref[lvl],
                                   rtol=0, atol=3e-7,
                                   err_msg=f"gauss level {lvl}")
    for k in range(5):
        np.testing.assert_allclose(dog[k][sl], ref[k + 1] - ref[k],
                                   rtol=0, atol=6e-7, err_msg=f"dog {k}")


def test_pyramid_fused_octave_matches_per_level():
    """Whole-octave fused kernel (chain in VMEM) vs the per-level builder:
    byte-equal Gaussian levels 1-3 + DoG everywhere any consumer reads
    (poison reach is the cumulative tap radius, 42 < PAD_DESC=56). Split
    mode: DoG and the f32 level-3 plane stay BIT-exact (detection-safe)
    while the stored Gaussian stack rounds to bf16."""
    from sift_features_tpu.ops.pallas.pyramid_kernel import (
        build_octave_fused, build_octave_padded_batched, reflect_pad_image)

    cfg = DEFAULT_CONFIG
    rng = np.random.RandomState(7)
    h, w = 200, 300
    P = desc_ops.PAD_DESC
    h_pad = -(-(h + 2 * P) // 128) * 128
    w_pad = -(-(w + 2 * P) // 128) * 128
    img = (rng.rand(2, h, w) * 255).astype(np.float32)
    base = jax.vmap(lambda im: reflect_pad_image(
        im, P, w_pad - w - 2 * P, h_pad - h - 2 * P))(jnp.asarray(img))

    g0, d0, _ = build_octave_padded_batched(base, cfg, interpret=True)
    g1, d1, g16, l3 = build_octave_fused(base, cfg, interpret=True)
    assert g16 is None and l3 is None
    m = 48   # cumulative-halo poison margin (>= sum of tap radii = 42)
    reg = (slice(None), slice(None), slice(m, -m), slice(m, -m))
    np.testing.assert_array_equal(np.asarray(g0)[:, :3, m:-m, m:-m],
                                  np.asarray(g1)[reg])
    np.testing.assert_array_equal(np.asarray(d0)[reg], np.asarray(d1)[reg])

    # split mode: gauss stored bf16, DoG + level-3 chain base exact f32
    g2, d2, _, l3 = build_octave_fused(base, cfg, interpret=True, split=True)
    assert g2.dtype == jnp.bfloat16 and d2.dtype == jnp.float32
    np.testing.assert_array_equal(np.asarray(d0)[reg], np.asarray(d2)[reg])
    np.testing.assert_array_equal(np.asarray(g0)[:, 2, m:-m, m:-m],
                                  np.asarray(l3)[:, m:-m, m:-m])
    np.testing.assert_array_equal(
        np.asarray(g0)[:, :3][:, :, m:-m, m:-m].astype(jnp.bfloat16),
        np.asarray(g2)[:, :, m:-m, m:-m])


def test_descriptor_kernel_matches_jnp():
    from sift_features_tpu.ops import descriptor as desc_ops
    from sift_features_tpu.ops.extrema import rust_round
    from sift_features_tpu.ops.pallas.descriptor_kernel import (
        descriptor_hist_pallas)

    rng = np.random.RandomState(1)
    h, w = 128, 160
    gauss = rng.rand(6, h, w).astype(np.float32)
    gp = np.asarray(desc_ops.pad_stack_for_kernels(jnp.asarray(gauss)))
    M = 16
    count = 11
    cfg = DEFAULT_CONFIG
    s = rng.randint(1, 4, M).astype(np.int32)
    x = (rng.rand(M) * (w - 20) + 10).astype(np.float32)
    y = (rng.rand(M) * (h - 20) + 10).astype(np.float32)
    ks = (rng.rand(M) * 1.5 + 1.8).astype(np.float32)
    ang = (rng.rand(M) * 360).astype(np.float32)
    valid = np.arange(M) < count
    s[count:] = 0
    x[count:] = 0
    y[count:] = 0
    ks[count:] = 0
    ang[count:] = 0

    xi = np.asarray(rust_round(jnp.asarray(x))).astype(np.int32)
    yi = np.asarray(rust_round(jnp.asarray(y))).astype(np.int32)
    hist = descriptor_hist_pallas(
        jnp.asarray(gp), jnp.asarray(s), jnp.asarray(xi), jnp.asarray(yi),
        jnp.asarray(ks), jnp.asarray(ang), count, h, w, desc_ops.PAD_DESC,
        cfg, interpret=True)
    desc_p = np.asarray(desc_ops.finalize_descriptor(hist, cfg))

    desc_j = np.asarray(desc_ops.descriptor_batch(
        jnp.asarray(gp), h, w, jnp.asarray(s), jnp.asarray(x),
        jnp.asarray(y), jnp.asarray(ks), jnp.asarray(ang),
        jnp.asarray(valid), cfg))

    d = np.abs(desc_p[:count].astype(np.int32) - desc_j[:count].astype(np.int32))
    # kernel is pure f32 (the jnp twin upcasts transcendentals to f64 under
    # x64); quantized bytes may differ by 1 at rounding edges
    assert d.max() <= 1, d.max()
    assert (d > 0).mean() < 0.02, (d > 0).mean()
    assert (np.asarray(hist)[count:] == 0).all()


def _bucket_scales(rng, s):
    """kp_scale consistent with integer scale index s: 1.6 * 2^((s+off)/3)."""
    off = (rng.rand(len(s)) - 0.5) * 0.999
    return (1.6 * 2.0 ** ((s + off) / 3.0)).astype(np.float32)


def test_orientation_bucketed_matches_jnp():
    from sift_features_tpu.ops import orientation as ori_ops
    from sift_features_tpu.ops.pallas.orientation_kernel import (
        orientation_histograms_bucketed)

    rng = np.random.RandomState(5)
    h, w = 96, 128
    gauss = rng.rand(6, h, w).astype(np.float32)
    gp = jnp.asarray(np.asarray(desc_ops.pad_stack_for_kernels(jnp.asarray(gauss))))
    K, count = 8, 6
    cfg = DEFAULT_CONFIG
    s = np.array([1, 2, 3, 1, 1, 2, 1, 1], np.int32)
    y = rng.randint(8, h - 8, K).astype(np.int32)
    x = rng.randint(8, w - 8, K).astype(np.int32)
    ks = _bucket_scales(rng, s)
    ks[count:] = 0

    buck = orientation_histograms_bucketed(
        gp, jnp.asarray(s), jnp.asarray(s), jnp.asarray(y), jnp.asarray(x),
        jnp.asarray(ks), count, h, w, desc_ops.PAD_DESC, cfg, interpret=True)
    valid = np.arange(K) < count
    ref = ori_ops.orientation_histograms(
        gp, h, w, jnp.asarray(s), jnp.asarray(y), jnp.asarray(x),
        jnp.asarray(ks), jnp.asarray(valid), cfg, pad=desc_ops.PAD_DESC)
    np.testing.assert_allclose(np.asarray(buck)[:count],
                               np.asarray(ref)[:count], rtol=2e-4, atol=2e-5)
    assert (np.asarray(buck)[count:] == 0).all()


def test_descriptor_bucketed_matches_jnp():
    from sift_features_tpu.ops.extrema import rust_round
    from sift_features_tpu.ops.pallas.descriptor_kernel import (
        descriptor_hist_bucketed)

    rng = np.random.RandomState(6)
    h, w = 128, 160
    gauss = rng.rand(6, h, w).astype(np.float32)
    gp = jnp.asarray(np.asarray(desc_ops.pad_stack_for_kernels(jnp.asarray(gauss))))
    M, count = 8, 7
    cfg = DEFAULT_CONFIG
    s = np.array([1, 2, 3, 1, 2, 1, 1, 1], np.int32)
    x = (rng.rand(M) * (w - 20) + 10).astype(np.float32)
    y = (rng.rand(M) * (h - 20) + 10).astype(np.float32)
    ks = _bucket_scales(rng, s)
    ang = (rng.rand(M) * 360).astype(np.float32)
    ks[count:] = 0
    xi = np.asarray(rust_round(jnp.asarray(x))).astype(np.int32)
    yi = np.asarray(rust_round(jnp.asarray(y))).astype(np.int32)

    buck = descriptor_hist_bucketed(
        gp, jnp.asarray(s), jnp.asarray(s), jnp.asarray(xi), jnp.asarray(yi),
        jnp.asarray(ks), jnp.asarray(ang), count, h, w, desc_ops.PAD_DESC,
        cfg, interpret=True)
    desc_p = np.asarray(desc_ops.finalize_descriptor(buck, cfg))

    valid = np.arange(M) < count
    desc_j = np.asarray(desc_ops.descriptor_batch(
        gp, h, w, jnp.asarray(s), jnp.asarray(x), jnp.asarray(y),
        jnp.asarray(ks), jnp.asarray(ang), jnp.asarray(valid), cfg))
    d = np.abs(desc_p[:count].astype(np.int32) - desc_j[:count].astype(np.int32))
    assert d.max() <= 1, d.max()
    assert (d > 0).mean() < 0.02, (d > 0).mean()


@pytest.mark.smoke
def test_extrema_kernel_matches_reduce_window():
    from sift_features_tpu.ops import extrema as ext_ops
    from sift_features_tpu.ops.pallas.extrema_kernel import extrema_words
    from sift_features_tpu.utils.compact import compact_words

    cfg = DEFAULT_CONFIG
    rng = np.random.RandomState(8)
    hp, wp = 128, 256
    dog = (rng.randn(5, hp, wp) * 0.05).astype(np.float32)
    P, h, w = 30, 60, 180
    b = cfg.image_border
    bounds = (P + b, P + h - b, P + b, P + w - b)

    ref = np.asarray(ext_ops.extrema_mask(jnp.asarray(dog), cfg, bounds=bounds))
    words = extrema_words(jnp.asarray(dog), bounds, 3, True)
    words = np.asarray(words)
    # unpack and compare bit-exactly
    got = ((words[..., None] >> np.arange(32)) & 1).astype(bool)
    got = got.reshape(3, hp, wp)
    np.testing.assert_array_equal(got, ref)

    # candidate emission order matches the bool-mask compaction
    s1, y1, x1, v1, c1 = ext_ops.find_candidates(jnp.asarray(ref), 256)
    s2, y2, x2, v2, c2 = ext_ops.find_candidates_words(jnp.asarray(words), 256)
    assert int(c1) == int(c2)
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
    np.testing.assert_array_equal(np.asarray(x1), np.asarray(x2))


def test_bf16_storage_kernels():
    """bf16 STORAGE mode: kernels DMA bf16 pyramid planes and upcast for
    arithmetic. Extrema words must be bit-exact vs the mask computed on the
    upcast values; descriptors may move by a few bytes vs f32 storage."""
    from sift_features_tpu.ops import extrema as ext_ops
    from sift_features_tpu.ops.extrema import rust_round
    from sift_features_tpu.ops.pallas.extrema_kernel import extrema_words
    from sift_features_tpu.ops.pallas.descriptor_kernel import (
        descriptor_hist_pallas)

    cfg = DEFAULT_CONFIG
    rng = np.random.RandomState(9)
    hp, wp = 128, 256
    dog32 = (rng.randn(5, hp, wp) * 0.05).astype(np.float32)
    dog16 = jnp.asarray(dog32).astype(jnp.bfloat16)
    P, h, w = 30, 60, 180
    b = cfg.image_border
    bounds = (P + b, P + h - b, P + b, P + w - b)
    ref = np.asarray(ext_ops.extrema_mask(
        jnp.asarray(np.asarray(dog16.astype(jnp.float32))), cfg, bounds=bounds))
    words = np.asarray(extrema_words(dog16, bounds, 3, True))
    got = ((words[..., None] >> np.arange(32)) & 1).astype(bool).reshape(3, hp, wp)
    np.testing.assert_array_equal(got, ref)

    # descriptor: bf16 window vs f32 window, same keypoints
    h2, w2 = 128, 160
    gauss = rng.rand(6, h2, w2).astype(np.float32)
    gp32 = jnp.asarray(np.asarray(desc_ops.pad_stack_for_kernels(jnp.asarray(gauss))))
    gp16 = gp32.astype(jnp.bfloat16)
    M, count = 8, 6
    s = np.array([1, 2, 3, 1, 2, 1, 1, 1], np.int32)
    x = (rng.rand(M) * (w2 - 20) + 10).astype(np.float32)
    y = (rng.rand(M) * (h2 - 20) + 10).astype(np.float32)
    ks = (1.6 * 2.0 ** ((s + (rng.rand(M) - 0.5) * 0.999) / 3.0)).astype(np.float32)
    ang = (rng.rand(M) * 360).astype(np.float32)
    xi = np.asarray(rust_round(jnp.asarray(x))).astype(np.int32)
    yi = np.asarray(rust_round(jnp.asarray(y))).astype(np.int32)

    args = (jnp.asarray(s), jnp.asarray(xi), jnp.asarray(yi), jnp.asarray(ks),
            jnp.asarray(ang), count, h2, w2, desc_ops.PAD_DESC, cfg, True)
    d32 = np.asarray(desc_ops.finalize_descriptor(
        descriptor_hist_pallas(gp32, *args), cfg))[:count]
    d16 = np.asarray(desc_ops.finalize_descriptor(
        descriptor_hist_pallas(gp16, *args), cfg))[:count]
    diff = np.abs(d32.astype(int) - d16.astype(int))
    assert diff.max() <= 6, diff.max()
    assert diff.mean() < 1.0, diff.mean()


@pytest.mark.mid
def test_refine_tile_kernel_matches_xla():
    """Tile-grouped whole-loop refinement (interpret) vs the XLA 5-step
    reference loop (ops.extrema.refine): identical convergence, final cells,
    offsets, responses and keep decisions — including escaped candidates,
    which take the per-step-kernel fallback inside refine_tile_tpu."""
    from sift_features_tpu.ops import extrema as ext_ops
    from sift_features_tpu.ops.pallas.refine_tile_kernel import refine_tile_tpu

    rng = np.random.RandomState(5)
    h, w = 180, 200
    cfg = DEFAULT_CONFIG
    P = desc_ops.PAD_DESC
    # padded stack with kernel-friendly dims (8-row / 128-lane multiples)
    Hp = -(-(h + 2 * P) // 8) * 8
    Wp = -(-(w + 2 * P) // 128) * 128
    dog_p = np.zeros((5, Hp, Wp), np.float32)
    dog = (rng.randn(5, h, w) * 0.05).astype(np.float32)
    dog_p[:, P:P + h, P:P + w] = dog

    # real candidates from the discrete extrema of this DoG — STRIDED
    # across the whole scan order so every window row-chunk is exercised
    # (the first-K prefix puts all candidates in the top tile and misses
    # the chunk-boundary rows, which once hid a dense-pass indexing bug)
    mask = np.asarray(ext_ops.extrema_mask(jnp.asarray(dog), cfg))
    s0, y0, x0 = np.nonzero(mask.reshape(3, h, w))
    K = 256
    k = min(K, len(s0))
    pick = np.linspace(0, len(s0) - 1, k).astype(int)
    s = np.ones(K, np.int32)
    y = np.full(K, P, np.int32)
    x = np.full(K, P, np.int32)
    s[:k] = s0[pick] + 1
    y[:k] = y0[pick]
    x[:k] = x0[pick]
    valid = np.arange(K) < k

    out = refine_tile_tpu(
        jnp.asarray(dog_p), jnp.asarray(s), jnp.asarray(y + P),
        jnp.asarray(x + P), jnp.asarray(valid), P, h, w, cfg,
        interpret=True)
    ref = ext_ops.refine(jnp.asarray(dog), jnp.asarray(s), jnp.asarray(y),
                         jnp.asarray(x), jnp.asarray(valid), cfg)

    a = np.asarray(valid)
    np.testing.assert_array_equal(np.asarray(out["ok"])[a],
                                  np.asarray(ref["ok"])[a])
    conv = a & np.asarray(ref["ok"])
    for key, off in (("s", 0), ("y", P), ("x", P)):
        np.testing.assert_array_equal(np.asarray(out[key])[conv] - off,
                                      np.asarray(ref[key])[conv], err_msg=key)
    for key in ("off_s", "off_y", "off_x", "response"):
        np.testing.assert_allclose(np.asarray(out[key])[conv],
                                   np.asarray(ref[key])[conv],
                                   rtol=1e-6, atol=1e-7, err_msg=key)
    np.testing.assert_array_equal(np.asarray(out["keep"])[a],
                                  np.asarray(ref["keep"])[a])
    assert conv.sum() > 20, "test needs a meaningful converged population"


@pytest.mark.mid
def test_refine_tile_escape_fallback():
    """Candidates with near-singular Hessians take |step| > 7 (unpackable in
    the tile kernel's 4-bit step field) and must ESCAPE to the per-step
    fallback inside refine_tile_tpu — results still equal the XLA loop."""
    from sift_features_tpu.ops import extrema as ext_ops
    from sift_features_tpu.ops.pallas.refine_tile_kernel import refine_tile_tpu

    rng = np.random.RandomState(9)
    h, w = 160, 200
    cfg = DEFAULT_CONFIG
    P = desc_ops.PAD_DESC
    Hp = -(-(h + 2 * P) // 8) * 8
    Wp = -(-(w + 2 * P) // 128) * 128
    # smooth ramp (tiny curvature, nonzero gradient) -> huge Newton offsets
    yg, xg = np.mgrid[0:h, 0:w].astype(np.float32)
    dog = np.stack([0.001 * xg + 0.0005 * yg + 0.03 * np.sin(i + xg / 40.0)
                    for i in range(5)]).astype(np.float32)
    dog += (rng.randn(5, h, w) * 1e-5).astype(np.float32)
    dog_p = np.zeros((5, Hp, Wp), np.float32)
    dog_p[:, P:P + h, P:P + w] = dog

    K = 128
    s = rng.randint(1, 4, K).astype(np.int32)
    y = rng.randint(20, h - 20, K).astype(np.int32)
    x = rng.randint(20, w - 20, K).astype(np.int32)
    valid = np.ones(K, bool)

    out = refine_tile_tpu(
        jnp.asarray(dog_p), jnp.asarray(s), jnp.asarray(y + P),
        jnp.asarray(x + P), jnp.asarray(valid), P, h, w, cfg,
        interpret=True)
    ref = ext_ops.refine(jnp.asarray(dog), jnp.asarray(s), jnp.asarray(y),
                         jnp.asarray(x), jnp.asarray(valid), cfg)
    np.testing.assert_array_equal(np.asarray(out["ok"]), np.asarray(ref["ok"]))
    np.testing.assert_array_equal(np.asarray(out["keep"]),
                                  np.asarray(ref["keep"]))
    conv = np.asarray(ref["ok"])
    for key in ("off_s", "off_y", "off_x", "response"):
        np.testing.assert_allclose(np.asarray(out[key])[conv],
                                   np.asarray(ref[key])[conv],
                                   rtol=1e-6, atol=1e-7, err_msg=key)


@pytest.mark.mid
def test_refine_region_step_matches_perstep():
    """Region-grouped step-1 kernel (interpret) vs the per-candidate step
    kernel: ok/steps/keep byte-exact everywhere; offsets/response byte-exact
    wherever the per-step value is finite (the region kernel zeroes
    non-finite values, which refine_tpu never reads — they only occur on
    lanes whose ok flag is false). Exercises shared-region candidates,
    128-lane straddlers (forced extra region loads) and inactive lanes."""
    from sift_features_tpu.ops.pallas.refine_kernel import refine_step_pallas
    from sift_features_tpu.ops.pallas.refine_region_kernel import (
        refine_step_region)

    rng = np.random.RandomState(7)
    S, Hp, Wp = 5, 64, 384          # fused-layout-aligned dims
    dog = (rng.randn(S, Hp, Wp) * 0.05).astype(np.float32)
    cfg = DEFAULT_CONFIG
    K = 32
    count = 27
    s = rng.randint(1, 4, K).astype(np.int32)
    # clustered candidates so DMA windows are genuinely shared
    cy = rng.randint(18, Hp - 20, 4)
    cx = rng.randint(18, Wp - 20, 4)
    ci = rng.randint(0, 4, K)
    y = np.clip(cy[ci] + rng.randint(-6, 7, K), 1, Hp - 17).astype(np.int32)
    x = np.clip(cx[ci] + rng.randint(-6, 7, K), 1, Wp - 3).astype(np.int32)
    x[:4] = 126 + (np.arange(4) % 3) + 128 * rng.randint(0, 2, 4)  # straddle
    active = (np.arange(K) < count).astype(np.int32)

    ref = np.asarray(refine_step_pallas(
        jnp.asarray(dog), jnp.asarray(s), jnp.asarray(y), jnp.asarray(x),
        jnp.asarray(active), Wp, cfg, True))[:count]
    out = np.asarray(refine_step_region(
        jnp.asarray(dog), jnp.asarray(s), jnp.asarray(y), jnp.asarray(x),
        jnp.asarray(active), Wp, cfg, True))[:count]

    eq = ref == out
    assert eq[:, [0, 1, 2, 3, 8]].all()                      # ok/steps/keep
    assert (eq[:, 4:8] | ~np.isfinite(ref[:, 4:8])).all()    # offs/response


@pytest.mark.mid
def test_refine_walk_matches_perstep_loop():
    """Region-walk whole-loop kernel (interpret) vs the per-step kernel loop:
    byte-exact outputs on every converged field. Exercises multi-frame
    plane_off, a >BK-candidate region (block straddling + window reuse),
    long walks and escape fallback (smooth DoG drives multi-cell walks)."""
    from scipy import ndimage

    from sift_features_tpu.ops.extrema import refine_tpu
    from sift_features_tpu.ops.pallas.refine_walk_kernel import (
        refine_walk_tpu)

    rng = np.random.RandomState(9)
    S, Hp, Wp = 5, 96, 512          # fused-layout-aligned dims
    NF = 2
    dog = np.stack([
        ndimage.gaussian_filter(rng.randn(Hp, Wp), 4).astype(np.float32) * 0.2
        for _ in range(NF * S)])
    cfg = DEFAULT_CONFIG
    P = 17
    h, w = Hp - 2 * P, Wp - 2 * P
    K = 96
    s = rng.randint(1, 4, K).astype(np.int32)
    y = rng.randint(P + 1, Hp - P, K).astype(np.int32)
    x = rng.randint(P + 1, Wp - P, K).astype(np.int32)
    y[:50] = rng.randint(33, 63, 50)       # one region >BK candidates
    x[:50] = rng.randint(257, 480, 50)
    plane_off = (rng.randint(0, NF, K) * S).astype(np.int32)
    valid = np.arange(K) < 90

    out = refine_walk_tpu(jnp.asarray(dog), jnp.asarray(s), jnp.asarray(y),
                          jnp.asarray(x), jnp.asarray(valid), P, h, w, cfg,
                          plane_off=jnp.asarray(plane_off), interpret=True)
    ref = refine_tpu(jnp.asarray(dog), jnp.asarray(s), jnp.asarray(y),
                     jnp.asarray(x), jnp.asarray(valid), P, h, w, cfg,
                     plane_off=jnp.asarray(plane_off), interpret=True)
    out = {k: np.asarray(v) for k, v in out.items()}
    ref = {k: np.asarray(v) for k, v in ref.items()}
    assert ref["ok"][valid].sum() > 0      # the case must converge somewhere
    for kf in ref:
        m = (valid & ref["ok"] if kf not in ("ok",) else valid)
        np.testing.assert_array_equal(out[kf][m], ref[kf][m], err_msg=kf)


@pytest.mark.mid
def test_refine_walk_stress_chunks_and_escape_overflow():
    """Walk driver under combined stress (VERDICT r3 task 6): multi-chunk
    slot layout (chunk=64 forces cross-chunk prefetch-parity resets),
    dense escapes (raw-noise DoG drives big-step and margin exits; region-
    boundary candidate placement maximizes margin escapes), and escape-
    buffer OVERFLOW (escape_cap below the real escape count forces the
    exact full-width branch of merge_escaped_compact). Byte-equality vs
    the per-step loop on every converged field, in both the overflow and
    the compacted-fallback configurations."""
    from sift_features_tpu.ops.extrema import refine_tpu
    from sift_features_tpu.ops.pallas.refine_walk_kernel import (
        refine_walk_tpu)

    rng = np.random.RandomState(3)
    S, Hp, Wp = 5, 96, 512
    NF = 2
    # raw (unsmoothed) noise: near-singular Hessians => |step| > 7 escapes,
    # plus multi-cell walks that cross the window margin
    dog = (rng.randn(NF * S, Hp, Wp) * 0.2).astype(np.float32)
    cfg = DEFAULT_CONFIG
    P = 17
    h, w = Hp - 2 * P, Wp - 2 * P
    K = 320
    s = rng.randint(1, 4, K).astype(np.int32)
    y = rng.randint(P + 1, Hp - P, K).astype(np.int32)
    x = rng.randint(P + 1, Wp - P, K).astype(np.int32)
    # half the candidates hug region-row boundaries (y % 32 in {0, 31}) so
    # small steps exit the +-7 window margin
    y[::2] = (y[::2] // 32) * 32 + np.where(np.arange((K + 1) // 2) % 2, 31, 0)
    y = np.clip(y, P + 1, Hp - P - 1).astype(np.int32)
    plane_off = (rng.randint(0, NF, K) * S).astype(np.int32)
    valid = np.arange(K) < 300

    args = (jnp.asarray(dog), jnp.asarray(s), jnp.asarray(y), jnp.asarray(x),
            jnp.asarray(valid), P, h, w, cfg)
    ref = refine_tpu(*args, plane_off=jnp.asarray(plane_off), interpret=True)
    ref = {k: np.asarray(v) for k, v in ref.items()}
    assert ref["ok"][valid].sum() > 0

    for e_cap in (8, None):   # 8 = forced overflow -> full-width branch
        out = refine_walk_tpu(*args, plane_off=jnp.asarray(plane_off),
                              interpret=True, chunk=64, escape_cap=e_cap)
        n_esc = int(np.asarray(out.pop("n_escaped")))
        if e_cap == 8:
            assert n_esc > 8, "stress case no longer overflows the buffer"
        out = {k: np.asarray(v) for k, v in out.items()}
        for kf in ref:
            m = (valid & ref["ok"] if kf not in ("ok",) else valid)
            np.testing.assert_array_equal(out[kf][m], ref[kf][m],
                                          err_msg=f"{kf} (e_cap={e_cap})")


@pytest.mark.mid
def test_packed_orientation_matches_perkey():
    """Lane-packed orientation kernel vs the per-keypoint kernel (interpret).
    Interpret-mode reductions may differ in tree order (ULP); on-TPU byte
    parity is gated by tools/parity_pallas.py."""
    from sift_features_tpu.ops.pallas.orientation_kernel import (
        orientation_histograms_pallas)
    from sift_features_tpu.ops.pallas.orientation_packed import (
        orientation_histograms_packed)

    rng = np.random.RandomState(11)
    h, w, P = 100, 120, desc_ops.PAD_DESC
    g = np.zeros((6, h + 2 * P, w + 2 * P), np.float32)
    g[:, P:P + h, P:P + w] = rng.rand(6, h, w).astype(np.float32)
    K, count = 20, 17
    s = rng.randint(0, 6, K).astype(np.int32)
    y = rng.randint(0, h, K).astype(np.int32)
    x = rng.randint(0, w, K).astype(np.int32)
    ks = (rng.rand(K).astype(np.float32) * 2.0 + 0.5)
    args = (jnp.asarray(g), jnp.asarray(s), jnp.asarray(y), jnp.asarray(x),
            jnp.asarray(ks), count, h, w, P, DEFAULT_CONFIG, True)
    from sift_features_tpu.ops import orientation as ori_ops

    for r_max in (10, 16):
        ref = np.asarray(orientation_histograms_pallas(*args, r_max))[:count]
        hist, ang_p, n_pk = orientation_histograms_packed(
            *args, r_max, True, True)
        np.testing.assert_allclose(np.asarray(hist)[:count], ref,
                                   rtol=3e-6, atol=1e-6)
        # in-kernel peak extraction vs the XLA path on the same smoothed
        # histograms (round 4): same emit count per candidate; angles match
        # to ~1 ULP at 360-degree scale (XLA:CPU contracts the interp math
        # into FMAs differently between the two programs — on TPU the e2e
        # gate tools/check_modes.py packed-vs-perkey measures delta 0.00
        # and 223/223 byte-exact descriptors)
        angles, emit = ori_ops.orientation_peaks(hist, DEFAULT_CONFIG)
        angles, emit = np.asarray(angles), np.asarray(emit)
        ang_p, n_pk = np.asarray(ang_p), np.asarray(n_pk)
        for i in range(count):
            bins = np.nonzero(emit[i])[0]
            assert n_pk[i] == len(bins), (i, n_pk[i], bins)
            np.testing.assert_allclose(ang_p[i, :len(bins)][:4],
                                       angles[i, bins][:4],
                                       rtol=1e-6, atol=5e-5)


@pytest.mark.mid
def test_packed_descriptor_matches_perkey():
    """Lane-packed descriptor kernel vs the per-keypoint kernel (interpret).
    Final u8 descriptors must be byte-equal after finalization."""
    from sift_features_tpu.ops.pallas.descriptor_kernel import (
        descriptor_hist_pallas)
    from sift_features_tpu.ops.pallas.descriptor_packed import (
        descriptor_hist_packed)

    rng = np.random.RandomState(12)
    h, w, P = 100, 120, desc_ops.PAD_DESC
    g = np.zeros((6, h + 2 * P, w + 2 * P), np.float32)
    g[:, P:P + h, P:P + w] = rng.rand(6, h, w).astype(np.float32)
    M, count = 18, 15
    s = rng.randint(0, 6, M).astype(np.int32)
    y = rng.randint(0, h, M).astype(np.int32)
    x = rng.randint(0, w, M).astype(np.int32)
    ks = (rng.rand(M).astype(np.float32) * 1.2 + 0.8)
    ang = (rng.rand(M) * 360).astype(np.float32)
    args = (jnp.asarray(g), jnp.asarray(s), jnp.asarray(x), jnp.asarray(y),
            jnp.asarray(ks), jnp.asarray(ang), count, h, w, P,
            DEFAULT_CONFIG, True)
    # 24/30 pack 2 windows in one 128-lane register; 38 (wn = 79) exercises
    # the wide 256-lane/p=2 layout (round 4)
    for r_max in (24, 30, 38):
        raw_ref = descriptor_hist_pallas(*args, r_max)
        raw_new = descriptor_hist_packed(*args, r_max)
        np.testing.assert_allclose(np.asarray(raw_new)[:count],
                                   np.asarray(raw_ref)[:count],
                                   rtol=3e-6, atol=1e-6)
        d_ref = np.asarray(desc_ops.finalize_descriptor(raw_ref,
                                                        DEFAULT_CONFIG))
        d_new = np.asarray(desc_ops.finalize_descriptor(raw_new,
                                                        DEFAULT_CONFIG))
        diff = np.abs(d_ref[:count].astype(int) - d_new[:count].astype(int))
        assert diff.max() <= 1, diff.max()


@pytest.mark.slow
def test_detect_octave_walk_mode_interpret(bird_small_cv2):
    """Walk-mode refinement through the REAL detection path (interpret) vs
    the all-XLA branch on a bird_small crop: same keypoint set."""
    import dataclasses

    from sift_features_tpu.config import DEFAULT_CONFIG
    from sift_features_tpu.models.extractor import _detect_octave
    from sift_features_tpu.ops import pyramid as pyr_ops
    from sift_features_tpu.ops.gaussian import gaussian_blur

    cfg = DEFAULT_CONFIG
    img = bird_small_cv2[:96, :128]
    seed = pyr_ops.create_seed_image(jnp.asarray(img)[None], cfg)[0]
    levels = [seed]
    for sig in cfg.octave_sigmas()[1:]:
        levels.append(gaussian_blur(levels[-1], sig))
    gauss = jnp.stack(levels, axis=0)
    dog = gauss[1:] - gauss[:-1]

    r_ref = _detect_octave(gauss, dog, 0,
                           dataclasses.replace(cfg, use_pallas=False))
    r_wlk = _detect_octave(gauss, dog, 0,
                           dataclasses.replace(cfg, refine_mode="walk"),
                           interpret=True)
    kp_r = np.asarray(r_ref["kps"])[np.asarray(r_ref["valid"])]
    kp_w = np.asarray(r_wlk["kps"])[np.asarray(r_wlk["valid"])]
    assert len(kp_r) == len(kp_w) and len(kp_r) > 3

    def canon(k):
        key = np.round(k[:, :3].astype(np.float64), 4)
        return k[np.lexsort((key[:, 2], key[:, 1], key[:, 0]))]

    a, b = canon(kp_w), canon(kp_r)
    np.testing.assert_allclose(a[:, [0, 1, 2, 4]], b[:, [0, 1, 2, 4]],
                               rtol=0, atol=1e-3)
    np.testing.assert_allclose(a[:, 3], b[:, 3], rtol=0, atol=0.05)


@pytest.mark.slow
def test_detect_octave_row_band_pallas_interpret(bird_small_cv2):
    """Row-banded detection on the Pallas branch (spatial sharding path,
    TRACED bounds): the extrema scan takes the XLA reduce-window path while
    refine/orientation/descriptor run the Pallas kernels — results must
    match the all-XLA branch on the same band (canonical order, ULP tol)."""
    import dataclasses

    from sift_features_tpu.config import DEFAULT_CONFIG
    from sift_features_tpu.models.extractor import _detect_octave
    from sift_features_tpu.ops import pyramid as pyr_ops

    cfg = DEFAULT_CONFIG
    img = bird_small_cv2[:96, :128]
    seed = pyr_ops.create_seed_image(jnp.asarray(img)[None], cfg)[0]
    sigmas = cfg.octave_sigmas()
    from sift_features_tpu.ops.gaussian import gaussian_blur

    levels = [seed]
    for sig in sigmas[1:]:
        levels.append(gaussian_blur(levels[-1], sig))
    gauss = jnp.stack(levels, axis=0)
    dog = gauss[1:] - gauss[:-1]
    # this crop's octave-0 keypoints live at rows 182-184 (octave coords);
    # the band includes them while excluding the top of the image
    band = (jnp.int32(150), jnp.int32(192))

    r_pal = _detect_octave(gauss, dog, 0, cfg, row_range=band,
                           interpret=True)
    r_xla = _detect_octave(gauss, dog, 0,
                           dataclasses.replace(cfg, use_pallas=False),
                           row_range=band)
    kp_p = np.asarray(r_pal["kps"])[np.asarray(r_pal["valid"])]
    kp_x = np.asarray(r_xla["kps"])[np.asarray(r_xla["valid"])]
    assert len(kp_p) == len(kp_x) and len(kp_p) > 3, (len(kp_p), len(kp_x))

    def canon(k):
        key = np.round(k[:, :3].astype(np.float64), 4)
        return k[np.lexsort((key[:, 2], key[:, 1], key[:, 0]))]

    a, b = canon(kp_p), canon(kp_x)
    np.testing.assert_allclose(a[:, [0, 1, 2, 4]], b[:, [0, 1, 2, 4]],
                               rtol=0, atol=1e-3)
    np.testing.assert_allclose(a[:, 3], b[:, 3], rtol=0, atol=0.05)
    # all keypoints originate inside the band (y in octave coords)
    assert (a[:, 1] / cfg.delta_min >= 149).all()


@pytest.mark.mid
def test_peaks_overflow_fallback_matches_fast_path(bird_small_cv2):
    """The batched driver's in-kernel-peaks overflow branch (VERDICT r4
    weak 7): when any survivor emits more orientation peaks than the packed
    kernel's slot capacity N_PEAKS_CAP, extractor._detect_octave_batched's
    lax.cond must take the full-width XLA emit_slow path — exercised here by
    patching N_PEAKS_CAP to 1 (multi-orientation survivors then overflow) —
    and reproduce the fast path's emission set byte-for-byte."""
    from sift_features_tpu.config import DEFAULT_CONFIG
    from sift_features_tpu.models.extractor import _detect_octave_batched
    from sift_features_tpu.ops import descriptor as desc_ops
    from sift_features_tpu.ops import pyramid as pyr_ops
    from sift_features_tpu.ops.pallas import orientation_packed
    from sift_features_tpu.ops.pallas.pyramid_kernel import (
        build_octave_fused, reflect_pad_image)

    cfg = DEFAULT_CONFIG
    img = bird_small_cv2[:96, :128]
    seed = pyr_ops.create_seed_image(jnp.asarray(img)[None], cfg)  # (1,h,w)
    P = desc_ops.PAD_DESC
    h, w = seed.shape[1], seed.shape[2]
    h_pad = -(-(h + 2 * P) // 128) * 128
    w_pad = -(-(w + 2 * P) // 128) * 128
    base = jax.vmap(lambda im: reflect_pad_image(
        im, P, w_pad - w - 2 * P, h_pad - h - 2 * P))(seed)
    g, d, _, _ = build_octave_fused(base, cfg, interpret=True)

    r_fast = _detect_octave_batched(g, d, 0, cfg, (h, w), interpret=True)
    # precondition for the overflow: at least one survivor must emit >= 2
    # orientations, so the PK=1 run below actually trips n_pk > PK
    assert (int(np.asarray(r_fast["n_emitted"]).sum())
            > int(np.asarray(r_fast["n_survivors"]).sum()))

    old = orientation_packed.N_PEAKS_CAP
    # same arg shapes as the r_fast trace: drop the jit caches so the PK=1
    # kernel is actually retraced rather than served from the PK=4 cache
    jax.clear_caches()
    orientation_packed.N_PEAKS_CAP = 1
    try:
        r_slow = _detect_octave_batched(g, d, 0, cfg, (h, w), interpret=True)
    finally:
        orientation_packed.N_PEAKS_CAP = old
        jax.clear_caches()

    np.testing.assert_array_equal(np.asarray(r_fast["valid"]),
                                  np.asarray(r_slow["valid"]))
    v = np.asarray(r_fast["valid"])
    np.testing.assert_array_equal(np.asarray(r_fast["kps"])[v],
                                  np.asarray(r_slow["kps"])[v])
    np.testing.assert_array_equal(np.asarray(r_fast["desc"])[v],
                                  np.asarray(r_slow["desc"])[v])
    np.testing.assert_array_equal(np.asarray(r_fast["n_emitted"]),
                                  np.asarray(r_slow["n_emitted"]))


@pytest.mark.slow
def test_detect_octave_split_storage_detection_set(bird_small_cv2):
    """e2e split-storage parity through the real batched detection path
    (VERDICT r4 task 1): with storage_dtype="split" the fused pyramid
    stores the Gaussian stack bf16 but the DoG f32 from the unrounded
    chain, so the DETECTED (x, y, size, response) set must be
    byte-identical to the f32 run — only orientation-peak emission
    multiplicities may flip (window reads are bf16). Hardware twin:
    tools/check_split_detection.py (TPU run recorded in BENCH.md r5)."""
    from sift_features_tpu.config import DEFAULT_CONFIG
    from sift_features_tpu.models.extractor import _detect_octave_batched
    from sift_features_tpu.ops import descriptor as desc_ops
    from sift_features_tpu.ops import pyramid as pyr_ops
    from sift_features_tpu.ops.pallas.pyramid_kernel import (
        build_octave_fused, reflect_pad_image)

    cfg = DEFAULT_CONFIG
    img = bird_small_cv2[:96, :128]
    seed = pyr_ops.create_seed_image(jnp.asarray(img)[None], cfg)
    P = desc_ops.PAD_DESC
    h, w = seed.shape[1], seed.shape[2]
    h_pad = -(-(h + 2 * P) // 128) * 128
    w_pad = -(-(w + 2 * P) // 128) * 128
    base = jax.vmap(lambda im: reflect_pad_image(
        im, P, w_pad - w - 2 * P, h_pad - h - 2 * P))(seed)
    g32, d32, _, _ = build_octave_fused(base, cfg, interpret=True)
    gsp, dsp, _, l3 = build_octave_fused(base, cfg, interpret=True,
                                         split=True)
    # split DoG is byte-equal (the chain never rounds); gauss stored bf16
    np.testing.assert_array_equal(np.asarray(d32), np.asarray(dsp))
    assert gsp.dtype == jnp.bfloat16 and l3.dtype == jnp.float32

    r32 = _detect_octave_batched(g32, d32, 0, cfg, (h, w), interpret=True)
    rsp = _detect_octave_batched(gsp, dsp, 0, cfg, (h, w), interpret=True)

    def detection_set(r):
        kps = np.asarray(r["kps"])[np.asarray(r["valid"])]
        return {tuple(v.tobytes() for v in row)
                for row in kps[:, [0, 1, 2, 4]].astype(np.float32)}

    a, b = detection_set(r32), detection_set(rsp)
    assert len(a) > 3
    assert a == b, (len(a - b), len(b - a))


@pytest.fixture(scope="module")
def masked_case():
    """Scattered-liveness multi-bucket case for the round-5 mask-dispatched
    window wrappers: 3 scale levels interleaved, live mask NOT a prefix."""
    rng = np.random.RandomState(5)
    h, w = 96, 128
    gauss = rng.rand(6, h, w).astype(np.float32)
    gp = np.asarray(desc_ops.pad_stack_for_kernels(jnp.asarray(gauss)))
    K = 300                      # > BK_INTERPRET: multi-block spans
    s_level = np.sort(rng.randint(1, 4, K)).astype(np.int32)
    # scattered dead lanes (≈25%) — the masked path's whole point
    live = rng.rand(K) > 0.25
    lo = np.array([0.0, 1.6, 2.26, 2.85])[s_level]
    hi = np.array([0.0, 2.26, 2.85, 3.59])[s_level]
    ks = (lo + (hi - lo) * rng.rand(K)).astype(np.float32)
    y = rng.randint(8, h - 8, K).astype(np.int32)
    x = rng.randint(8, w - 8, K).astype(np.int32)
    s_img = np.clip(s_level, 0, 5).astype(np.int32)
    return gp, s_img, s_level, y, x, ks, live, h, w


@pytest.mark.mid
def test_orientation_masked_matches_bucketed(masked_case):
    """Round-5 mask-dispatched orientation wrapper == the compacting
    bucketed wrapper, byte-for-byte (hist + in-kernel peaks), on scattered
    liveness across all three scale buckets."""
    from sift_features_tpu.config import DEFAULT_CONFIG
    from sift_features_tpu.ops.pallas.orientation_kernel import (
        orientation_histograms_bucketed, orientation_histograms_masked)

    gp, s_img, s_level, y, x, ks, live, h, w = masked_case
    cfg = DEFAULT_CONFIG
    args = (jnp.asarray(gp), jnp.asarray(s_img), jnp.asarray(s_level),
            jnp.asarray(y), jnp.asarray(x), jnp.asarray(ks))
    hb, ab, nb = orientation_histograms_bucketed(
        *args, None, h, w, desc_ops.PAD_DESC, cfg, interpret=True,
        live=jnp.asarray(live), with_peaks=True)
    hm, am, nm = orientation_histograms_masked(
        *args, h, w, desc_ops.PAD_DESC, cfg, interpret=True,
        live=jnp.asarray(live), with_peaks=True)
    np.testing.assert_array_equal(np.asarray(hb)[live], np.asarray(hm)[live])
    np.testing.assert_array_equal(np.asarray(ab)[live], np.asarray(am)[live])
    np.testing.assert_array_equal(np.asarray(nb)[live], np.asarray(nm)[live])
    # dead lanes are all-zero on the masked path
    assert (np.asarray(hm)[~live] == 0).all()
    assert (np.asarray(nm)[~live] == 0).all()


@pytest.mark.mid
def test_descriptor_masked_matches_bucketed(masked_case):
    """Round-5 mask-dispatched descriptor wrapper == the compacting
    bucketed wrapper, byte-for-byte, on scattered liveness."""
    from sift_features_tpu.config import DEFAULT_CONFIG
    from sift_features_tpu.ops.pallas.descriptor_kernel import (
        descriptor_hist_bucketed, descriptor_hist_masked)

    gp, s_img, s_level, y, x, ks, live, h, w = masked_case
    rng = np.random.RandomState(6)
    ang = (rng.rand(len(s_img)) * 360.0).astype(np.float32)
    cfg = DEFAULT_CONFIG
    args = (jnp.asarray(gp), jnp.asarray(s_img), jnp.asarray(s_level),
            jnp.asarray(x), jnp.asarray(y), jnp.asarray(ks),
            jnp.asarray(ang))
    hb = descriptor_hist_bucketed(
        *args, None, h, w, desc_ops.PAD_DESC, cfg, interpret=True,
        live=jnp.asarray(live))
    hm = descriptor_hist_masked(
        *args, h, w, desc_ops.PAD_DESC, cfg, interpret=True,
        live=jnp.asarray(live))
    np.testing.assert_array_equal(np.asarray(hb)[live], np.asarray(hm)[live])
    assert (np.asarray(hm)[~live] == 0).all()
