"""128-D SIFT descriptor (JAX, TPU-native).

Reference semantics: compute_descriptors / compute_descriptor
(lib.rs:759-990): 4x4 spatial x 8 orientation histograms over a rotated
window of radius round(3*scale*sqrt(2)*5/2) around the keypoint, trilinear
scatter into a padded 6x6x8 accumulator with circular orientation wrap,
then: chunks-of-4 L2 accumulation (OpenCV SIMD order mimicry, lib.rs:957-976),
clamp at 0.2*||v||, renormalize to 512, round-half-away, saturating u8 cast.

TPU design: keypoints are a fixed-capacity batch per octave; each gathers a
static (2*R_MAX+3)^2 window from the pre-padded Gaussian stack. Samples
outside the dynamic radius / rotated 4x4 grid / image interior are masked.
The 8-way trilinear scatter becomes a batched scatter-add into (M, 6*6*8).
Chunked into fixed-size keypoint blocks to bound the gathered-window HBM
footprint.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..config import DEFAULT_CONFIG, SiftConfig
from .extrema import rust_round

F32 = jnp.float32

# Max descriptor radius: round(3*scale*sqrt(2)*2.5) with scale < 3.5923
R_DESC_MAX = 39
# window start pad (R+1) + Pallas DMA sublane-alignment overreach (aligned
# start rounds down by <=7, the copy reads 96 rows: worst end = y+pad-R-1+7+96
# <= (h-1)+pad+62-R must stay within h+2*pad => pad >= 62-R+... use R+17
PAD_DESC = R_DESC_MAX + 17


def pad_stack_for_kernels(gauss: "jnp.ndarray") -> "jnp.ndarray":
    """Pad an (S, H, W) Gaussian stack for the window kernels: PAD_DESC on
    all sides, plus extra right columns so the padded width is a multiple of
    128 — the Pallas DMA clamps its lane-aligned start against
    (padded_w - 256), which is then itself 128-aligned."""
    w_pad = gauss.shape[-1] + 2 * PAD_DESC
    extra = (-w_pad) % 128
    return jnp.pad(gauss, ((0, 0), (PAD_DESC, PAD_DESC),
                           (PAD_DESC, PAD_DESC + extra)))

DEG2RAD_F32 = np.float32(np.float32(np.pi) / np.float32(180.0))  # Rust to_radians


def descriptor_batch(gauss_padded: jnp.ndarray, h: int, w: int,
                     scale_idx, x_oct, y_oct, kp_scale, angle, valid,
                     cfg: SiftConfig = DEFAULT_CONFIG) -> jnp.ndarray:
    """Descriptors for a keypoint batch within one octave.

    gauss_padded: (S+3, H+2P, W+2P) f32, PAD_DESC padding.
    scale_idx: (M,) int32 — Gaussian image index (kp.scale)
    x_oct/y_oct: (M,) f32 — keypoint coords in octave pixels
    kp_scale:   (M,) f32 — sigma in octave coords (== kp.size / 2^octave)
    angle:      (M,) f32 — keypoint angle in degrees (output convention)
    Returns (M, 128) u8.
    """
    n_hist = cfg.descriptor_n_histograms
    n_bins = cfg.descriptor_n_bins
    M = scale_idx.shape[0]
    Wn = 2 * R_DESC_MAX + 3

    # lib.rs:766: descriptor orientation = 360 - kp.angle
    orientation = F32(360.0) - angle
    xi = rust_round(x_oct).astype(jnp.int32)
    yi = rust_round(y_oct).astype(jnp.int32)
    hist_width = F32(cfg.lambda_descr) * kp_scale
    radius = rust_round(F32(cfg.lambda_descr) * kp_scale * np.float32(np.sqrt(np.float32(2.0)))
                        * F32(n_hist + 1) * F32(0.5))
    ori_rad = orientation * DEG2RAD_F32
    sin_ori = jnp.sin(ori_rad.astype(jnp.float64)).astype(F32)
    cos_ori = jnp.cos(ori_rad.astype(jnp.float64)).astype(F32)
    sin_s = sin_ori / hist_width
    cos_s = cos_ori / hist_width

    def window(si, yc, xc):
        return jax.lax.dynamic_slice(
            gauss_padded,
            (si, yc + PAD_DESC - R_DESC_MAX - 1, xc + PAD_DESC - R_DESC_MAX - 1),
            (1, Wn, Wn))[0]

    win = jax.vmap(window)(scale_idx, yi, xi)  # (M, Wn, Wn)
    dx = win[:, 1:-1, 2:] - win[:, 1:-1, :-2]
    dy = win[:, :-2, 1:-1] - win[:, 2:, 1:-1]

    offs = jnp.arange(-R_DESC_MAX, R_DESC_MAX + 1)
    dyy = offs[None, :, None].astype(F32)
    dxx = offs[None, None, :].astype(F32)
    col_rot = dxx * cos_s[:, None, None] - dyy * sin_s[:, None, None]
    row_rot = dxx * sin_s[:, None, None] + dyy * cos_s[:, None, None]
    half = F32(n_hist / 2)
    row_bin = row_rot + half
    col_bin = col_rot + half

    y_img = yi[:, None, None] + offs[None, :, None]
    x_img = xi[:, None, None] + offs[None, None, :]
    in_radius = ((jnp.abs(offs)[None, :, None] <= radius[:, None, None])
                 & (jnp.abs(offs)[None, None, :] <= radius[:, None, None]))
    ok = (in_radius
          & (row_bin > -0.5) & (row_bin < n_hist + 0.5)
          & (col_bin > -0.5) & (col_bin < n_hist + 0.5)
          & (y_img > 0) & (y_img < h - 1)
          & (x_img > 0) & (x_img < w - 1)
          & valid[:, None, None])

    weight_scale = F32(-2.0) / F32(n_hist * n_hist)
    w2 = col_rot * col_rot + row_rot * row_rot
    weights = jnp.exp((w2 * weight_scale).astype(jnp.float64)).astype(F32)
    mag = jnp.sqrt(dx * dx + dy * dy)
    deg = jnp.degrees(jnp.arctan2(dy.astype(jnp.float64), dx.astype(jnp.float64)))
    ori_norm = ((deg + 360.0) % 360.0).astype(F32) - orientation[:, None, None]

    # trilinear scatter (lib.rs:883-948)
    bin_angle_step = np.float32(np.float32(n_bins) / np.float32(360.0))
    rb = row_bin - F32(0.5)
    cb = col_bin - F32(0.5)
    m = jnp.where(ok, mag * weights, F32(0.0))
    obin = ori_norm * bin_angle_step
    rfl = jnp.floor(rb)
    cfl = jnp.floor(cb)
    ofl = jnp.floor(obin)
    # sanitize masked lanes (invalid keypoints have hist_width=0 -> NaN bins;
    # 0-contribution * NaN would still scatter NaN)
    rfr = jnp.where(ok, rb - rfl, F32(0.0))
    cfr = jnp.where(ok, cb - cfl, F32(0.0))
    ofr = jnp.where(ok, obin - ofl, F32(0.0))
    rfl = jnp.where(ok, rfl, F32(0.0))
    cfl = jnp.where(ok, cfl, F32(0.0))
    ofl = jnp.where(ok, ofl, F32(0.0))

    side = n_hist + 2
    # masked lanes: rb/cb can be wild for masked samples; clamp indices into
    # range, contributions are zero there anyway
    r1 = jnp.clip(rfl.astype(jnp.int32) + 1, 0, side - 2)
    c1i = jnp.clip(cfl.astype(jnp.int32) + 1, 0, side - 2)
    of = ofl.astype(jnp.int32)
    of = jnp.where(of < 0, of + n_bins, of)
    of = jnp.where(of >= n_bins, of - n_bins, of)
    of = jnp.clip(of, 0, n_bins - 1)
    of1 = jnp.where(of + 1 >= n_bins, 0, of + 1)

    # Separable trilinear accumulation on the MXU: contribution to
    # (r, c, o) = m * u_r(r) * u_c(c) * u_o(o) with u_r = {1-rfr at r1,
    # rfr at r1+1} etc. hist[m, rc, o] = sum_s V[m,s,rc] * U_o[m,s,o]
    # — a batched matmul contracting the samples axis, replacing the
    # reference's 8-way scatter (lib.rs:940-947). TPU scatter-add would be
    # ~100x slower; the product form differs from the reference's
    # subtract-chain (c0 = m - m*rfr vs m*(1-rfr)) by <=1 ULP per sample.
    S_w = (2 * R_DESC_MAX + 1) ** 2
    mf = m.reshape(M, S_w)
    rfr_ = rfr.reshape(M, S_w)
    cfr_ = cfr.reshape(M, S_w)
    ofr_ = ofr.reshape(M, S_w)
    r1_ = r1.reshape(M, S_w)
    c1_ = c1i.reshape(M, S_w)
    of_ = of.reshape(M, S_w)
    of1_ = of1.reshape(M, S_w)

    rows = jnp.arange(side, dtype=jnp.int32)
    cols = jnp.arange(side, dtype=jnp.int32)
    obins = jnp.arange(n_bins, dtype=jnp.int32)
    # U_r (M,S,side), U_c (M,S,side), U_o (M,S,n_bins)
    u_r = (jnp.where(rows == r1_[..., None], (F32(1.0) - rfr_)[..., None], F32(0.0))
           + jnp.where(rows == r1_[..., None] + 1, rfr_[..., None], F32(0.0)))
    u_c = (jnp.where(cols == c1_[..., None], (F32(1.0) - cfr_)[..., None], F32(0.0))
           + jnp.where(cols == c1_[..., None] + 1, cfr_[..., None], F32(0.0)))
    u_o = (jnp.where(obins == of_[..., None], mf[..., None] * (F32(1.0) - ofr_)[..., None], F32(0.0))
           + jnp.where(obins == of1_[..., None], mf[..., None] * ofr_[..., None], F32(0.0)))
    v_rc = (u_r[:, :, :, None] * u_c[:, :, None, :]).reshape(M, S_w, side * side)
    hist = jax.lax.dot_general(
        v_rc, u_o, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)  # (M, side*side, n_bins)
    hist = hist.reshape(M, side, side, n_bins)[:, 1:-1, 1:-1, :].reshape(M, -1)

    return finalize_descriptor(hist, cfg)


def descriptor_batch_blocked(gauss_padded: jnp.ndarray, h: int, w: int,
                             scale_idx, x_oct, y_oct, kp_scale, angle, valid,
                             cfg: SiftConfig = DEFAULT_CONFIG,
                             block: int = 32, count=None) -> jnp.ndarray:
    """Block-mapped descriptor_batch: bounds the (M, 81, 81, 8) gather/scatter
    working set to `block` keypoints at a time via lax.map (compiled once).

    `count` (traced int32): number of leading valid lanes; blocks entirely
    past it are SKIPPED at runtime (lax.cond), so cost scales with the
    actual keypoint count, not the static capacity."""
    M = scale_idx.shape[0]
    if M <= block:
        return descriptor_batch(gauss_padded, h, w, scale_idx, x_oct, y_oct,
                                kp_scale, angle, valid, cfg)
    nb = -(-M // block)
    pad = nb * block - M

    def padded(a, fill=0):
        return jnp.pad(a, [(0, pad)] + [(0, 0)] * (a.ndim - 1),
                       constant_values=fill).reshape(nb, block, *a.shape[1:])

    args = (jnp.arange(nb, dtype=jnp.int32) * block,
            (padded(scale_idx), padded(x_oct), padded(y_oct),
             padded(kp_scale), padded(angle), padded(valid)))

    def compute(blk):
        si, xo, yo, ks, an, va = blk
        return descriptor_batch(gauss_padded, h, w, si, xo, yo, ks, an, va, cfg)

    def body(arg):
        start, blk = arg
        if count is None:
            return compute(blk)
        # the zero branch derives from blk so both branches carry the same
        # device-variance under shard_map (plain zeros would be 'replicated')
        return jax.lax.cond(
            start < count, compute,
            lambda b: jnp.zeros((block, cfg.descriptor_size), jnp.uint8)
            + (b[0][0] * 0).astype(jnp.uint8), blk)

    out = jax.lax.map(body, args)
    return out.reshape(nb * block, -1)[:M]


def finalize_descriptor(hist: jnp.ndarray, cfg: SiftConfig = DEFAULT_CONFIG) -> jnp.ndarray:
    """Normalization + quantization (lib.rs:950-990), preserving the
    chunks-of-4 sequential accumulation order for bit parity."""
    M, D = hist.shape

    def chunked_l2(v):
        sq = v * v
        ch = sq.reshape(M, D // 4, 4)
        csum = ((ch[:, :, 0] + ch[:, :, 1]) + ch[:, :, 2]) + ch[:, :, 3]
        acc = csum[:, 0]
        for i in range(1, D // 4):  # static unroll: sequential f32 fold
            acc = acc + csum[:, i]
        return jnp.sqrt(acc)

    l2_uncapped = chunked_l2(hist)
    cap = l2_uncapped * F32(cfg.descriptor_magnitude_cap)
    hist = jnp.minimum(hist, cap[:, None])
    l2_capped = chunked_l2(hist)
    normalizer = F32(cfg.descriptor_l2_norm) / jnp.maximum(l2_capped, np.float32(np.finfo(np.float32).eps))
    q = rust_round(hist * normalizer[:, None])
    return jnp.clip(q, 0, 255).astype(jnp.uint8)
