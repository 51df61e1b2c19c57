"""Orientation assignment (JAX, TPU-native).

Reference semantics: gradient_direction_histogram (lib.rs:655-757) and the
peak-extraction loop (lib.rs:371-433): 36-bin gradient histogram over radius
round(4.5 * kp_scale) from the Gaussian image at the candidate's (octave,
scale), Gaussian-weighted, smoothed ONCE with OpenCV's [1,4,6,4,1]/16
circular kernel, one keypoint per bin that is a strict local max AND >= 0.8x
the global max, parabolic bin interpolation, angle = 360 - 10*bin.

TPU design: candidates are a fixed-capacity batch; each gathers a static
(2*R_MAX+3)^2 window from the pre-padded Gaussian stack (dynamic_slice via
vmap — no bounds clamping because the pad covers the max radius), with masks
for the dynamic radius and image interior. Histogram accumulation is a
scatter-add over (candidate, bin) — accumulation order differs from the
reference's scalar scan, which only matters at the last-ULP level.

The atan2 runs in f64 when x64 is enabled (CPU tests — matching the
reference's f64 atan2, lib.rs:715) and f32 on TPU.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..config import DEFAULT_CONFIG, SiftConfig
from .extrema import rust_round

F32 = jnp.float32

# Max orientation radius: round(4.5 * kp_scale_max), kp_scale < 1.6 * 2^(3.5/3)
R_ORI_MAX = 16
PAD_ORI = R_ORI_MAX + 1  # +1 for the gradient's neighbor reads


def pad_stack(gauss: jnp.ndarray, pad: int) -> jnp.ndarray:
    """Zero-pad the (S, H, W) Gaussian stack spatially; padded samples are
    always masked out (the reference never reads outside [1, dim-2])."""
    return jnp.pad(gauss, ((0, 0), (pad, pad), (pad, pad)))


def kp_scale_of(s, off_s, cfg: SiftConfig = DEFAULT_CONFIG):
    """sigma of the keypoint in octave coords (lib.rs:372-374):
    0.8 * 2^((scale+off)/3) * 2."""
    e = (s.astype(F32) + off_s) / F32(cfg.scales_per_octave)
    pw = jnp.exp2(e.astype(jnp.float64)).astype(F32)  # f32 powf via f64 exp2
    return F32(cfg.sigma_min) * pw * F32(2.0)


def orientation_histograms(gauss_padded: jnp.ndarray, h: int, w: int,
                           s, y, x, kp_scale, valid,
                           cfg: SiftConfig = DEFAULT_CONFIG, pad: int = PAD_ORI):
    """Smoothed 36-bin histograms for a candidate batch.

    gauss_padded: (S+3, H+2*pad, W+2*pad) f32, pad >= PAD_ORI
    s/y/x: (K,) refined integer coords (octave-local, unpadded)
    Returns hist (K, 36) f32.
    """
    n_bins = cfg.n_orientation_bins
    K = s.shape[0]
    Wn = 2 * R_ORI_MAX + 3  # window incl. gradient halo

    radius = rust_round(F32(3.0) * F32(cfg.lambda_ori) * kp_scale)
    sigma = F32(cfg.lambda_ori) * kp_scale
    grad_weight_scale = F32(-1.0) / (F32(2.0) * sigma * sigma)

    def window(si, yi, xi):
        # top-left corner of the (Wn, Wn) window in padded coords
        return jax.lax.dynamic_slice(
            gauss_padded,
            (si, yi + pad - R_ORI_MAX - 1, xi + pad - R_ORI_MAX - 1),
            (1, Wn, Wn))[0]

    win = jax.vmap(window)(s, y, x)  # (K, Wn, Wn)

    # gradients at offsets (dy, dx) in [-R..R]^2: interior of the window
    c = win[:, 1:-1, 1:-1]  # noqa: F841 (center values unused; grads below)
    dx = win[:, 1:-1, 2:] - win[:, 1:-1, :-2]
    dy = win[:, :-2, 1:-1] - win[:, 2:, 1:-1]

    offs = jnp.arange(-R_ORI_MAX, R_ORI_MAX + 1)
    dyy = offs[None, :, None]
    dxx = offs[None, None, :]
    y_img = y[:, None, None] + dyy
    x_img = x[:, None, None] + dxx
    in_radius = (jnp.abs(dyy) <= radius[:, None, None]) & (jnp.abs(dxx) <= radius[:, None, None])
    interior = (y_img >= 1) & (y_img <= h - 2) & (x_img >= 1) & (x_img <= w - 2)
    ok = in_radius & interior & valid[:, None, None]

    d2 = (dyy * dyy + dxx * dxx).astype(F32)
    # f64 exp when x64 enabled (oracle matches glibc expf via f64), f32 on TPU
    weights = jnp.exp((d2 * grad_weight_scale[:, None, None]).astype(jnp.float64)).astype(F32)
    mags = jnp.sqrt(dx * dx + dy * dy)
    # f64 atan2 when x64 enabled (reference: lib.rs:715), f32 on TPU
    oris = jnp.arctan2(dy.astype(jnp.float64), dx.astype(jnp.float64)).astype(F32)

    bin_angle_step = np.float32(n_bins) / (np.float32(np.pi) * np.float32(2.0))
    b = rust_round(bin_angle_step * oris).astype(jnp.int32)
    b = jnp.where(b >= n_bins, b - n_bins, b)
    b = jnp.where(b < 0, b + n_bins, b)

    contrib = jnp.where(ok, weights * mags, F32(0.0))
    # histogram via per-bin masked sums (VPU reductions) — TPU scatter-add is
    # orders of magnitude slower; accumulation order differs from the
    # reference's scalar scan only at the last-ULP level
    cflat = contrib.reshape(K, -1)
    bflat = b.reshape(K, -1)
    raw = jnp.stack(
        [jnp.sum(jnp.where(bflat == i, cflat, F32(0.0)), axis=1)
         for i in range(n_bins)], axis=1)

    # circular [1,4,6,4,1]/16 smoothing, applied once (lib.rs:737-756)
    rm2 = jnp.roll(raw, 2, axis=1)
    rm1 = jnp.roll(raw, 1, axis=1)
    rp1 = jnp.roll(raw, -1, axis=1)
    rp2 = jnp.roll(raw, -2, axis=1)
    hist = ((rm2 + rp2) * F32(1.0 / 16.0)
            + (rm1 + rp1) * F32(4.0 / 16.0)
            + raw * F32(6.0) / F32(16.0))
    return hist


def orientation_histograms_blocked(gauss_padded: jnp.ndarray, h: int, w: int,
                                   s, y, x, kp_scale, valid,
                                   cfg: SiftConfig = DEFAULT_CONFIG,
                                   pad: int = PAD_ORI, block: int = 256,
                                   count=None):
    """Block-mapped orientation_histograms with runtime skip of blocks past
    `count` valid lanes (lax.cond) — cost scales with the actual candidate
    count, not the static capacity."""
    K = s.shape[0]
    if K <= block:
        return orientation_histograms(gauss_padded, h, w, s, y, x, kp_scale,
                                      valid, cfg, pad=pad)
    nb = -(-K // block)
    padn = nb * block - K

    def padded(a):
        return jnp.pad(a, (0, padn)).reshape(nb, block)

    args = (jnp.arange(nb, dtype=jnp.int32) * block,
            (padded(s), padded(y), padded(x), padded(kp_scale), padded(valid)))

    def compute(blk):
        s_, y_, x_, ks, va = blk
        return orientation_histograms(gauss_padded, h, w, s_, y_, x_, ks, va,
                                      cfg, pad=pad)

    def body(arg):
        start, blk = arg
        if count is None:
            return compute(blk)
        # zero branch derives from blk for matching shard_map variance
        return jax.lax.cond(
            start < count, compute,
            lambda b: jnp.zeros((block, cfg.n_orientation_bins), F32)
            + b[3][0] * 0, blk)

    out = jax.lax.map(body, args)
    return out.reshape(nb * block, -1)[:K]


def orientation_peaks(hist: jnp.ndarray, cfg: SiftConfig = DEFAULT_CONFIG):
    """Per-candidate reference orientations (lib.rs:394-431).

    Returns (angles (K, n_bins) f32, emit (K, n_bins) bool): one keypoint per
    qualifying bin.
    """
    n_bins = cfg.n_orientation_bins
    hmax = jnp.max(hist, axis=1, keepdims=True)
    thr = hmax * F32(cfg.orientation_localmax_ratio)
    hm = jnp.roll(hist, 1, axis=1)   # h[k-1]
    hp = jnp.roll(hist, -1, axis=1)  # h[k+1]
    emit = (hist > hm) & (hist > hp) & (hist >= thr)
    interp = (hm - hp) / (hm - F32(2.0) * hist + hp)
    k = jnp.arange(n_bins, dtype=F32)[None, :]
    bin_f = k + F32(0.5) * interp
    bin_f = jnp.where(bin_f < 0, F32(n_bins) + bin_f,
                      jnp.where(bin_f >= n_bins, bin_f - F32(n_bins), bin_f))
    angles = F32(360.0) - (F32(360.0) / F32(n_bins)) * bin_f
    # div-by-zero lanes (flat hist) produce NaN; they are never emitted
    return angles, emit
