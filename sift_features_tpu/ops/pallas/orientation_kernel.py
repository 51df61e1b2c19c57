"""Pallas TPU kernel: 36-bin orientation histograms for a candidate batch.

Replaces ops.orientation.orientation_histograms on TPU: instead of an XLA
gather of (K, 37, 37) windows + per-bin masked sums over HBM-materialized
intermediates, each grid step DMAs its candidates' windows HBM->VMEM
(double-buffered) and does the gradient/weight/bin math plus all 36 masked
reductions entirely in VMEM. Blocks wholly past the valid count are skipped
via @pl.when, so cost scales with the real candidate count.

Window sizes are SCALE-BUCKETED (see descriptor_kernel): the orientation
radius round(4.5*kp_scale) (lib.rs:381-388) is bounded by the integer scale
index, so s=1/2/3 candidates fit 21/27/33-sample windows; the bucketed
wrapper partitions the batch by s. The lane DMA is split into two 128-lane
halves with the second fetched only when the window straddles it.

Candidate validity == lane index < count (the candidate buffers come from
the order-preserving compaction, so valid lanes are exactly the leading
`count` lanes).

Numerics: f32 throughout (atan2/exp in f32 — same as the XLA TPU path where
x64 is unavailable; the CPU oracle keeps the f64 reference semantics).
Reference math: gradient_direction_histogram (lib.rs:655-757).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...config import DEFAULT_CONFIG, SiftConfig
from .util import atan2_f32, round_half_away
from ..orientation import R_ORI_MAX
from ...utils.compact import compact_indices

F32 = jnp.float32
LANES = 128
LANES_DMA = 256             # lane-aligned DMA width (window + <=127 shift)
BK = 32                     # candidates per grid step on hardware
BK_INTERPRET = 8   # small blocks keep interpret-mode tests tractable

# radius = round(4.5*kp_scale) with kp_scale < 1.6*2^((s+0.5)/3)
# (Default-config instance of bucket_radii_ori(); kept as a constant for tests.)
BUCKET_R_ORI = {1: 10, 2: 13, 3: 16}


def bucket_radii_ori(cfg: SiftConfig) -> dict[int, int]:
    """Per-scale-level orientation window radius bound derived from cfg (see
    descriptor_kernel.bucket_radii for why this must not be hardcoded).
    Radius is round(3*lambda_ori*kp_scale) (lib.rs:380) with kp_scale <
    sigma_min*inv_delta_min*2^((s+0.5)/scales_per_octave)."""
    factor = 3.0 * cfg.lambda_ori
    out = {}
    for s in range(1, cfg.scales_per_octave + 1):
        scl_max = (cfg.sigma_min * cfg.inv_delta_min
                   * 2.0 ** ((s + 0.5) / cfg.scales_per_octave))
        out[s] = int(round(factor * scl_max))
    from ..orientation import R_ORI_MAX

    if max(out.values()) > R_ORI_MAX:
        raise ValueError(
            f"orientation window radius {max(out.values())} exceeds the "
            f"kernel bound R_ORI_MAX={R_ORI_MAX} for scales_per_octave="
            f"{cfg.scales_per_octave}; use use_pallas=False for this config")
    return out


def _subl(wn: int, al: int = 8) -> int:
    return -(-wn // al) * al + al   # window rows + up to al-1 alignment rows


def _kernel(count_ref, s_ref, y_ref, x_ref,
            scale_blk, gauss_hbm, hist_ref, win_ref, sem, *, n_bins,
            lambda_ori, h, w, pad, w_pad, r_max, BK, al=8):
    blk = pl.program_id(0)
    base = blk * BK
    wn = 2 * r_max + 3
    subl = _subl(wn, al)
    n = wn - 2

    def start_y(i):
        return y_ref[i] + pad - r_max - 1

    def start_x(i):
        return x_ref[i] + pad - r_max - 1

    def copies(slot, k):
        # Tile-aligned DMA superset + in-register shift (see
        # descriptor_kernel._kernel for the alignment rules); second half
        # fetched only when the window reaches into it.
        i = base + k
        ys_al = pl.multiple_of((start_y(i) // al) * al, al)
        xs = start_x(i)
        xs_al = pl.multiple_of(
            jnp.minimum((xs // 128) * 128, w_pad - LANES_DMA), 128)
        need2 = (xs - xs_al) + wn > LANES
        c1 = pltpu.make_async_copy(
            gauss_hbm.at[s_ref[i], pl.ds(ys_al, subl), pl.ds(xs_al, LANES)],
            win_ref.at[slot, :, 0:LANES], sem.at[slot, 0])
        c2 = pltpu.make_async_copy(
            gauss_hbm.at[s_ref[i], pl.ds(ys_al, subl),
                         pl.ds(xs_al + LANES, LANES)],
            win_ref.at[slot, :, LANES:LANES_DMA], sem.at[slot, 1])
        return c1, c2, need2

    def dma_start(slot, k):
        c1, c2, need2 = copies(slot, k)
        c1.start()

        @pl.when(need2)
        def _():
            c2.start()

    def dma_wait(slot, k):
        c1, c2, need2 = copies(slot, k)
        c1.wait()

        @pl.when(need2)
        def _():
            c2.wait()

    @pl.when(base < count_ref[0])
    def _():
        dma_start(0, 0)

        # static unroll over the block: DMA k+1 starts before computing k
        for k in range(BK):
            slot = k % 2
            if k + 1 < BK:
                dma_start(1 - slot, k + 1)

            dma_wait(slot, k)
            ys = start_y(base + k)
            xs = start_x(base + k)
            ro = ys - (ys // al) * al
            co = xs - jnp.minimum((xs // 128) * 128, w_pad - LANES_DMA)
            # compiled dynamic rolls mis-handle negative shifts for
            # >16-sublane arrays: always shift by the positive complement
            win = pltpu.roll(win_ref[slot].astype(F32),
                             jax.lax.rem(subl - ro, jnp.int32(subl)), axis=0)
            win = pltpu.roll(win,
                             jax.lax.rem(LANES_DMA - co, jnp.int32(LANES_DMA)),
                             axis=1)
            dx = win[1:1 + n, 2:2 + n] - win[1:1 + n, 0:n]
            dy = win[0:n, 1:1 + n] - win[2:2 + n, 1:1 + n]

            i = base + k
            # f32 per-candidate params travel in VMEM (f32 scalar prefetch
            # mis-lowers on this backend); extract via (1,1) slice + sum
            kp_scale = jnp.sum(scale_blk[pl.ds(blk, 1), k:k + 1])
            yi = y_ref[i]
            xi = x_ref[i]
            sigma = F32(lambda_ori) * kp_scale
            radius = round_half_away(F32(3.0) * F32(lambda_ori) * kp_scale)
            gws = F32(-1.0) / (F32(2.0) * sigma * sigma)

            dyy = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0) - r_max
            dxx = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1) - r_max
            y_img = yi + dyy
            x_img = xi + dxx
            ok = ((jnp.abs(dyy).astype(F32) <= radius)
                  & (jnp.abs(dxx).astype(F32) <= radius)
                  & (y_img >= 1) & (y_img <= h - 2)
                  & (x_img >= 1) & (x_img <= w - 2)
                  & (i < count_ref[0]))

            d2 = (dyy * dyy + dxx * dxx).astype(F32)
            weights = jnp.exp(d2 * gws)
            mags = jnp.sqrt(dx * dx + dy * dy)
            oris = atan2_f32(dy, dx)

            bstep = np.float32(n_bins) / (np.float32(np.pi) * np.float32(2.0))
            b = round_half_away(bstep * oris).astype(jnp.int32)
            b = jnp.where(b >= n_bins, b - n_bins, b)
            b = jnp.where(b < 0, b + n_bins, b)

            contrib = jnp.where(ok, weights * mags, F32(0.0))
            row = jnp.concatenate(
                [jnp.sum(jnp.where(b == bi, contrib, F32(0.0))).reshape(1, 1)
                 for bi in range(n_bins)], axis=1)        # (1, n_bins)
            hist_ref[pl.ds(k, 1), :] = row

    @pl.when(base >= count_ref[0])
    def _():
        hist_ref[:, :] = jnp.zeros((BK, n_bins), F32)


def _smooth(raw):
    """OpenCV's [1,4,6,4,1]/16 circular smoothing, applied once
    (lib.rs:737-756)."""
    rm2 = jnp.roll(raw, 2, axis=1)
    rm1 = jnp.roll(raw, 1, axis=1)
    rp1 = jnp.roll(raw, -1, axis=1)
    rp2 = jnp.roll(raw, -2, axis=1)
    return ((rm2 + rp2) * F32(1.0 / 16.0)
            + (rm1 + rp1) * F32(4.0 / 16.0)
            + raw * F32(6.0) / F32(16.0))


@functools.partial(jax.jit, static_argnums=(6, 7, 8, 9, 10, 11, 12))
def orientation_histograms_pallas(gauss_padded, s, y, x, kp_scale, count,
                                  h: int, w: int, pad: int,
                                  cfg: SiftConfig = DEFAULT_CONFIG,
                                  interpret: bool = False,
                                  r_max: int = R_ORI_MAX,
                                  smooth: bool = True):
    """gauss_padded: (S+3, H+2P, W+2P) f32 (pad >= r_max+1).
    s/y/x: (K,) int32 (compacted: lanes >= count are padding), kp_scale:
    (K,) f32, count: int32 true candidate count. Every candidate's dynamic
    radius round(4.5*kp_scale) must be <= r_max (guaranteed per scale
    bucket, see BUCKET_R_ORI). Returns smoothed (K, 36) f32 histograms."""
    K = s.shape[0]
    BK = BK_INTERPRET if interpret else globals()["BK"]
    al = 16 if gauss_padded.dtype == jnp.bfloat16 else 8
    nb = -(-K // BK)
    padn = nb * BK - K

    def pad1(a):
        return jnp.pad(a, (0, padn))

    n_bins = cfg.n_orientation_bins

    kernel = functools.partial(
        _kernel, n_bins=n_bins, lambda_ori=cfg.lambda_ori,
        h=h, w=w, pad=pad, w_pad=gauss_padded.shape[2], r_max=r_max, BK=BK,
        al=al)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,   # count, s, y, x
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # kp_scale (nb, BK)
            pl.BlockSpec(memory_space=pl.ANY),       # gauss stack (HBM)
        ],
        out_specs=pl.BlockSpec((BK, n_bins), lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, _subl(2 * r_max + 3, al), LANES_DMA),
                       gauss_padded.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )

    raw = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb * BK, n_bins), jnp.float32),
        interpret=interpret,
    )(jnp.asarray(count, jnp.int32).reshape(1),
      pad1(jnp.clip(s, 0, gauss_padded.shape[0] - 1)).astype(jnp.int32),
      pad1(jnp.clip(y, 0, h - 1)).astype(jnp.int32),
      pad1(jnp.clip(x, 0, w - 1)).astype(jnp.int32),
      pad1(kp_scale).reshape(nb, BK),
      gauss_padded)

    raw = raw[:K]
    return _smooth(raw) if smooth else raw


def orientation_histograms_bucketed(gauss_padded, s_img, s_level, y, x,
                                    kp_scale, count, h: int, w: int, pad: int,
                                    cfg: SiftConfig = DEFAULT_CONFIG,
                                    interpret: bool = False, live=None,
                                    chunk: int = 32768,
                                    with_peaks: bool = False):
    """Scale-bucketed orientation histograms: partitions the candidate batch
    by integer scale index and runs a right-sized kernel per bucket
    (BUCKET_R_ORI), restoring original row order. Exactly equal to
    orientation_histograms_pallas(r_max=R_ORI_MAX).

    s_img: (K,) int32 Gaussian image index to sample; s_level: (K,) int32
    raw scale index in [1, 3] — the bucket key bounding kp_scale. live:
    optional (K,) bool validity mask replacing the lane < count prefix.

    with_peaks: return (hist, angles_p, n_peaks) with the packed kernels'
    in-kernel peak extraction merged across buckets (see
    orientation_packed.N_PEAKS_CAP) — or (hist, None, None) when any
    bucket runs the per-keypoint kernel (cfg.window_kernel != "packed"),
    which has no peak path; callers then use the XLA peaks."""
    from .orientation_packed import (N_PEAKS_CAP,
                                     orientation_histograms_packed)

    K = s_img.shape[0]
    if live is None:
        live = jnp.arange(K, dtype=jnp.int32) < count
    n_bins = cfg.n_orientation_bins
    out = jnp.zeros((K, n_bins), F32)
    out_ang = jnp.zeros((K, N_PEAKS_CAP), F32)
    out_npk = jnp.zeros((K,), jnp.int32)
    # scalar-prefetch operands live in SMEM: chunk huge batched candidate
    # sets into <=32k-lane kernel calls (chunks are block-size multiples,
    # so block boundaries and packing groups are unchanged — bit-identical
    # results)
    CHUNK = chunk
    peaks_ok = True
    for si, r_max in bucket_radii_ori(cfg).items():
        maskb = live & (s_level == si)
        idxb, validb, countb = compact_indices(maskb, K)
        from .descriptor_packed import pack_p

        packed = cfg.window_kernel == "packed" and pack_p(r_max) >= 2
        fn = (orientation_histograms_packed if packed
              else orientation_histograms_pallas)
        want_peaks = with_peaks and packed
        peaks_ok = peaks_ok and packed

        def run(sl):
            cnt = jnp.clip(countb - sl.start, 0, sl.stop - sl.start)
            args = (gauss_padded, s_img[idxb[sl]], y[idxb[sl]],
                    x[idxb[sl]], kp_scale[idxb[sl]], cnt, h, w, pad, cfg,
                    interpret, r_max, False)
            return fn(*args, True) if want_peaks else (fn(*args),)

        if K <= CHUNK:
            parts = [run(slice(0, K))]
        else:
            parts = [run(slice(c0, min(c0 + CHUNK, K)))
                     for c0 in range(0, K, CHUNK)]
        hb = (parts[0][0] if len(parts) == 1
              else jnp.concatenate([pp[0] for pp in parts], axis=0))
        rank = jnp.cumsum(maskb.astype(jnp.int32)) - 1
        out = jnp.where(maskb[:, None], jnp.take(hb, rank, axis=0), out)
        if want_peaks:
            ab = (parts[0][1] if len(parts) == 1
                  else jnp.concatenate([pp[1] for pp in parts], axis=0))
            nb_ = (parts[0][2] if len(parts) == 1
                   else jnp.concatenate([pp[2] for pp in parts], axis=0))
            out_ang = jnp.where(maskb[:, None],
                                jnp.take(ab, rank, axis=0), out_ang)
            out_npk = jnp.where(maskb, jnp.take(nb_, rank), out_npk)
    hist = _smooth(out)
    if not with_peaks:
        return hist
    if not peaks_ok:
        return hist, None, None
    return hist, out_ang, out_npk


def orientation_histograms_masked(gauss_padded, s_img, s_level, y, x,
                                  kp_scale, h: int, w: int, pad: int,
                                  cfg: SiftConfig = DEFAULT_CONFIG,
                                  interpret: bool = False, live=None,
                                  count=None, chunk: int = 32768,
                                  with_peaks: bool = False):
    """Mask-dispatched scale-bucketed orientation histograms (round 5).

    Bit-equal outputs to orientation_histograms_bucketed, with the
    per-bucket compaction + rank/take/where restore machinery REMOVED: each
    bucket's packed kernel runs over the full lane range with a per-lane
    live flag (live & s_level == si), skipping dead lanes' DMAs and dead
    group spans per block (survivors arrive scan-ordered, so s_level is
    sorted per frame and bucket membership is near-contiguous — the spans
    are tight). Bucket outputs have disjoint non-zero lanes and merge by
    addition (exact). Measured motivation: the wrapper machinery cost ~32
    of the stage's 42.6 ms/batch at octave-0 bench density
    (tools/window_breakdown.py, round 5).

    Falls back to orientation_histograms_bucketed when any bucket cannot
    lane-pack or cfg.window_kernel != "packed"."""
    from .descriptor_packed import pack_p
    from .orientation_packed import (N_PEAKS_CAP,
                                     orientation_histograms_packed_masked)

    radii = bucket_radii_ori(cfg)
    if (cfg.window_kernel != "packed"
            or any(pack_p(r) < 2 for r in radii.values())):
        return orientation_histograms_bucketed(
            gauss_padded, s_img, s_level, y, x, kp_scale, count, h, w, pad,
            cfg, interpret, live=live, chunk=chunk, with_peaks=with_peaks)

    K = s_img.shape[0]
    if live is None:
        live = jnp.arange(K, dtype=jnp.int32) < count
    n_bins = cfg.n_orientation_bins
    out = jnp.zeros((K, n_bins), F32)
    out_ang = jnp.zeros((K, N_PEAKS_CAP), F32)
    out_npk = jnp.zeros((K,), jnp.int32)
    CHUNK = chunk
    for si, r_max in radii.items():
        live_b = live & (s_level == si)

        def run(sl):
            return orientation_histograms_packed_masked(
                gauss_padded, s_img[sl], y[sl], x[sl], kp_scale[sl],
                live_b[sl], h, w, pad, cfg, interpret, r_max, False,
                with_peaks)

        sls = [slice(c0, min(c0 + CHUNK, K)) for c0 in range(0, K, CHUNK)]
        parts = [run(sl) for sl in sls]
        if not with_peaks:
            parts = [(pp,) for pp in parts]
        hb = (parts[0][0] if len(parts) == 1
              else jnp.concatenate([pp[0] for pp in parts], axis=0))
        out = out + hb
        if with_peaks:
            ab = (parts[0][1] if len(parts) == 1
                  else jnp.concatenate([pp[1] for pp in parts], axis=0))
            nb_ = (parts[0][2] if len(parts) == 1
                   else jnp.concatenate([pp[2] for pp in parts], axis=0))
            out_ang = out_ang + ab
            out_npk = out_npk + nb_
    hist = _smooth(out)
    if not with_peaks:
        return hist
    return hist, out_ang, out_npk
