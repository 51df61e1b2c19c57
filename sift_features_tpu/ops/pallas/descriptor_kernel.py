"""Pallas TPU kernel: raw 128-bin SIFT descriptor histograms per keypoint.

Replaces the gather + one-hot-matmul inner loop of ops.descriptor on TPU:
each grid step DMAs its keypoints' windows HBM->VMEM (double-buffered) and
performs the rotate/trilinear accumulation as VPU masked reductions entirely
in VMEM — the padded 6x6 accumulator's border cells are never computed (they
are cropped by the reference anyway, lib.rs:950-952). Blocks wholly past the
valid count are skipped.

Window sizes are SCALE-BUCKETED: the descriptor radius round(3*scale*sqrt(2)
*2.5) (lib.rs:800) is bounded by the keypoint's integer scale index s
(kp_scale = 0.8*2^((s+off)/3)*2 with |off| < 0.5), so s=1/2/3 keypoints fit
51/63/79-sample windows. descriptor_hist_bucketed partitions the batch by s
and runs a statically-sized kernel per bucket — most keypoints are s=1 and
pay ~40% of the full-window DMA + VPU cost. The lane DMA is also split into
two 128-lane halves with the second fetched only when the window actually
straddles it.

Outputs RAW f32 histograms (M, 128); the normalization/quantization tail
(chunks-of-4 order, clamp, 512-scale, u8 — lib.rs:950-990) runs outside via
ops.descriptor.finalize_descriptor.

Reference math: compute_descriptor (lib.rs:785-948).
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
from ..descriptor import R_DESC_MAX, DEG2RAD_F32
from ...utils.compact import compact_indices

F32 = jnp.float32
LANES = 128
LANES_DMA = 256             # lane-aligned DMA width (window + <=127 shift)
BK = 32                     # keypoints per grid step on hardware
BK_INTERPRET = 8   # small blocks keep interpret-mode tests tractable

# Scale-bucketed window radii: radius = round(10.6066*kp_scale) with
# kp_scale < 1.6*2^((s+0.5)/3) => bounds 24 / 30 / 38 for s = 1 / 2 / 3.
# (Default-config instance of bucket_radii(); kept as a constant for tests.)
BUCKET_R = {1: 24, 2: 30, 3: 38}


def bucket_radii(cfg: SiftConfig) -> dict[int, int]:
    """Per-scale-level descriptor window radius bound derived from cfg, so
    every live s_level in [1, cfg.scales_per_octave] maps to a bucket (a
    hardcoded {1,2,3} dict would silently zero descriptors for s_level > 3
    under a non-default scales_per_octave).

    kp_scale for level s is < sigma_min*inv_delta_min*2^((s+0.5)/n) (|off_s|
    < 0.5), and the window radius is round(lambda_descr*scale*sqrt(2)*
    (n_hist+1)/2) (lib.rs:800), monotone in scale."""
    import math

    factor = (cfg.lambda_descr * math.sqrt(2.0)
              * (cfg.descriptor_n_histograms + 1) / 2.0)
    out = {}
    for s in range(1, cfg.scales_per_octave + 1):
        scl_max = (cfg.sigma_min * cfg.inv_delta_min
                   * 2.0 ** ((s + 0.5) / cfg.scales_per_octave))
        out[s] = int(round(factor * scl_max))
    from ..descriptor import R_DESC_MAX

    if max(out.values()) > R_DESC_MAX:
        raise ValueError(
            f"descriptor window radius {max(out.values())} exceeds the "
            f"kernel bound R_DESC_MAX={R_DESC_MAX} for scales_per_octave="
            f"{cfg.scales_per_octave}; use use_pallas=False for this config")
    return out


def _subl(wn: int, al: int = 8) -> int:
    return -(-wn // al) * al + al   # window rows + up to al-1 alignment rows


def _kernel(count_ref, s_ref, y_ref, x_ref,
            scale_blk, angle_blk, gauss_hbm, hist_ref, win_ref, sem, *,
            n_hist, n_bins, lambda_descr, h, w, pad, w_pad, r_max, BK, al=8):
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
        # HBM slices must be tile-aligned (8 sublanes x 128 lanes) in both
        # start and size: DMA the aligned superset and shift in-register
        # afterwards (pltpu.roll). The second 128-lane half is only fetched
        # when the rolled window actually reaches into it.
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
            orientation = F32(360.0) - jnp.sum(angle_blk[pl.ds(blk, 1), k:k + 1])
            hist_width = F32(lambda_descr) * kp_scale
            radius = round_half_away(
                hist_width * np.float32(np.sqrt(np.float32(2.0)))
                * F32(n_hist + 1) * F32(0.5))
            ori_rad = orientation * DEG2RAD_F32
            sin_s = jnp.sin(ori_rad) / hist_width
            cos_s = jnp.cos(ori_rad) / hist_width

            dyy = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0) - r_max
            dxx = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1) - r_max
            dyf = dyy.astype(F32)
            dxf = dxx.astype(F32)
            col_rot = dxf * cos_s - dyf * sin_s
            row_rot = dxf * sin_s + dyf * cos_s
            half = F32(n_hist / 2)
            row_bin = row_rot + half
            col_bin = col_rot + half

            y_img = yi + dyy
            x_img = xi + dxx
            ok = ((jnp.abs(dyy).astype(F32) <= radius)
                  & (jnp.abs(dxx).astype(F32) <= radius)
                  & (row_bin > F32(-0.5)) & (row_bin < F32(n_hist + 0.5))
                  & (col_bin > F32(-0.5)) & (col_bin < F32(n_hist + 0.5))
                  & (y_img > 0) & (y_img < h - 1)
                  & (x_img > 0) & (x_img < w - 1)
                  & (i < count_ref[0]))

            wscale = F32(-2.0) / F32(n_hist * n_hist)
            w2 = col_rot * col_rot + row_rot * row_rot
            weights = jnp.exp(w2 * wscale)
            mag = jnp.sqrt(dx * dx + dy * dy)
            deg = atan2_f32(dy, dx) * np.float32(180.0 / np.pi)
            ori_norm = jnp.mod(deg + F32(360.0), F32(360.0)) - orientation

            bin_step = np.float32(np.float32(n_bins) / np.float32(360.0))
            rb = row_bin - F32(0.5)
            cb = col_bin - F32(0.5)
            m = jnp.where(ok, mag * weights, F32(0.0))
            obin = ori_norm * bin_step
            rfl = jnp.floor(rb)
            cfl = jnp.floor(cb)
            ofl = jnp.floor(obin)
            rfr = jnp.where(ok, rb - rfl, F32(0.0))
            cfr = jnp.where(ok, cb - cfl, F32(0.0))
            ofr = jnp.where(ok, obin - ofl, F32(0.0))
            # clip to side-2 == n_hist (matches ops.descriptor; masked lanes
            # may hold wild bins, contributions there are zero)
            r1 = jnp.clip(jnp.where(ok, rfl, F32(0.0)).astype(jnp.int32) + 1,
                          0, n_hist)
            c1 = jnp.clip(jnp.where(ok, cfl, F32(0.0)).astype(jnp.int32) + 1,
                          0, n_hist)
            of = jnp.where(ok, ofl, F32(0.0)).astype(jnp.int32)
            of = jnp.where(of < 0, of + n_bins, of)
            of = jnp.where(of >= n_bins, of - n_bins, of)
            of = jnp.clip(of, 0, n_bins - 1)
            of1 = jnp.where(of + 1 >= n_bins, 0, of + 1)

            planes = [m * (F32(1.0) - ofr) * (of == o).astype(F32)
                      + m * ofr * (of1 == o).astype(F32)
                      for o in range(n_bins)]
            u_r = [(F32(1.0) - rfr) * (r1 == r).astype(F32)
                   + rfr * (r1 == r - 1).astype(F32)
                   for r in range(1, n_hist + 1)]
            u_c = [(F32(1.0) - cfr) * (c1 == c).astype(F32)
                   + cfr * (c1 == c - 1).astype(F32)
                   for c in range(1, n_hist + 1)]

            sums = []
            for r in range(n_hist):
                for c in range(n_hist):
                    wrc = u_r[r] * u_c[c]
                    for o in range(n_bins):
                        sums.append(jnp.sum(wrc * planes[o]).reshape(1, 1))
            row = jnp.concatenate(sums, axis=1)   # (1, 128)
            hist_ref[pl.ds(k, 1), :] = row

    @pl.when(base >= count_ref[0])
    def _():
        hist_ref[:, :] = jnp.zeros((BK, n_hist * n_hist * n_bins), F32)


@functools.partial(jax.jit, static_argnums=(7, 8, 9, 10, 11, 12))
def descriptor_hist_pallas(gauss_padded, s, xi, yi, kp_scale, angle, count,
                           h: int, w: int, pad: int,
                           cfg: SiftConfig = DEFAULT_CONFIG,
                           interpret: bool = False,
                           r_max: int = R_DESC_MAX):
    """Raw descriptor histograms via the Pallas kernel.

    gauss_padded: (S+3, H+2P, W+2P) f32 with P >= r_max+1.
    s: (M,) int32 scale index; xi/yi: (M,) int32 rust_round'ed keypoint
    pixel coords; kp_scale/angle: (M,) f32; count: int32 valid prefix
    length. Every keypoint's dynamic radius round(10.6066*kp_scale) must be
    <= r_max (guaranteed per scale bucket, see BUCKET_R). Returns (M, 128)
    f32 raw histograms (finalize separately)."""
    M = s.shape[0]
    BK = BK_INTERPRET if interpret else globals()["BK"]
    al = 16 if gauss_padded.dtype == jnp.bfloat16 else 8
    nb = -(-M // BK)
    padn = nb * BK - M

    def pad1(a):
        return jnp.pad(a, (0, padn))

    D = cfg.descriptor_size

    kernel = functools.partial(
        _kernel, n_hist=cfg.descriptor_n_histograms,
        n_bins=cfg.descriptor_n_bins, lambda_descr=cfg.lambda_descr,
        h=h, w=w, pad=pad, w_pad=gauss_padded.shape[2], r_max=r_max, BK=BK,
        al=al)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,   # count, s, y, x
        grid=(nb,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),   # kp_scale (nb,BK)
                  pl.BlockSpec(memory_space=pltpu.VMEM),   # angle (nb,BK)
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((BK, D), lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, _subl(2 * r_max + 3, al), LANES_DMA),
                       gauss_padded.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )

    hist = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb * BK, D), jnp.float32),
        interpret=interpret,
    )(jnp.asarray(count, jnp.int32).reshape(1),
      pad1(jnp.clip(s, 0, gauss_padded.shape[0] - 1)).astype(jnp.int32),
      pad1(jnp.clip(yi, 0, h - 1)).astype(jnp.int32),
      pad1(jnp.clip(xi, 0, w - 1)).astype(jnp.int32),
      pad1(kp_scale).reshape(nb, BK), pad1(angle).reshape(nb, BK),
      gauss_padded)
    return hist[:M]


def descriptor_hist_bucketed(gauss_padded, s_img, s_level, xi, yi, kp_scale,
                             angle, count, h: int, w: int, pad: int,
                             cfg: SiftConfig = DEFAULT_CONFIG,
                             interpret: bool = False, live=None,
                             chunk: int = 32768):
    """Scale-bucketed descriptor histograms: partitions the (compacted)
    keypoint batch by integer scale index and runs a right-sized kernel per
    bucket (BUCKET_R), then restores the original row order. Exactly equal
    to descriptor_hist_pallas(r_max=R_DESC_MAX) — the per-sample math is
    identical, only dead window area is trimmed.

    s_img: (M,) int32 Gaussian image index to sample (slot in gauss_padded);
    s_level: (M,) int32 raw scale index in [1, 3] — the bucket key that
    bounds kp_scale (s_img may be slot-offset, e.g. fused-pyramid layout).
    live: optional (M,) bool validity mask replacing the default
    lane < count prefix (used when several frames' prefix-valid buffers are
    concatenated)."""
    from .descriptor_packed import descriptor_hist_packed

    M = s_img.shape[0]
    if live is None:
        live = jnp.arange(M, dtype=jnp.int32) < count
    out = jnp.zeros((M, cfg.descriptor_size), F32)
    # scalar-prefetch operands live in SMEM: chunk huge batched keypoint
    # sets into <=32k-lane kernel calls (chunks are 128-multiples, so block
    # boundaries — and therefore packing groups — are unchanged: results
    # stay bit-identical to the unchunked call)
    CHUNK = chunk
    for si, r_max in bucket_radii(cfg).items():
        maskb = live & (s_level == si)
        idxb, validb, countb = compact_indices(maskb, M)
        # wide (256-lane, p=2) packing covers wn <= 129: with the default
        # config EVERY bucket packs (s=3/wn=79 previously fell back to the
        # per-keypoint kernel and dominated the stage, round-4 breakdown)
        packed = (cfg.window_kernel == "packed"
                  and 2 * r_max + 3 <= LANES_DMA - 127)
        fn = (descriptor_hist_packed if packed else descriptor_hist_pallas)

        def run(sl):
            cnt = jnp.clip(countb - sl.start, 0, sl.stop - sl.start)
            return fn(gauss_padded, s_img[idxb[sl]], xi[idxb[sl]],
                      yi[idxb[sl]], kp_scale[idxb[sl]], angle[idxb[sl]],
                      cnt, h, w, pad, cfg, interpret, r_max)

        if M <= CHUNK:
            hb = run(slice(0, M))
        else:
            hb = jnp.concatenate(
                [run(slice(c0, min(c0 + CHUNK, M)))
                 for c0 in range(0, M, CHUNK)], axis=0)
        # rank of each original lane inside its bucket
        rank = jnp.cumsum(maskb.astype(jnp.int32)) - 1
        out = jnp.where(maskb[:, None], jnp.take(hb, rank, axis=0), out)
    return out


def descriptor_hist_masked(gauss_padded, s_img, s_level, xi, yi, kp_scale,
                           angle, h: int, w: int, pad: int,
                           cfg: SiftConfig = DEFAULT_CONFIG,
                           interpret: bool = False, live=None,
                           count=None, chunk: int = 32768):
    """Mask-dispatched scale-bucketed descriptor histograms (round 5).

    Bit-equal outputs to descriptor_hist_bucketed with the per-bucket
    compaction + rank/take/where restore machinery removed: each bucket's
    packed kernel runs over the full lane range with a per-lane live flag
    (live & s_level == si), skipping dead lanes' DMAs and dead group spans
    (emissions arrive scan-ordered per frame, so bucket membership is
    near-contiguous). Bucket outputs have disjoint non-zero rows and merge
    by addition (exact). Measured motivation: the wrapper machinery cost
    ~40 of the stage's 80.4 ms/batch at octave-0 bench density
    (tools/window_breakdown.py, round 5).

    Falls back to descriptor_hist_bucketed when a bucket cannot pack or
    cfg.window_kernel != "packed"."""
    from .descriptor_packed import descriptor_hist_packed_masked

    radii = bucket_radii(cfg)
    if (cfg.window_kernel != "packed"
            or any(2 * r + 3 > LANES_DMA - 127 for r in radii.values())):
        return descriptor_hist_bucketed(
            gauss_padded, s_img, s_level, xi, yi, kp_scale, angle, count,
            h, w, pad, cfg, interpret, live=live, chunk=chunk)

    M = s_img.shape[0]
    if live is None:
        live = jnp.arange(M, dtype=jnp.int32) < count
    out = jnp.zeros((M, cfg.descriptor_size), F32)
    CHUNK = chunk
    for si, r_max in radii.items():
        live_b = live & (s_level == si)

        def run(sl):
            return descriptor_hist_packed_masked(
                gauss_padded, s_img[sl], xi[sl], yi[sl], kp_scale[sl],
                angle[sl], live_b[sl], h, w, pad, cfg, interpret, r_max)

        sls = [slice(c0, min(c0 + CHUNK, M)) for c0 in range(0, M, CHUNK)]
        parts = [run(sl) for sl in sls]
        hb = (parts[0] if len(parts) == 1
              else jnp.concatenate(parts, axis=0))
        out = out + hb
    return out
