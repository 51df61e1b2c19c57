"""Pallas TPU kernel: LANE-PACKED 36-bin orientation histograms.

The per-keypoint kernel (orientation_kernel.py) computes each candidate's
window math on (n, n) arrays whose lane dimension occupies only 21-33 of a
vector register's 128 lanes — 75-84% of every VPU op is spent on dead lanes,
and the 36 masked bin reductions per candidate dominate the stage
(VERDICT r2: orientation +29 ms/frame). Here p = 128//wn whole windows are
packed SIDE-BY-SIDE in the 128-lane registers (p = 5/4/3 for the s=1/2/3
scale buckets), so one elementwise pass and one 36-bin reduction pass serve
p candidates:

  1. per group of p candidates, the p window supersets are DMA'd exactly as
     before (double-buffered, two 128-lane halves with the second fetched
     only when needed), then rolled into a packed (subl, 128) array with
     window j at lane offset j*stride;
  2. per-candidate f32 params (sigma/radius/weight-scale) are computed ONCE
     per block on the (1, BK) param row and turned into per-LANE vectors by
     masked lane reductions — no vector->scalar round-trips anywhere;
  3. gradients/magnitudes/bins run once on the packed array (element-wise
     bit-identical to the per-keypoint kernel: same f32 ops per pixel);
  4. the bin loop does 36 sublane reductions into an H (36, 128) row stack;
     each candidate's histogram column is then extracted by rolling its lane
     group to lane 0 BEFORE the lane reduction, so the reduction tree pairs
     values exactly like the per-keypoint kernel's (window at lane 0) and
     the results stay bit-identical;
  5. histograms accumulate into a TRANSPOSED (36, BK) output block (the
     (36,1) reduction columns broadcast over lanes; a row-major output would
     need an in-kernel transpose, which Mosaic lowers poorly). The wrapper
     transposes back in XLA.

Reference math: gradient_direction_histogram (lib.rs:655-757); numerics
identical to orientation_kernel._kernel (which is the tested bit-exact
Pallas<->XLA implementation, tools/parity_pallas.py).
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
from .descriptor_packed import pack_p
from .orientation_kernel import _subl, _smooth

F32 = jnp.float32
I32 = jnp.int32
LANES = 128
LANES_DMA = 256
# Candidates per grid block (output lane width). Grid-step overhead on this
# backend is ~5-10 us/step (round-4 window breakdown: dead-capacity grids
# cost ms at bench density), so hardware blocks are wide; interpret-mode
# tests keep the round-3 width for compile tractability.
BK = 512
BK_INTERPRET = 128
# In-kernel peak-slot capacity: angles for the first N_PEAKS_CAP emitted
# bins per candidate ride out with the histogram; the driver falls back to
# the XLA peaks path (lax.cond) iff any candidate emits more (a histogram
# can emit up to n_bins//2 = 18 in theory; >2 is already rare).
N_PEAKS_CAP = 4


def _pack_layout(r_max: int):
    """Static lane layout: p windows of wn = 2*r_max+3 lanes at stride
    128//p (the kernel rebuilds the per-lane vectors from iota)."""
    p = pack_p(r_max)
    return p, LANES // p


def _kernel(*refs, n_bins, lambda_ori, localmax_ratio,
            h, w, pad, w_pad, r_max, p, stride, BK, kpad, al=8,
            masked=False):
    """masked=False: liveness is the `count` prefix (compacted-input mode,
    the original contract). masked=True: refs carry (live, glo, ghi) scalar
    prefetches instead of count — liveness is an arbitrary per-lane flag,
    the group loop runs only the [glo[blk], ghi[blk]) span, and dead lanes'
    window DMAs are skipped. Per-candidate math and reduction trees are
    identical in both modes (results are packing-composition-invariant, see
    module docstring), so outputs are byte-equal for the same live set."""
    if masked:
        (live_ref, glo_ref, ghi_ref, s_ref, y_ref, x_ref,
         scale_blk, gauss_hbm, hist_ref, peaks_ref, win_ref, sem) = refs
    else:
        (count_ref, s_ref, y_ref, x_ref,
         scale_blk, gauss_hbm, hist_ref, peaks_ref, win_ref, sem) = refs
    blk = pl.program_id(0)
    base = blk * BK

    def cand(g, j):
        # the final group of a block can read past BK when BK % p != 0:
        # clamp the prefetch index (the lane == g*p+j output select already
        # discards those candidates' results)
        return jnp.minimum(base + g * p + j, kpad - 1)
    wn = 2 * r_max + 3
    subl = _subl(wn, al)
    n = wn - 2
    n_groups = -(-BK // p)

    # static per-lane layout vectors (built from iota: pallas kernels cannot
    # capture array constants); lane indexes the 128-lane WINDOW registers,
    # lane_bk the BK-lane param/output rows (distinct once BK > 128)
    lane = jax.lax.broadcasted_iota(I32, (1, LANES), 1)
    lane_bk = jax.lax.broadcasted_iota(I32, (1, BK), 1)
    grp_l = lane // stride
    m_l = lane - grp_l * stride
    colvalid_l = ((grp_l < p) & (m_l >= 1) & (m_l <= wn - 2))
    dxx_l = jnp.where(colvalid_l, m_l - 1 - r_max, jnp.int32(10 ** 6))
    dyy_c = (jax.lax.broadcasted_iota(I32, (n, 1), 0) - r_max)
    d2 = (dyy_c * dyy_c + dxx_l * dxx_l).astype(F32)        # (n, 128)

    # per-block param vectors: one vector pass for all BK candidates
    scale_row = scale_blk[pl.ds(blk, 1), :]                 # (1, BK)
    sigma_row = F32(lambda_ori) * scale_row
    radius_row = round_half_away(F32(3.0) * F32(lambda_ori) * scale_row)
    gws_row = F32(-1.0) / (F32(2.0) * sigma_row * sigma_row)

    def start_y(i):
        return y_ref[i] + pad - r_max - 1

    def start_x(i):
        return x_ref[i] + pad - r_max - 1

    def copies(slot, g, j):
        i = cand(g, j)
        ys_al = pl.multiple_of((start_y(i) // al) * al, al)
        xs = start_x(i)
        xs_al = pl.multiple_of(
            jnp.minimum((xs // 128) * 128, w_pad - LANES_DMA), 128)
        need2 = (xs - xs_al) + wn > LANES
        dst0 = j * LANES_DMA
        c1 = pltpu.make_async_copy(
            gauss_hbm.at[s_ref[i], pl.ds(ys_al, subl), pl.ds(xs_al, LANES)],
            win_ref.at[pl.ds(slot * subl, subl), dst0:dst0 + LANES],
            sem.at[slot, j, 0])
        c2 = pltpu.make_async_copy(
            gauss_hbm.at[s_ref[i], pl.ds(ys_al, subl),
                         pl.ds(xs_al + LANES, LANES)],
            win_ref.at[pl.ds(slot * subl, subl), dst0 + LANES:dst0 + LANES_DMA],
            sem.at[slot, j, 1])
        return c1, c2, need2

    def is_live(g, j):
        if masked:
            return live_ref[cand(g, j)] > 0
        return base + g * p + j < count

    def dma_start_group(slot, g):
        for j in range(p):
            c1, c2, need2 = copies(slot, g, j)
            if masked:
                # dead lanes (other buckets / invalid) skip their DMA
                @pl.when(is_live(g, j))
                def _(c1=c1, c2=c2, need2=need2):
                    c1.start()

                    @pl.when(need2)
                    def _():
                        c2.start()
            else:
                c1.start()

                @pl.when(need2)
                def _():
                    c2.start()

    def dma_wait_group(slot, g):
        for j in range(p):
            c1, c2, need2 = copies(slot, g, j)
            if masked:
                @pl.when(is_live(g, j))
                def _(c1=c1, c2=c2, need2=need2):
                    c1.wait()

                    @pl.when(need2)
                    def _():
                        c2.wait()
            else:
                c1.wait()

                @pl.when(need2)
                def _():
                    c2.wait()

    if masked:
        lo = glo_ref[blk]
        hi = ghi_ref[blk]
    else:
        count = count_ref[0]
        # groups with at least one live candidate (tail lanes masked
        # in-kernel)
        lo = jnp.int32(0)
        hi = jnp.clip(-(-(count - base) // p), 0, n_groups)

    def compute_group(slot, g, O):
        # pack the p windows: window j rolled so its top-left lands at
        # sublane 0 / lane j*stride
        packed = jnp.zeros((subl, LANES), F32)
        radius_v = jnp.zeros((1, LANES), F32)
        gws_v = jnp.zeros((1, LANES), F32)
        yi_v = jnp.zeros((1, LANES), I32)
        xi_v = jnp.zeros((1, LANES), I32)
        live_v = jnp.zeros((1, LANES), jnp.bool_)
        win_all = win_ref[pl.ds(slot * subl, subl), :].astype(F32)
        for j in range(p):
            i = cand(g, j)
            gm = grp_l == j
            ys = start_y(i)
            xs = start_x(i)
            ro = ys - (ys // al) * al
            co = xs - jnp.minimum((xs // 128) * 128, w_pad - LANES_DMA)
            wj = win_all[:, j * LANES_DMA:(j + 1) * LANES_DMA]
            wj = pltpu.roll(wj, jax.lax.rem(subl - ro, jnp.int32(subl)),
                            axis=0)
            wj = pltpu.roll(
                wj, jax.lax.rem(LANES_DMA - co + j * stride,
                                jnp.int32(LANES_DMA)), axis=1)
            packed = packed + jnp.where(gm, wj[:, 0:LANES], F32(0.0))
            # per-candidate params -> per-lane vectors (masked lane reduce
            # of the block param rows; all vector ops, no scalar sync)
            li = g * p + j
            sel = (lane_bk == li)
            radius_v = radius_v + jnp.where(
                gm, jnp.sum(jnp.where(sel, radius_row, F32(0.0)),
                            axis=1, keepdims=True), F32(0.0))
            gws_v = gws_v + jnp.where(
                gm, jnp.sum(jnp.where(sel, gws_row, F32(0.0)),
                            axis=1, keepdims=True), F32(0.0))
            yi_v = yi_v + jnp.where(gm, y_ref[i], 0)
            xi_v = xi_v + jnp.where(gm, x_ref[i], 0)
            live_v = live_v | (gm & is_live(g, j))

        # gradients at window centers (rows 1..n, cols 1..wn-2):
        # gx[q] = win[q+1] - win[q-1] via +-1 lane rolls (garbage crossing
        # group boundaries is masked by colvalid)
        rows_c = packed[1:1 + n, :]
        gx = (pltpu.roll(rows_c, LANES - 1, axis=1)
              - pltpu.roll(rows_c, 1, axis=1))
        gy = packed[0:n, :] - packed[2:2 + n, :]

        y_img = yi_v + dyy_c                                 # (n, 128)
        x_img = xi_v + dxx_l
        ok = ((jnp.abs(dyy_c).astype(F32) <= radius_v)
              & (jnp.abs(dxx_l).astype(F32) <= radius_v)
              & (y_img >= 1) & (y_img <= h - 2)
              & (x_img >= 1) & (x_img <= w - 2)
              & colvalid_l & live_v)

        weights = jnp.exp(d2 * gws_v)
        mags = jnp.sqrt(gx * gx + gy * gy)
        oris = atan2_f32(gy, gx)
        bstep = np.float32(n_bins) / (np.float32(np.pi) * np.float32(2.0))
        b = round_half_away(bstep * oris).astype(I32)
        b = jnp.where(b >= n_bins, b - n_bins, b)
        b = jnp.where(b < 0, b + n_bins, b)
        contrib = jnp.where(ok, weights * mags, F32(0.0))

        rows = [jnp.sum(jnp.where(b == bi, contrib, F32(0.0)),
                        axis=0, keepdims=True) for bi in range(n_bins)]
        H = jnp.concatenate(rows, axis=0)                    # (36, 128)

        for j in range(p):
            # roll group j's lanes to lane 0 before reducing: the lane tree
            # then pairs values exactly like the per-keypoint kernel's
            # window-at-lane-0 reduction (bit-identical sums)
            Hj = jnp.where(grp_l == j, H, F32(0.0))
            if j:
                Hj = pltpu.roll(Hj, LANES - j * stride, axis=1)
            col = jnp.sum(Hj, axis=1, keepdims=True)         # (36, 1)
            O = O + jnp.where(lane_bk == g * p + j, col, F32(0.0))
        return O

    @pl.when(hi > lo)
    def _():
        dma_start_group(0, lo)

    def body(t, O):
        g0 = lo + 2 * t
        g1 = g0 + 1

        @pl.when(g1 < hi)
        def _():
            dma_start_group(1, g1)

        dma_wait_group(0, g0)
        O = compute_group(0, g0, O)

        @pl.when(g1 + 1 < hi)
        def _():
            dma_start_group(0, g1 + 1)

        @pl.when(g1 < hi)
        def _():
            dma_wait_group(1, g1)

        # dead groups' stale windows produce masked-zero contributions
        O = jnp.where(g1 < hi, compute_group(1, g1, O), O)
        return O

    O = jax.lax.fori_loop(0, -(-(hi - lo) // 2),
                          body, jnp.zeros((n_bins, BK), F32))
    hist_ref[:, :] = O

    # ---- in-kernel smoothing + peak extraction (round 4) ----
    # The raw histogram rows are already resident: smoothing + the
    # reference's local-max scan (lib.rs:394-431) are ~20 (1, BK) vector
    # ops per bin here, vs ~10 full (K, 36) XLA passes in the driver
    # (measured 21.5 ms/batch at bench density). Op-for-op identical f32
    # math to ops.orientation.orientation_peaks on the XLA-_smooth'd
    # histogram (all elementwise; max is order-free), so the driver's
    # rare-overflow fallback path emits byte-identical results.
    raw = [O[k:k + 1, :] for k in range(n_bins)]
    sm = [(raw[k - 2] + raw[(k + 2) % n_bins]) * F32(1.0 / 16.0)
          + (raw[k - 1] + raw[(k + 1) % n_bins]) * F32(4.0 / 16.0)
          + raw[k] * F32(6.0) / F32(16.0)
          for k in range(n_bins)]
    hmax = functools.reduce(jnp.maximum, sm)
    thr = hmax * F32(localmax_ratio)
    binw = np.float32(360.0) / np.float32(n_bins)
    cnt = jnp.zeros((1, BK), I32)
    ang = [jnp.zeros((1, BK), F32) for _ in range(N_PEAKS_CAP)]
    for k in range(n_bins):
        hm = sm[k - 1]
        hp = sm[(k + 1) % n_bins]
        emit_k = (sm[k] > hm) & (sm[k] > hp) & (sm[k] >= thr)
        interp = (hm - hp) / (hm - F32(2.0) * sm[k] + hp)
        bin_f = F32(float(k)) + F32(0.5) * interp
        bin_f = jnp.where(bin_f < 0, F32(n_bins) + bin_f,
                          jnp.where(bin_f >= n_bins,
                                    bin_f - F32(n_bins), bin_f))
        a_k = F32(360.0) - binw * bin_f
        cnt = cnt + emit_k.astype(I32)
        for t in range(N_PEAKS_CAP):
            ang[t] = ang[t] + jnp.where(emit_k & (cnt == t + 1), a_k,
                                        F32(0.0))
    peaks_ref[:, :] = jnp.concatenate(
        ang + [cnt.astype(F32)] * (8 - N_PEAKS_CAP), axis=0)


@functools.partial(jax.jit, static_argnums=(6, 7, 8, 9, 10, 11, 12, 13))
def orientation_histograms_packed(gauss_padded, s, y, x, kp_scale, count,
                                  h: int, w: int, pad: int,
                                  cfg: SiftConfig = DEFAULT_CONFIG,
                                  interpret: bool = False,
                                  r_max: int = 16,
                                  smooth: bool = True,
                                  with_peaks: bool = False):
    """Lane-packed orientation histograms: same contract and bit-identical
    results as orientation_kernel.orientation_histograms_pallas, ~p x less
    VPU work per candidate (p = 128 // (2*r_max+3)).

    with_peaks: additionally return (angles_p (K, N_PEAKS_CAP) f32,
    n_peaks (K,) int32) — the in-kernel smoothed-histogram peak angles
    (first N_PEAKS_CAP emitted bins, ascending) and the TOTAL emit count
    (uncapped, so callers can detect slot overflow)."""
    K = s.shape[0]
    al = 16 if gauss_padded.dtype == jnp.bfloat16 else 8
    bk = BK_INTERPRET if interpret else BK
    nb = -(-K // bk)
    padn = nb * bk - K

    def pad1(a):
        return jnp.pad(a, (0, padn))

    n_bins = cfg.n_orientation_bins
    p, stride = _pack_layout(r_max)

    kernel = functools.partial(
        _kernel, n_bins=n_bins, lambda_ori=cfg.lambda_ori,
        localmax_ratio=cfg.orientation_localmax_ratio,
        h=h, w=w, pad=pad, w_pad=gauss_padded.shape[2], r_max=r_max,
        p=p, stride=stride, BK=bk, kpad=nb * bk, al=al)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,   # count, s, y, x
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # kp_scale (nb, BK)
            pl.BlockSpec(memory_space=pl.ANY),       # gauss stack (HBM)
        ],
        out_specs=[
            pl.BlockSpec((n_bins, bk), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, bk), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2 * _subl(2 * r_max + 3, al), p * LANES_DMA),
                       gauss_padded.dtype),
            pltpu.SemaphoreType.DMA((2, p, 2)),
        ],
    )

    hist_t, peaks_t = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((n_bins, nb * bk), jnp.float32),
                   jax.ShapeDtypeStruct((8, nb * bk), jnp.float32)],
        interpret=interpret,
    )(jnp.asarray(count, jnp.int32).reshape(1),
      pad1(jnp.clip(s, 0, gauss_padded.shape[0] - 1)).astype(jnp.int32),
      pad1(jnp.clip(y, 0, h - 1)).astype(jnp.int32),
      pad1(jnp.clip(x, 0, w - 1)).astype(jnp.int32),
      pad1(kp_scale).reshape(nb, bk),
      gauss_padded)

    raw = hist_t.T[:K]
    out = _smooth(raw) if smooth else raw
    if not with_peaks:
        return out
    angles_p = peaks_t[:N_PEAKS_CAP].T[:K]                   # (K, PK)
    n_peaks = peaks_t[N_PEAKS_CAP].astype(jnp.int32)[:K]     # (K,)
    return out, angles_p, n_peaks


@functools.partial(jax.jit, static_argnums=(6, 7, 8, 9, 10, 11, 12, 13))
def orientation_histograms_packed_masked(gauss_padded, s, y, x, kp_scale,
                                         live, h: int, w: int, pad: int,
                                         cfg: SiftConfig = DEFAULT_CONFIG,
                                         interpret: bool = False,
                                         r_max: int = 16,
                                         smooth: bool = True,
                                         with_peaks: bool = False):
    """orientation_histograms_packed with ARBITRARY per-lane liveness
    instead of a compacted count prefix (round 5: the bucketed wrapper's
    compaction + rank/take/where restore machinery measured ~32 ms/batch of
    pure XLA overhead at bench density — 75% of the stage). live: (K,) bool;
    dead lanes skip their window DMA, blocks run only their live group span
    (per-block [glo, ghi) computed here), and dead lanes' outputs are zero.
    Per-candidate results are byte-equal to the compacted path's (packing
    composition does not affect per-candidate sums — module docstring)."""
    K = s.shape[0]
    al = 16 if gauss_padded.dtype == jnp.bfloat16 else 8
    bk = BK_INTERPRET if interpret else BK
    nb = -(-K // bk)
    padn = nb * bk - K

    def pad1(a):
        return jnp.pad(a, (0, padn))

    n_bins = cfg.n_orientation_bins
    p, stride = _pack_layout(r_max)
    n_groups = -(-bk // p)

    livei = pad1(jnp.asarray(live, jnp.int32))
    g_of_lane = (jnp.arange(bk, dtype=I32) // p)[None, :]       # (1, bk)
    lv2 = livei.reshape(nb, bk)
    glo = jnp.min(jnp.where(lv2 > 0, g_of_lane, n_groups), axis=1)
    ghi = jnp.max(jnp.where(lv2 > 0, g_of_lane + 1, 0), axis=1)
    glo = jnp.minimum(glo, ghi)                                  # empty: 0,0

    kernel = functools.partial(
        _kernel, n_bins=n_bins, lambda_ori=cfg.lambda_ori,
        localmax_ratio=cfg.orientation_localmax_ratio,
        h=h, w=w, pad=pad, w_pad=gauss_padded.shape[2], r_max=r_max,
        p=p, stride=stride, BK=bk, kpad=nb * bk, al=al, masked=True)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,   # live, glo, ghi, s, y, x
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # kp_scale (nb, BK)
            pl.BlockSpec(memory_space=pl.ANY),       # gauss stack (HBM)
        ],
        out_specs=[
            pl.BlockSpec((n_bins, bk), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, bk), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2 * _subl(2 * r_max + 3, al), p * LANES_DMA),
                       gauss_padded.dtype),
            pltpu.SemaphoreType.DMA((2, p, 2)),
        ],
    )

    hist_t, peaks_t = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((n_bins, nb * bk), jnp.float32),
                   jax.ShapeDtypeStruct((8, nb * bk), jnp.float32)],
        interpret=interpret,
    )(livei,
      glo.astype(jnp.int32), ghi.astype(jnp.int32),
      pad1(jnp.clip(s, 0, gauss_padded.shape[0] - 1)).astype(jnp.int32),
      pad1(jnp.clip(y, 0, h - 1)).astype(jnp.int32),
      pad1(jnp.clip(x, 0, w - 1)).astype(jnp.int32),
      pad1(kp_scale).reshape(nb, bk),
      gauss_padded)

    raw = hist_t.T[:K]
    out = _smooth(raw) if smooth else raw
    if not with_peaks:
        return out
    angles_p = peaks_t[:N_PEAKS_CAP].T[:K]                   # (K, PK)
    n_peaks = peaks_t[N_PEAKS_CAP].astype(jnp.int32)[:K]     # (K,)
    return out, angles_p, n_peaks
