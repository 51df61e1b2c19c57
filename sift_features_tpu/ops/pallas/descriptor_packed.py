"""Pallas TPU kernel: LANE-PACKED 128-bin SIFT descriptor histograms.

Same packing strategy as orientation_packed.py applied to the descriptor
window kernel (descriptor_kernel.py): p = 128//wn whole keypoint windows
ride side-by-side in the 128-lane registers, so the elementwise
rotate/trilinear math and the 128 masked bin reductions each serve p
keypoints per pass. For the default config the s=1/2 scale buckets pack
p = 2 (wn = 51/63 <= 64); the s=3 bucket (wn = 79) stays on the
per-keypoint kernel — descriptor_hist_bucketed dispatches per bucket.

Layout/numerics notes (see orientation_packed.py for the full story):
  - per-keypoint f32 params (hist_width, radius, rotated-frame sin/cos) are
    computed once per block on the (1, BK) param rows and selected into
    per-lane vectors by masked lane reductions — no vector->scalar syncs;
  - per-pixel math is op-for-op identical to descriptor_kernel._kernel;
  - each bin's sublane reduction produces a (1, 128) packed row; the
    (128, 128) row stack H is reduced per keypoint by rolling its lane
    group to lane 0 first, so the lane-reduction tree pairs values exactly
    like the per-keypoint kernel's window-at-lane-0 reduction;
  - the output block is TRANSPOSED (D, BK); the wrapper transposes back.

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
from ..descriptor import DEG2RAD_F32
from .descriptor_kernel import _subl

F32 = jnp.float32
I32 = jnp.int32
LANES = 128
LANES_DMA = 256
# Keypoints per grid block (output lane width): wide on hardware to cut
# grid-step overhead (see orientation_packed.py), round-3 width under
# interpret for test compile tractability.
BK = 512
BK_INTERPRET = 128


def pack_p(r_max: int) -> int:
    """Windows per 128-lane register for this bucket radius."""
    return LANES // (2 * r_max + 3)


def pack_layout(r_max: int):
    """(p, lanes_p, stride) for this bucket radius: p windows per lanes_p
    packed lanes. Buckets whose window fits twice in 128 lanes pack within
    one register row (lanes_p = 128); wider windows (wn <= 129) pack across
    a 256-lane double register — the elementwise math runs at 2x register
    width serving p keypoints, and the 128 bin reductions amortize over all
    of them.

    Round 5: the 256-lane register is also used whenever it packs STRICTLY
    more keypoints per lane than two 128-lane rows would — the default
    config's s=1 bucket (wn = 51) packs 5/256 instead of 2/128 (lane
    utilization 99.6% vs 80%), and s=3 (wn = 79) packs 3/256 instead of
    2/256. Byte-exactness is preserved for any (p, lanes_p, stride): each
    window is rolled to its lane-group start before the reduction, and the
    lanes beyond the window hold exact zeros, so the f32 reduction tree
    pairs the window's values identically to the per-keypoint kernel
    (verified by the packed==per-keypoint equality tests)."""
    wn = 2 * r_max + 3
    p1 = LANES // wn
    p2 = LANES_DMA // wn
    if p2 > 2 * p1:
        # 256-lane pack is strictly denser per lane
        return p2, LANES_DMA, LANES_DMA // p2
    if p1 >= 2:
        return p1, LANES, LANES // p1
    assert wn <= LANES_DMA - 127, (
        f"window {wn} cannot shift-align inside a {LANES_DMA}-lane DMA")
    return 2, 2 * LANES, LANES


def _kernel(*refs, n_hist, n_bins, lambda_descr, h, w, pad, w_pad, r_max,
            p, stride, BK, kpad, al=8, lanes_p=LANES, masked=False):
    """masked=False: liveness is the `count` prefix (compacted-input mode).
    masked=True: refs carry (live, glo, ghi) scalar prefetches instead of
    count — per-lane liveness, [glo, ghi) group spans per block, dead-lane
    DMA skip (see orientation_packed._kernel; same scheme, byte-equal
    per-keypoint results)."""
    if masked:
        (live_ref, glo_ref, ghi_ref, s_ref, y_ref, x_ref,
         scale_blk, angle_blk, gauss_hbm, hist_ref, win_ref, sem) = refs
    else:
        (count_ref, s_ref, y_ref, x_ref,
         scale_blk, angle_blk, gauss_hbm, hist_ref, win_ref, sem) = refs
    blk = pl.program_id(0)
    base = blk * BK
    wn = 2 * r_max + 3
    subl = _subl(wn, al)
    n = wn - 2
    n_groups = -(-BK // p)
    D = n_hist * n_hist * n_bins

    def cand(g, j):
        return jnp.minimum(base + g * p + j, kpad - 1)

    # static per-lane layout vectors (iota-built: no captured constants);
    # lane indexes the 128-lane WINDOW registers, lane_bk the BK-lane
    # param/output rows (distinct once BK > 128)
    lane = jax.lax.broadcasted_iota(I32, (1, lanes_p), 1)
    lane_bk = jax.lax.broadcasted_iota(I32, (1, BK), 1)
    grp_l = lane // stride
    m_l = lane - grp_l * stride
    colvalid_l = ((grp_l < p) & (m_l >= 1) & (m_l <= wn - 2))
    dxx_l = jnp.where(colvalid_l, m_l - 1 - r_max, jnp.int32(10 ** 6))
    dyy_c = (jax.lax.broadcasted_iota(I32, (n, 1), 0) - r_max)
    dyf_c = dyy_c.astype(F32)
    dxf_l = dxx_l.astype(F32)

    # per-block param vectors (one vector pass for all BK keypoints);
    # identical f32 op order to the per-keypoint kernel's scalar math
    scale_row = scale_blk[pl.ds(blk, 1), :]                 # (1, BK)
    angle_row = angle_blk[pl.ds(blk, 1), :]
    orientation_row = F32(360.0) - angle_row
    hw_row = F32(lambda_descr) * scale_row
    radius_row = round_half_away(
        hw_row * np.float32(np.sqrt(np.float32(2.0)))
        * F32(n_hist + 1) * F32(0.5))
    ori_rad_row = orientation_row * DEG2RAD_F32
    sin_row = jnp.sin(ori_rad_row) / hw_row
    cos_row = jnp.cos(ori_rad_row) / hw_row

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
        lo = jnp.int32(0)
        hi = jnp.clip(-(-(count - base) // p), 0, n_groups)

    def compute_group(slot, g, O):
        packed = jnp.zeros((subl, lanes_p), F32)
        radius_v = jnp.zeros((1, lanes_p), F32)
        sin_v = jnp.zeros((1, lanes_p), F32)
        cos_v = jnp.zeros((1, lanes_p), F32)
        ori_v = jnp.zeros((1, lanes_p), F32)
        yi_v = jnp.zeros((1, lanes_p), I32)
        xi_v = jnp.zeros((1, lanes_p), I32)
        live_v = jnp.zeros((1, lanes_p), jnp.bool_)
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
            packed = packed + jnp.where(gm, wj[:, 0:lanes_p], F32(0.0))

            li = g * p + j
            sel = (lane_bk == li)

            def pick(row):
                return jnp.sum(jnp.where(sel, row, F32(0.0)),
                               axis=1, keepdims=True)

            radius_v = radius_v + jnp.where(gm, pick(radius_row), F32(0.0))
            sin_v = sin_v + jnp.where(gm, pick(sin_row), F32(0.0))
            cos_v = cos_v + jnp.where(gm, pick(cos_row), F32(0.0))
            ori_v = ori_v + jnp.where(gm, pick(orientation_row), F32(0.0))
            yi_v = yi_v + jnp.where(gm, y_ref[i], 0)
            xi_v = xi_v + jnp.where(gm, x_ref[i], 0)
            live_v = live_v | (gm & is_live(g, j))

        rows_c = packed[1:1 + n, :]
        gx = (pltpu.roll(rows_c, lanes_p - 1, axis=1)
              - pltpu.roll(rows_c, 1, axis=1))
        gy = packed[0:n, :] - packed[2:2 + n, :]

        col_rot = dxf_l * cos_v - dyf_c * sin_v              # (n, 128)
        row_rot = dxf_l * sin_v + dyf_c * cos_v
        half = F32(n_hist / 2)
        row_bin = row_rot + half
        col_bin = col_rot + half

        y_img = yi_v + dyy_c
        x_img = xi_v + dxx_l
        ok = ((jnp.abs(dyy_c).astype(F32) <= radius_v)
              & (jnp.abs(dxx_l).astype(F32) <= radius_v)
              & (row_bin > F32(-0.5)) & (row_bin < F32(n_hist + 0.5))
              & (col_bin > F32(-0.5)) & (col_bin < F32(n_hist + 0.5))
              & (y_img > 0) & (y_img < h - 1)
              & (x_img > 0) & (x_img < w - 1)
              & colvalid_l & live_v)

        wscale = F32(-2.0) / F32(n_hist * n_hist)
        w2 = col_rot * col_rot + row_rot * row_rot
        weights = jnp.exp(w2 * wscale)
        mag = jnp.sqrt(gx * gx + gy * gy)
        deg = atan2_f32(gy, gx) * np.float32(180.0 / np.pi)
        ori_norm = jnp.mod(deg + F32(360.0), F32(360.0)) - ori_v

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
        r1 = jnp.clip(jnp.where(ok, rfl, F32(0.0)).astype(I32) + 1,
                      0, n_hist)
        c1 = jnp.clip(jnp.where(ok, cfl, F32(0.0)).astype(I32) + 1,
                      0, n_hist)
        of = jnp.where(ok, ofl, F32(0.0)).astype(I32)
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

        rows = []
        for r in range(n_hist):
            for c in range(n_hist):
                wrc = u_r[r] * u_c[c]
                for o in range(n_bins):
                    rows.append(jnp.sum(wrc * planes[o],
                                        axis=0, keepdims=True))
        H = jnp.concatenate(rows, axis=0)                    # (128, 128)

        for j in range(p):
            Hj = jnp.where(grp_l == j, H, F32(0.0))
            if j:
                Hj = pltpu.roll(Hj, lanes_p - j * stride, axis=1)
            col = jnp.sum(Hj, axis=1, keepdims=True)         # (D, 1)
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

        O = jnp.where(g1 < hi, compute_group(1, g1, O), O)
        return O

    O = jax.lax.fori_loop(0, -(-(hi - lo) // 2),
                          body, jnp.zeros((D, BK), F32))
    hist_ref[:, :] = O


@functools.partial(jax.jit, static_argnums=(7, 8, 9, 10, 11, 12))
def descriptor_hist_packed(gauss_padded, s, xi, yi, kp_scale, angle, count,
                           h: int, w: int, pad: int,
                           cfg: SiftConfig = DEFAULT_CONFIG,
                           interpret: bool = False,
                           r_max: int = 30):
    """Lane-packed raw descriptor histograms: same contract as
    descriptor_kernel.descriptor_hist_pallas; requires a pack_layout for
    r_max (wn <= 129 — callers keep wider buckets on the per-keypoint
    kernel)."""
    M = s.shape[0]
    al = 16 if gauss_padded.dtype == jnp.bfloat16 else 8
    bk = BK_INTERPRET if interpret else BK
    nb = -(-M // bk)
    padn = nb * bk - M

    def pad1(a):
        return jnp.pad(a, (0, padn))

    D = cfg.descriptor_size
    p, lanes_p, stride = pack_layout(r_max)

    kernel = functools.partial(
        _kernel, n_hist=cfg.descriptor_n_histograms,
        n_bins=cfg.descriptor_n_bins, lambda_descr=cfg.lambda_descr,
        h=h, w=w, pad=pad, w_pad=gauss_padded.shape[2], r_max=r_max,
        p=p, stride=stride, BK=bk, kpad=nb * bk, al=al, lanes_p=lanes_p)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,   # count, s, y, x
        grid=(nb,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),   # kp_scale (nb,BK)
                  pl.BlockSpec(memory_space=pltpu.VMEM),   # angle (nb,BK)
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((D, bk), lambda i, *_: (0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2 * _subl(2 * r_max + 3, al), p * LANES_DMA),
                       gauss_padded.dtype),
            pltpu.SemaphoreType.DMA((2, p, 2)),
        ],
    )

    hist_t = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((D, nb * bk), jnp.float32),
        interpret=interpret,
    )(jnp.asarray(count, jnp.int32).reshape(1),
      pad1(jnp.clip(s, 0, gauss_padded.shape[0] - 1)).astype(jnp.int32),
      pad1(jnp.clip(yi, 0, h - 1)).astype(jnp.int32),
      pad1(jnp.clip(xi, 0, w - 1)).astype(jnp.int32),
      pad1(kp_scale).reshape(nb, bk), pad1(angle).reshape(nb, bk),
      gauss_padded)
    return hist_t.T[:M]


@functools.partial(jax.jit, static_argnums=(7, 8, 9, 10, 11, 12))
def descriptor_hist_packed_masked(gauss_padded, s, xi, yi, kp_scale, angle,
                                  live, h: int, w: int, pad: int,
                                  cfg: SiftConfig = DEFAULT_CONFIG,
                                  interpret: bool = False,
                                  r_max: int = 30):
    """descriptor_hist_packed with ARBITRARY per-lane liveness instead of a
    compacted count prefix (round 5 — see
    orientation_packed.orientation_histograms_packed_masked; same scheme).
    Dead lanes produce all-zero histogram rows and skip their window DMA."""
    M = s.shape[0]
    al = 16 if gauss_padded.dtype == jnp.bfloat16 else 8
    bk = BK_INTERPRET if interpret else BK
    nb = -(-M // bk)
    padn = nb * bk - M

    def pad1(a):
        return jnp.pad(a, (0, padn))

    D = cfg.descriptor_size
    p, lanes_p, stride = pack_layout(r_max)
    n_groups = -(-bk // p)

    livei = pad1(jnp.asarray(live, jnp.int32))
    g_of_lane = (jnp.arange(bk, dtype=jnp.int32) // p)[None, :]
    lv2 = livei.reshape(nb, bk)
    glo = jnp.min(jnp.where(lv2 > 0, g_of_lane, n_groups), axis=1)
    ghi = jnp.max(jnp.where(lv2 > 0, g_of_lane + 1, 0), axis=1)
    glo = jnp.minimum(glo, ghi)

    kernel = functools.partial(
        _kernel, n_hist=cfg.descriptor_n_histograms,
        n_bins=cfg.descriptor_n_bins, lambda_descr=cfg.lambda_descr,
        h=h, w=w, pad=pad, w_pad=gauss_padded.shape[2], r_max=r_max,
        p=p, stride=stride, BK=bk, kpad=nb * bk, al=al, lanes_p=lanes_p,
        masked=True)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,   # live, glo, ghi, s, y, x
        grid=(nb,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),   # kp_scale (nb,BK)
                  pl.BlockSpec(memory_space=pltpu.VMEM),   # angle (nb,BK)
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((D, bk), lambda i, *_: (0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2 * _subl(2 * r_max + 3, al), p * LANES_DMA),
                       gauss_padded.dtype),
            pltpu.SemaphoreType.DMA((2, p, 2)),
        ],
    )

    hist_t = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((D, nb * bk), jnp.float32),
        interpret=interpret,
    )(livei,
      glo.astype(jnp.int32), ghi.astype(jnp.int32),
      pad1(jnp.clip(s, 0, gauss_padded.shape[0] - 1)).astype(jnp.int32),
      pad1(jnp.clip(yi, 0, h - 1)).astype(jnp.int32),
      pad1(jnp.clip(xi, 0, w - 1)).astype(jnp.int32),
      pad1(kp_scale).reshape(nb, bk), pad1(angle).reshape(nb, bk),
      gauss_padded)
    return hist_t.T[:M]
