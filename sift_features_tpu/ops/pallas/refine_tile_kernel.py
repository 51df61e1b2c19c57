"""Pallas TPU kernel: TILE-GROUPED Newton refinement — all 5 interpolation
steps (reference interpolate_extremum, lib.rs:508-603) in ONE kernel launch,
served from VMEM-resident DoG tiles.

The per-step kernel (refine_kernel.py) DMAs a ~49 KB tile-aligned cube region
per candidate per step; at 32k candidates x 5 steps that per-DMA latency is
the pipeline's dominant stage (65 ms/frame at 1080p, tools/ablate_stages.py).
Here candidates are grouped by image tile (128 rows x 512 lanes) and each
grid block:

  1. DMAs its tile's window — ALL DoG planes x (tile + movement margin):
     (S+2, 160, 768) f32, ~2.4 MB — once per tile (consecutive blocks of the
     same tile reuse the scratch, which persists across grid steps);
  2. computes a DENSE per-cell step field over the window: for every cell,
     the Newton solve's convergence bit and rounded re-centering steps,
     packed into one int32 (same f32 op order as the sparse solve, so
     per-cell decisions are bit-identical);
  3. walks each candidate <=5 steps through the field (one scalar read per
     step — the step at a cell is a pure function of the cell, so the walk
     IS the reference's re-centering loop);
  4. re-extracts the 3x3x3 cube at each converged candidate's final cell
     (in-register rolls, no DMA) and runs the full vectorized Newton solve +
     contrast/edge tests there (lib.rs:605-653), exactly like the per-step
     kernel.

Candidates whose walk leaves the window margin or whose |step| exceeds the
4-bit packing (|step| > 7 — near-singular Hessians) are flagged ESCAPED and
re-refined from scratch by the per-step kernel (rare; identical semantics).

Output row layout (BK, 16) f32:
  0 ok | 1 s_fin | 2 y_fin | 3 x_fin | 4 off_s | 5 off_y | 6 off_x |
  7 response | 8 keep | 9 escaped | 10.. unused
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...config import DEFAULT_CONFIG, SiftConfig
from .util import round_half_away

F32 = jnp.float32
I32 = jnp.int32
BK = 128        # candidates per grid block (tile padding granularity)
TILE_R = 128    # tile rows (window adds +-16 margin)
TILE_C = 512    # tile lanes (window adds +-128 margin)
WIN_R = 160     # window rows   (multiple of 8)
WIN_C = 768     # window lanes  (multiple of 128)
CH = 32         # dense-pass row chunk (register-pressure bound)
MAX_STEP = 7    # |step| packable in 4 bits; larger -> escape to fallback


def _newton_cols(c, *, contrast_threshold, edge_threshold, scales_per_octave):
    """The Newton solve + contrast/edge tests from 27 cube-value arrays
    c[(ds,dy,dx)] (any broadcast-compatible shapes). Identical f32 op order
    to refine_kernel._kernel / ops.extrema._newton_from_cubes."""
    two = F32(2.0)
    four = F32(4.0)
    v = c[(1, 1, 1)]
    v2 = v * two
    g1 = (c[(2, 1, 1)] - c[(0, 1, 1)]) / two
    g2 = (c[(1, 2, 1)] - c[(1, 0, 1)]) / two
    g3 = (c[(1, 1, 2)] - c[(1, 1, 0)]) / two
    h11 = c[(2, 1, 1)] + c[(0, 1, 1)] - v2
    h12 = (c[(2, 2, 1)] - c[(2, 0, 1)] - c[(0, 2, 1)] + c[(0, 0, 1)]) / four
    h13 = (c[(2, 1, 2)] - c[(2, 1, 0)] - c[(0, 1, 2)] + c[(0, 1, 0)]) / four
    h22 = c[(1, 2, 1)] + c[(1, 0, 1)] - v2
    h33 = c[(1, 1, 2)] + c[(1, 1, 0)] - v2
    h23 = (c[(1, 2, 2)] - c[(1, 2, 0)] - c[(1, 0, 2)] + c[(1, 0, 0)]) / four

    det = (h11 * h22 * h33 - h11 * h23 * h23 - h12 * h12 * h33
           + two * h12 * h13 * h23 - h13 * h13 * h22)
    hinv11 = (h22 * h33 - h23 * h23) / det
    hinv12 = (h13 * h23 - h12 * h33) / det
    hinv13 = (h12 * h23 - h13 * h22) / det
    hinv22 = (h11 * h33 - h13 * h13) / det
    hinv23 = (h12 * h13 - h11 * h23) / det
    hinv33 = (h11 * h22 - h12 * h12) / det
    off_s = -(hinv11 * g1 + hinv12 * g2 + hinv13 * g3)
    off_x = -(hinv13 * g1 + hinv23 * g2 + hinv33 * g3)
    off_y = -(hinv12 * g1 + hinv22 * g2 + hinv23 * g3)
    ok = ((jnp.abs(off_s) < 0.5) & (jnp.abs(off_x) < 0.5)
          & (jnp.abs(off_y) < 0.5))
    off_s = jnp.where(off_s != off_s, F32(0), off_s)   # NaN -> 0
    off_y = jnp.where(off_y != off_y, F32(0), off_y)
    off_x = jnp.where(off_x != off_x, F32(0), off_x)

    interp = off_s * g1 + off_y * g2 + off_x * g3
    contrast = v + interp / two
    keep_c = (jnp.abs(contrast) * F32(scales_per_octave)
              > F32(contrast_threshold))
    tr = h33 + h22
    edet = h33 * h22 - h23 * h23
    thr = F32(edge_threshold)
    on_edge = (edet <= 0.0) | ((tr * tr * thr) > (thr + F32(1.0)) ** 2 * edet)

    big = F32(1e9)
    step_x = jnp.clip(round_half_away(off_x), -big, big)
    step_y = jnp.clip(round_half_away(off_y), -big, big)
    step_s = jnp.clip(round_half_away(off_s), -big, big)
    return {
        "ok": ok, "off_s": off_s, "off_y": off_y, "off_x": off_x,
        "response": jnp.abs(contrast), "keep": keep_c & ~on_edge,
        "step_s": step_s, "step_y": step_y, "step_x": step_x,
    }


def _kernel(blk_active, blk_load, blk_r0, blk_c0, blk_pb,
            s_ref, y_ref, x_ref, act_ref, dog_hbm, out_ref, win, packed, sem,
            *, contrast_threshold, edge_threshold, scales_per_octave,
            pad, h, w, border, LR, LW, BK):
    blk = pl.program_id(0)
    n_dog = scales_per_octave + 2

    @pl.when(blk_active[blk] == 0)
    def _():
        out_ref[:, :] = jnp.zeros((BK, 16), F32)

    @pl.when(blk_active[blk] > 0)
    def _():
        r0 = pl.multiple_of(blk_r0[blk], 8)
        c0 = pl.multiple_of(blk_c0[blk], 128)
        pb = blk_pb[blk]
        r0i = jnp.asarray(r0, I32)
        c0i = jnp.asarray(c0, I32)

        @pl.when(blk_load[blk] > 0)
        def _():
            # 1. window DMA: one strided copy per DoG plane
            for p in range(n_dog):
                pltpu.make_async_copy(
                    dog_hbm.at[pb + p, pl.ds(r0, LR), pl.ds(c0, LW)],
                    win.at[pl.ds(p * LR, LR), :], sem.at[p]).start()
            for p in range(n_dog):
                pltpu.make_async_copy(
                    dog_hbm.at[pb + p, pl.ds(r0, LR), pl.ds(c0, LW)],
                    win.at[pl.ds(p * LR, LR), :], sem.at[p]).wait()

            # 2. dense step field per interior plane, in row chunks
            for p in range(1, scales_per_octave + 1):
                for a in range(0, LR, CH):
                    cube = {}
                    for ds in range(3):
                        base = (p - 1 + ds) * LR
                        for dy in range(3):
                            lo = a + dy - 1
                            st = min(max(lo, 0), LR - CH)
                            rows = win[base + st:base + st + CH, :]
                            # boundary chunks: the clamp would shift the
                            # whole chunk's dy plane by one row — realign
                            # with a 1-row roll (the wrapped row lands on
                            # field rows 0 / LR-1, which the walk's
                            # [1, LR-2] clamp never reads)
                            if lo < 0:
                                rows = pltpu.roll(rows, 1, axis=0)
                            elif lo > LR - CH:
                                rows = pltpu.roll(rows, CH - 1, axis=0)
                            for dx in range(3):
                                sh = (LW + 1 - dx) % LW
                                cube[(ds, dy, dx)] = (
                                    pltpu.roll(rows, sh, axis=1)
                                    if sh else rows)
                    f = _newton_cols(
                        cube, contrast_threshold=contrast_threshold,
                        edge_threshold=edge_threshold,
                        scales_per_octave=scales_per_octave)
                    sts = jnp.clip(f["step_s"], -8.0, 8.0).astype(I32)
                    sty = jnp.clip(f["step_y"], -8.0, 8.0).astype(I32)
                    stx = jnp.clip(f["step_x"], -8.0, 8.0).astype(I32)
                    bigstep = ((jnp.abs(f["step_s"]) > MAX_STEP)
                               | (jnp.abs(f["step_y"]) > MAX_STEP)
                               | (jnp.abs(f["step_x"]) > MAX_STEP))
                    pk = (f["ok"].astype(I32)
                          + bigstep.astype(I32) * 2
                          + (jnp.clip(sts, -8, 7) + 8) * 4
                          + (jnp.clip(sty, -8, 7) + 8) * 64
                          + (jnp.clip(stx, -8, 7) + 8) * 1024)
                    packed[(p - 1) * LR + a:(p - 1) * LR + a + CH, :] = pk

        # 3+4. per-candidate walk + final-cell cube extraction
        base = blk * BK
        lane32 = jax.lax.broadcasted_iota(I32, (1, 32), 1)
        lane16 = jax.lax.broadcasted_iota(I32, (1, 16), 1)
        subl = jax.lax.broadcasted_iota(I32, (BK, 1), 0)

        def body(k, carry):
            M, FL = carry
            i = base + k
            a0 = jnp.asarray(act_ref[i], I32)
            s = jnp.asarray(s_ref[i], I32)
            yy = jnp.asarray(y_ref[i], I32)
            xx = jnp.asarray(x_ref[i], I32)
            conv = jnp.int32(0)
            dead = 1 - a0
            esc = jnp.int32(0)
            for _step in range(5):
                yr = jnp.clip(yy - r0i, 1, LR - 2)
                xr = jnp.clip(xx - c0i, 1, LW - 2)
                sc = jnp.clip(s, 1, scales_per_octave)
                row = packed[pl.ds((sc - 1) * LR + yr, 1), :]
                row = pltpu.roll(
                    row, jax.lax.rem(jnp.asarray(LW - xr, I32),
                                     jnp.int32(LW)), axis=1)
                v = jnp.sum(row[0:1, 0:1]).astype(I32)
                ok = v & 1
                big = (v >> 1) & 1
                sts = ((v >> 2) & 15) - 8
                sty = ((v >> 6) & 15) - 8
                stx = ((v >> 10) & 15) - 8
                alive = (1 - conv) * (1 - dead) * (1 - esc)
                conv = conv | (alive * ok)
                move = alive * (1 - ok)
                esc = esc | (move * big)
                mv = move * (1 - big)
                s = s + mv * sts
                yy = yy + mv * sty
                xx = xx + mv * stx
                bad = ((s < 1) | (s > scales_per_octave)
                       | (xx - pad < border) | (xx - pad >= w - border)
                       | (yy - pad < border) | (yy - pad >= h - border)
                       ).astype(I32)
                dead = dead | (mv * bad)
                outw = ((yy - r0i < 1) | (yy - r0i > LR - 2)
                        | (xx - c0i < 1) | (xx - c0i > LW - 2)).astype(I32)
                esc = esc | (mv * (1 - bad) * outw)

            # final-cell cube -> row of M (garbage for non-converged lanes;
            # masked by the flags downstream)
            yr = jnp.clip(yy - r0i, 1, LR - 2)
            xr = jnp.clip(xx - c0i, 1, LW - 2)
            sc = jnp.clip(s, 1, scales_per_octave)
            rowM = jnp.zeros((1, LW), F32)
            lane = jax.lax.broadcasted_iota(I32, (1, LW), 1)
            sh = jax.lax.rem(jnp.asarray(LW - (xr - 1), I32), jnp.int32(LW))
            for ds in range(3):
                for dy in range(3):
                    # single-row dynamic loads: Mosaic cannot prove multi-row
                    # loads at arbitrary sublane offsets aligned, but 1-row
                    # loads are offset-free in the tiled layout
                    rrow = win[pl.ds((sc - 1 + ds) * LR + yr - 1 + dy, 1), :]
                    # cube cols land at lanes 0..2 after the dynamic roll;
                    # a second STATIC roll places them at their M lanes —
                    # all-vector, no vector->scalar sync per value
                    j0 = (ds * 3 + dy) * 3
                    rrow = pltpu.roll(
                        rrow, jax.lax.rem(sh + j0, jnp.int32(LW)), axis=1)
                    rowM = rowM + jnp.where(
                        (lane >= j0) & (lane < j0 + 3), rrow, F32(0.0))
            M = M + jnp.where(subl == k, rowM[:, 0:32], F32(0.0))

            flrow = (jnp.where(lane16 == 0, (conv * (1 - esc)).astype(F32), F32(0.0))
                     + jnp.where(lane16 == 1, s.astype(F32), F32(0.0))
                     + jnp.where(lane16 == 2, yy.astype(F32), F32(0.0))
                     + jnp.where(lane16 == 3, xx.astype(F32), F32(0.0))
                     + jnp.where(lane16 == 4, esc.astype(F32), F32(0.0)))
            FL = FL + jnp.where(subl == k, flrow, F32(0.0))
            return M, FL

        # padding lanes are contiguous at the block tail (per-tile rank
        # padding), so bounding the loop by the active count skips them
        M, FL = jax.lax.fori_loop(
            0, jnp.minimum(jnp.asarray(blk_active[blk], I32), BK), body,
            (jnp.zeros((BK, 32), F32), jnp.zeros((BK, 16), F32)))

        def col(j):
            return M[:, j:j + 1]

        cube = {(ds, dy, dx): col((ds * 3 + dy) * 3 + dx)
                for ds in range(3) for dy in range(3) for dx in range(3)}
        f = _newton_cols(cube, contrast_threshold=contrast_threshold,
                         edge_threshold=edge_threshold,
                         scales_per_octave=scales_per_octave)
        okc = FL[:, 0:1]           # converged (and not escaped)
        escc = FL[:, 4:5]
        cols = [okc, FL[:, 1:2], FL[:, 2:3], FL[:, 3:4],
                f["off_s"] * okc, f["off_y"] * okc, f["off_x"] * okc,
                f["response"] * okc, f["keep"].astype(F32) * okc, escc]
        olane = jax.lax.broadcasted_iota(I32, (1, 16), 1)
        out = jnp.zeros((BK, 16), F32)
        for j, c in enumerate(cols):
            out = out + jnp.where(olane == j, c, F32(0.0))
        out_ref[:, :] = out


@functools.partial(jax.jit, static_argnums=(10, 11, 12, 13, 14, 15))
def _refine_tile_call(blk_active, blk_load, blk_r0, blk_c0, blk_pb,
                      s, y, x, act, dog_flat, LR: int, LW: int,
                      cfg: SiftConfig, pad: int, hw: tuple,
                      interpret: bool = False):
    nb = blk_active.shape[0]
    h, w = hw
    kernel = functools.partial(
        _kernel, contrast_threshold=cfg.contrast_threshold,
        edge_threshold=cfg.edge_threshold,
        scales_per_octave=cfg.scales_per_octave,
        pad=pad, h=h, w=w, border=cfg.image_border, LR=LR, LW=LW, BK=BK)
    n_dog = cfg.scales_per_octave + 2
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=9,
        grid=(nb,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((BK, 16), lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((n_dog * LR, LW), jnp.float32),
            pltpu.VMEM((cfg.scales_per_octave * LR, LW), jnp.int32),
            pltpu.SemaphoreType.DMA((n_dog,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb * BK, 16), jnp.float32),
        interpret=interpret,
    )(blk_active, blk_load, blk_r0, blk_c0, blk_pb, s, y, x, act, dog_flat)


def refine_tile_tpu(dog_flat: jnp.ndarray, s0, y0, x0, valid, pad: int,
                    h: int, w: int, cfg: SiftConfig = DEFAULT_CONFIG,
                    plane_off=None, interpret: bool = False):
    """Tile-grouped refinement driver: same contract as ops.extrema.refine_tpu
    (positions in PADDED coords, returns ok/s/y/x/offs/response/keep), but the
    whole <=5-step loop runs in one kernel launch per ~32k candidates.

    dog_flat: (n_frames*(S+2), H_pad, W_pad) f32 (or (S+2, H, W) single
    frame). plane_off: per-candidate frame*(S+2) offsets, as in refine_tpu.
    Escaped candidates (walk left the tile window — rare) are re-refined by
    the per-step kernel and merged, preserving exact reference semantics."""
    from ..extrema import refine_tpu
    from .region_group import group_by_region, merge_escaped

    assert dog_flat.dtype == jnp.float32, "tile refinement requires f32 DoG"
    n_dog = cfg.scales_per_octave + 2
    Hp, Wp = dog_flat.shape[-2], dog_flat.shape[-1]
    n_frames = dog_flat.shape[0] // n_dog
    LR = min(WIN_R, Hp)
    LW = min(WIN_C, Wp)

    g = group_by_region(s0, y0, x0, valid, pad, Hp, Wp, n_dog, n_frames,
                        plane_off, TILE_R, TILE_C, WIN_R, WIN_C, 16, 128, BK)

    # chunked kernel calls (SMEM scalar-prefetch budget; see refine_tpu)
    CHUNK = 32768
    outs = []
    for t0 in range(0, g.T_cap, CHUNK):
        t1 = min(t0 + CHUNK, g.T_cap)
        b0, b1 = t0 // BK, t1 // BK
        seg_chunk = g.seg_b[b0:b1]
        load = jnp.concatenate([
            jnp.ones((1,), I32),
            (seg_chunk[1:] != seg_chunk[:-1]).astype(I32)])
        outs.append(_refine_tile_call(
            g.active_b[b0:b1], load, g.r0_b[b0:b1], g.c0_b[b0:b1],
            g.pb_b[b0:b1], g.s_slot[t0:t1], g.y_slot[t0:t1],
            g.x_slot[t0:t1], g.a_slot[t0:t1],
            dog_flat, LR, LW, cfg, pad, (h, w), interpret))
    out_slots = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)

    rows = out_slots[jnp.clip(g.slot_k, 0, g.T_cap - 1)]
    # fallback pass for escaped candidates: full re-refinement from the
    # ORIGINAL position with the per-step kernel (deterministic, identical
    # reference semantics; blocks with no escaped lanes are skipped fast)
    return merge_escaped(rows, valid, lambda esc: refine_tpu(
        dog_flat, s0, y0, x0, esc, pad, h, w, cfg,
        plane_off=plane_off, interpret=interpret))
