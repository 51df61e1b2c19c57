"""Pallas TPU kernel: REGION-WALK Newton refinement — all <=5 interpolation
steps (reference interpolate_extremum, lib.rs:508-603) in ONE launch, with
region-shared window DMAs and a fully VECTORIZED walk.

Synthesis of the two earlier whole-stage attempts, built from their measured
failure modes:

  * the per-step kernel (refine_kernel.py) is bandwidth/launch bound: ~940 MB
    of (3,16,256)-window DMAs + 5 launches per octave at bench density;
  * the tile kernel (refine_tile_kernel.py) fixed the DMA side (one ~2.4 MB
    window per 128x512 tile) but walks candidates through its dense step
    field with a SERIAL per-candidate fori_loop (5 dynamic 768-lane rolls per
    candidate) — measured SLOWER than per-step (1.72 vs 0.90 us/cand).

This kernel keeps the dense-field idea and vectorizes everything:

  1. candidates are grouped by (frame, 32-row, 256-lane) REGION; each region
     DMAs ONE (n_dog, 48, 512) f32 window covering all scale planes + the
     +-7-step walk margin (~490 MB / ~1k loads per 1080p octave — fewer
     bytes AND ~20x fewer DMAs than per-step);
  2. a dense Newton pass over the window (identical f32 op order per cell,
     _newton_cols) fills a VMEM bank for ALL center scales: the walk field
     SPLIT into two <=255-valued banks (ok|big|step_s and step_y|step_x —
     small integers are bf16-exact, so the per-step one-hot lookups run at
     DEFAULT MXU precision) plus the five result fields
     (off_s/off_y/off_x/response/keep, looked up once at HIGHEST);
  3. the <=5-step walk runs BK-wide with pure vector/MXU ops: the field at
     every candidate's current (s, y, x) is fetched with a one-hot
     (BK, SLAB) @ (SLAB, WL) contraction + lane-masked row reduction — both
     one-hot operands are built directly in (BK, .) orientation from
     position columns, so there is no transpose and no per-candidate loop;
  4. scale steps NEVER escape (all planes are resident — the tile kernel's
     main escape source, 14.5% of candidates at bench density); only walks
     leaving the +-7 row/lane margin (~1.4%) or |step| > 7 escape to the
     per-step fallback, which re-refines them from scratch with identical
     semantics.

Output row layout (BK, 16) f32 (same as refine_tile_kernel):
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
from .refine_tile_kernel import _newton_cols

F32 = jnp.float32
I32 = jnp.int32
BK = 32          # candidates per grid block (one region per block)
# Region geometry: 32x256 regions / 48x512 windows. Round 5 A/B-tested
# 64x512 regions (80x768 windows; ~40% less window DMA + dense-solve area)
# and measured it SLOWER end-to-end (10.2 vs 10.72 fps): the walk phase's
# per-block one-hot field lookups scale with bank rows x window lanes
# ((240,768) vs (144,512) contractions, ~2.5x per lookup), which eats the
# DMA/dense savings. Results are byte-identical under any geometry (same
# field values; escapes only shift between in-window and fallback, both
# exact), so this stays a pure perf knob.
REG_R = 32       # region rows
REG_C = 256      # region lanes
WIN_R = 48       # window rows  = region + 8-aligned +-7 walk margin
WIN_C = 512      # window lanes = region + 128-aligned margin
MAX_STEP = 7     # |step| beyond this escapes (matches the tile kernel)
N_FIN = 5        # off_s, off_y, off_x, response, keep


def _sanitize(a):
    """Zero non-finite values so one-hot contractions stay exact (0 * inf =
    NaN would poison the row sums). Non-finite field values only occur at
    cells whose ok flag is false (singular Hessians), where the caller never
    reads the result fields."""
    return jnp.where(a - a == F32(0.0), a, F32(0.0))


def _kernel(blk_active, blk_load, blk_r0, blk_c0, blk_pb,
            blk_par, blk_first, nxt_r0, nxt_c0, nxt_pb, nxt_has,
            s_ref, y_ref, x_ref, act_ref, dog_hbm, out_ref,
            win, win_a, bank_pk, bank_pk2, bank_fin, sem,
            *, contrast_threshold, edge_threshold, scales_per_octave,
            pad, h, w, border, LR, LW, BK):
    blk = pl.program_id(0)
    nc = scales_per_octave
    n_dog = nc + 2
    WLR = n_dog * LR

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
            # double-buffered window DMA: every load block waits on its own
            # region's copies (started by the PREVIOUS load block, or by
            # itself on bootstrap) and immediately starts the NEXT load
            # block's region into the other buffer half, so the next DMA
            # overlaps this block's dense solve + walks. The parity branch
            # is static so copy dst/semaphore indices stay static; the
            # active window is then VMEM-copied into win_a so the dense
            # solve below is parity-independent.
            def copyset(dstbase, r0v, c0v, pbv, semrow):
                return [pltpu.make_async_copy(
                    dog_hbm.at[pbv + p, pl.ds(r0v, LR), pl.ds(c0v, LW)],
                    win.at[pl.ds(dstbase + p * LR, LR), :],
                    sem.at[semrow, p]) for p in range(n_dog)]

            for parv in (0, 1):
                @pl.when(blk_par[blk] == parv)
                def _(parv=parv):
                    own = copyset(parv * WLR, r0, c0, pb, parv)

                    @pl.when(blk_first[blk] > 0)
                    def _():
                        for c in own:
                            c.start()

                    for c in own:
                        c.wait()

                    @pl.when(nxt_has[blk] > 0)
                    def _():
                        nr0 = pl.multiple_of(nxt_r0[blk], 8)
                        nc0 = pl.multiple_of(nxt_c0[blk], 128)
                        for c in copyset((1 - parv) * WLR, nr0, nc0,
                                         nxt_pb[blk], 1 - parv):
                            c.start()

                    win_a[:, :] = win[parv * WLR:(parv + 1) * WLR, :]

            # dense Newton pass per center scale. Roll taps wrap at window
            # rows 0/LR-1 and lanes 0/LW-1; those field cells are corrupt but
            # the walk clamps lookups to [1, LR-2] x [1, LW-2] and flags the
            # lane escaped, so they are never consumed.
            for p in range(1, nc + 1):
                rowtap = {}
                for ds in range(3):
                    plane = win_a[(p - 1 + ds) * LR:(p - 1 + ds) * LR + LR, :]
                    rowtap[(ds, 1)] = plane
                    rowtap[(ds, 0)] = pltpu.roll(plane, 1, axis=0)
                    rowtap[(ds, 2)] = pltpu.roll(plane, LR - 1, axis=0)
                cube = {}
                for ds in range(3):
                    for dy in range(3):
                        rt = rowtap[(ds, dy)]
                        cube[(ds, dy, 1)] = rt
                        cube[(ds, dy, 0)] = pltpu.roll(rt, 1, axis=1)
                        cube[(ds, dy, 2)] = pltpu.roll(rt, LW - 1, axis=1)
                f = _newton_cols(
                    cube, contrast_threshold=contrast_threshold,
                    edge_threshold=edge_threshold,
                    scales_per_octave=scales_per_octave)
                # 4-bit step packing [-8, 7]; any |step| > 7 sets the escape
                # bit, so the clipped value is never applied to a walk.
                # SPLIT into two <=255-valued banks: integer values <= 255
                # are exact in bf16, so the walk's 5x-per-candidate one-hot
                # field lookups can run at DEFAULT MXU precision (one
                # bf16 x bf16 pass) instead of the ~3x-cost HIGHEST
                # decomposition the single <2^15 packing required.
                sts = jnp.clip(f["step_s"], -8.0, 7.0)
                sty = jnp.clip(f["step_y"], -8.0, 7.0)
                stx = jnp.clip(f["step_x"], -8.0, 7.0)
                bigstep = ((jnp.abs(f["step_s"]) > MAX_STEP)
                           | (jnp.abs(f["step_y"]) > MAX_STEP)
                           | (jnp.abs(f["step_x"]) > MAX_STEP))
                pk_lo = (f["ok"].astype(F32)
                         + bigstep.astype(F32) * F32(2.0)
                         + (sts + F32(8.0)) * F32(4.0))         # <= 63
                pk_hi = ((sty + F32(8.0))
                         + (stx + F32(8.0)) * F32(16.0))        # <= 255
                bank_pk[(p - 1) * LR:(p - 1) * LR + LR, :] = _sanitize(pk_lo)
                bank_pk2[(p - 1) * LR:(p - 1) * LR + LR, :] = _sanitize(pk_hi)
                fin = [f["off_s"], f["off_y"], f["off_x"], f["response"],
                       f["keep"].astype(F32)]
                for fi, arr in enumerate(fin):
                    q = (fi * nc + p - 1) * LR
                    bank_fin[q:q + LR, :] = _sanitize(arr)

        # gather candidate state into (BK, 1) columns
        base = blk * BK
        subl = jax.lax.broadcasted_iota(I32, (BK, 1), 0)
        s_c = jnp.zeros((BK, 1), F32)
        y_c = jnp.zeros((BK, 1), F32)
        x_c = jnp.zeros((BK, 1), F32)
        a_c = jnp.zeros((BK, 1), F32)
        for k in range(BK):
            i = base + k
            mk = subl == k
            s_c = s_c + jnp.where(mk, jnp.asarray(s_ref[i], F32), F32(0.0))
            y_c = y_c + jnp.where(mk, jnp.asarray(y_ref[i], F32), F32(0.0))
            x_c = x_c + jnp.where(mk, jnp.asarray(x_ref[i], F32), F32(0.0))
            a_c = a_c + jnp.where(mk, jnp.asarray(act_ref[i], F32), F32(0.0))

        i_lane = jax.lax.broadcasted_iota(I32, (BK, LW), 1)

        def field_at(bank_ref, sel_row, x_col, prec=jax.lax.Precision.HIGHEST):
            """bank_ref (R, LW) VMEM ref; sel_row/x_col (BK, 1) -> (BK, 1).

            Precision rules (hardware-exposed; interpret mode is exact f32
            either way): Mosaic lowers a DEFAULT-precision f32 dot to one
            bf16 x bf16 MXU pass, rounding bank values to 8 mantissa bits.
            That is exact for the split walk banks (integer values <= 255,
            one-hot rows select a single value) but fatal for the result
            bank (arbitrary f32), which must keep HIGHEST: its multi-pass
            split reproduces every f32 value exactly (1.0 splits as hi=1,
            lo=0; value splits recombine exactly in the f32 accumulator)."""
            bank_rows = bank_ref[:, :]
            R = (jax.lax.broadcasted_iota(I32, (BK, bank_rows.shape[0]), 1)
                 == sel_row.astype(I32)).astype(F32)
            E = jax.lax.dot_general(R, bank_rows, (((1,), (0,)), ((), ())),
                                    preferred_element_type=F32,
                                    precision=prec)
            C = (i_lane == x_col.astype(I32)).astype(F32)
            return jnp.sum(E * C, axis=1, keepdims=True)

        one = F32(1.0)
        conv = jnp.zeros((BK, 1), F32)
        dead = one - a_c
        esc = jnp.zeros((BK, 1), F32)
        for _step in range(5):
            sc = jnp.clip(s_c, 1.0, float(nc))
            yr = jnp.clip(y_c - jnp.asarray(r0i, F32), 1.0, float(LR - 2))
            xr = jnp.clip(x_c - jnp.asarray(c0i, F32), 1.0, float(LW - 2))
            row = (sc - one) * F32(LR) + yr
            vlo = field_at(bank_pk, row, xr, jax.lax.Precision.DEFAULT)
            vhi = field_at(bank_pk2, row, xr, jax.lax.Precision.DEFAULT)
            # decode the split walk values (integers <= 255, bf16-exact)
            q4 = jnp.floor(vlo / F32(4.0))
            ok = vlo - q4 * F32(4.0)
            big = jnp.floor(ok / F32(2.0))
            ok = ok - big * F32(2.0)
            sts = q4 - F32(8.0)
            q16 = jnp.floor(vhi / F32(16.0))
            sty = vhi - q16 * F32(16.0) - F32(8.0)
            stx = q16 - F32(8.0)

            alive = (one - conv) * (one - dead) * (one - esc)
            conv = conv + alive * ok
            move = alive * (one - ok)
            esc = esc + move * big
            mv = move * (one - big)
            s_c = s_c + mv * sts
            y_c = y_c + mv * sty
            x_c = x_c + mv * stx
            bad = ((s_c < 1.0) | (s_c > float(nc))
                   | (x_c - pad < border) | (x_c - pad >= w - border)
                   | (y_c - pad < border) | (y_c - pad >= h - border)
                   ).astype(F32)
            dead = dead + mv * bad - dead * mv * bad       # dead |= mv*bad
            outw = ((y_c - jnp.asarray(r0i, F32) < 1.0)
                    | (y_c - jnp.asarray(r0i, F32) > float(LR - 2))
                    | (x_c - jnp.asarray(c0i, F32) < 1.0)
                    | (x_c - jnp.asarray(c0i, F32) > float(LW - 2))
                    ).astype(F32)
            add = mv * (one - bad) * outw
            esc = esc + add - esc * add                    # esc |= ...

        # final result fields at the converged cell
        sc = jnp.clip(s_c, 1.0, float(nc))
        yr = jnp.clip(y_c - jnp.asarray(r0i, F32), 1.0, float(LR - 2))
        xr = jnp.clip(x_c - jnp.asarray(c0i, F32), 1.0, float(LW - 2))
        fin = [field_at(bank_fin,
                        (F32(fi * nc) + sc - one) * F32(LR) + yr, xr)
               for fi in range(N_FIN)]

        okc = conv * (one - esc)
        cols = [okc, s_c, y_c, x_c,
                fin[0] * okc, fin[1] * okc, fin[2] * okc,
                fin[3] * okc, fin[4] * okc, esc]
        olane = jax.lax.broadcasted_iota(I32, (1, 16), 1)
        out = jnp.zeros((BK, 16), F32)
        for j, c in enumerate(cols):
            out = out + jnp.where(olane == j, c, F32(0.0))
        out_ref[:, :] = out


@functools.partial(jax.jit, static_argnums=(16, 17, 18, 19, 20, 21))
def _refine_walk_call(blk_active, blk_load, blk_r0, blk_c0, blk_pb,
                      blk_par, blk_first, nxt_r0, nxt_c0, nxt_pb, nxt_has,
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
        num_scalar_prefetch=15,
        grid=(nb,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((BK, 16), lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2 * n_dog * LR, LW), jnp.float32),
            pltpu.VMEM((n_dog * LR, LW), jnp.float32),
            pltpu.VMEM((cfg.scales_per_octave * LR, LW), jnp.float32),
            pltpu.VMEM((cfg.scales_per_octave * LR, LW), jnp.float32),
            pltpu.VMEM((N_FIN * cfg.scales_per_octave * LR, LW),
                       jnp.float32),
            pltpu.SemaphoreType.DMA((2, n_dog)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb * BK, 16), jnp.float32),
        interpret=interpret,
        # headroom over the default 16 MB scoped-vmem limit so region-
        # geometry experiments compile (same raise as the fused pyramid
        # kernel, pyramid_kernel.py:433-435); the shipped 32x256 geometry
        # needs ~3.5 MB
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20),
    )(blk_active, blk_load, blk_r0, blk_c0, blk_pb,
      blk_par, blk_first, nxt_r0, nxt_c0, nxt_pb, nxt_has,
      s, y, x, act, dog_flat)


def refine_walk_tpu(dog_flat: jnp.ndarray, s0, y0, x0, valid, pad: int,
                    h: int, w: int, cfg: SiftConfig = DEFAULT_CONFIG,
                    plane_off=None, interpret: bool = False,
                    chunk: int = 32768, escape_cap: int | None = None):
    """Region-walk refinement driver: same contract as ops.extrema.refine_tpu
    (positions in PADDED coords, returns ok/s/y/x/offs/response/keep), the
    whole <=5-step loop in one launch. Escaped candidates (walk left the
    window margin or |step| > 7 — rare) are re-refined by the per-step
    kernel, preserving exact reference semantics (lib.rs:508-603).

    chunk: slot-axis kernel-call width (SMEM budget for the scalar-prefetch
    operands); a BK-multiple. Overridable so tests can exercise the
    chunk-boundary prefetch schedule without 32k+ candidates.
    escape_cap: compacted escape-buffer capacity override (default: the
    K//16 production formula); tests shrink it to force the exact
    full-width fallback branch. The result carries n_escaped."""
    from ..extrema import refine_tpu

    from .region_group import (chunk_schedule, group_by_region,
                               merge_escaped_compact)

    assert dog_flat.dtype == jnp.float32, "walk refinement requires f32 DoG"
    n_dog = cfg.scales_per_octave + 2
    Hp, Wp = dog_flat.shape[-2], dog_flat.shape[-1]
    n_frames = dog_flat.shape[0] // n_dog
    LR = min(WIN_R, Hp)
    LW = min(WIN_C, Wp)

    g = group_by_region(s0, y0, x0, valid, pad, Hp, Wp, n_dog, n_frames,
                        plane_off, REG_R, REG_C, WIN_R, WIN_C, 8, 128, BK)

    CHUNK = -(-chunk // BK) * BK
    outs = []
    for t0 in range(0, g.T_cap, CHUNK):
        t1 = min(t0 + CHUNK, g.T_cap)
        sched = chunk_schedule(g, t0, t1, BK)
        outs.append(_refine_walk_call(
            *sched,
            g.s_slot[t0:t1], g.y_slot[t0:t1], g.x_slot[t0:t1],
            g.a_slot[t0:t1], dog_flat, LR, LW, cfg, pad, (h, w), interpret))
    out_slots = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)

    rows = out_slots[jnp.clip(g.slot_k, 0, g.T_cap - 1)]

    # escaped candidates (~1.4%) re-refine on a COMPACTED buffer — the
    # full-width per-step fallback costs ~36 ms/batch of pure grid-step
    # overhead at bench density even with zero escapes (round-4 breakdown)
    K = s0.shape[0]
    e_cap = (escape_cap if escape_cap is not None
             else min(K, max(512, -(-(K // 16) // 128) * 128)))
    if plane_off is None:
        args = (s0, y0, x0)

        def run_fb(a, act):
            return refine_tpu(dog_flat, a[0], a[1], a[2], act, pad, h, w,
                              cfg, plane_off=None, interpret=interpret)
    else:
        args = (s0, y0, x0, plane_off)

        def run_fb(a, act):
            return refine_tpu(dog_flat, a[0], a[1], a[2], act, pad, h, w,
                              cfg, plane_off=a[3], interpret=interpret)

    return merge_escaped_compact(rows, valid, run_fb, args, e_cap)
