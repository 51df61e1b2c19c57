"""Pallas TPU kernel: REGION-GROUPED Newton-refinement step (reference
interpolate_extremum, lib.rs:508-603 — one masked step of the <=5-step loop).

The per-candidate step kernel (refine_kernel.py) DMAs a tile-aligned
(3, 16, 128) cube region PER CANDIDATE (~24 KB) and extracts the 27 cube
values with serial scalar reductions; at bench density (32k candidates at
1080p) step 1 alone moves ~768 MB and the extraction work is per-candidate
serial VPU time. This kernel removes both costs for the all-candidates-active
first step:

  1. candidates are sorted by aligned REGION — (scale plane, 8-row band,
     128-lane band) — so candidates that share a (3, 16, 256) DMA window are
     adjacent; measured at bench density (tree tiled to 1080p, 27.6k
     candidates) sharing is 1.86 candidates/region, i.e. ~1.8x fewer DMAs
     and (with the conditional second half) ~1.9x fewer bytes than the
     per-candidate kernel (per-candidate `load` flags + VMEM buffer slots
     computed on the host side of the launch, in XLA);
  2. the Newton solve + contrast/edge tests run DENSELY over each loaded
     window with pure vector ops (rolled taps; identical f32 op order to the
     sparse solve — per-cell results are bit-identical), writing 9 result
     fields to a VMEM field bank;
  3. each candidate's 9 results are extracted from the bank with one-hot
     MXU matmuls (row-select matmul, lane-select matmul, diagonal sum) —
     exact (one-hot rows sum a single selected value with zeros) and fully
     vectorized: no per-candidate scalar loop anywhere in the kernel.

Output row layout matches refine_kernel.py: (BK, 16) f32 rows
  0 ok | 1 step_s | 2 step_y | 3 step_x | 4 off_s | 5 off_y | 6 off_x |
  7 response | 8 keep | 9.. unused

Requires the fused-pipeline padded DoG layout (rows % 8 == 0,
lanes % 128 == 0, f32); callers gate on that and fall back to the per-step
kernel otherwise.

Why step 1 only: at bench density (tree.jpg tiled to 1080p, octave 0,
27.6k candidates) 72% of candidates converge on step 1; active lanes are
28% / 8.5% / 2.6% / 1.3% on steps 2-5, where the per-candidate kernel's
DMA-level skip is already effective and region sharing among the scattered
survivors would be weak.
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
BK = 16          # candidates per grid block (= max distinct regions/block)
ROWS = 16        # window rows: 8-aligned start + cube rows + <=7 offset
LANES = 256      # window lanes: 128-aligned start + conditional second half
N_FIELDS = 9
FIELD_SLAB = BK * ROWS   # rows per field in the VMEM field bank


def _kernel(blk_active, blk_nslots, pack_ref, s_ref, y_ref, x_ref,
            dog_hbm, out_ref, buf, bank, sem,
            *, contrast_threshold, edge_threshold, scales_per_octave, BK):
    blk = pl.program_id(0)
    base = blk * BK

    # the one-hot extraction matmuls contract over ALL bank rows/lanes, and
    # 0 * non-finite = NaN would poison the selected value — so the bank must
    # never hold uninitialized garbage (field values themselves are
    # sanitized before the write below)
    @pl.when(blk == 0)
    def _():
        bank[:, :] = jnp.zeros((N_FIELDS * FIELD_SLAB, LANES), F32)

    @pl.when(blk_active[blk] == 0)
    def _():
        out_ref[:, :] = jnp.zeros((BK, 16), F32)

    @pl.when(blk_active[blk] > 0)
    def _():
        def copies(k):
            i = base + k
            ys = y_ref[i] - 1
            xs = x_ref[i] - 1
            ys_al = pl.multiple_of((ys // 8) * 8, 8)
            xs_al = pl.multiple_of((xs // 128) * 128, 128)
            slot = pack_ref[i] >> 2
            need2 = (xs - xs_al) + 3 > 128
            c1 = pltpu.make_async_copy(
                dog_hbm.at[pl.ds(s_ref[i] - 1, 3), pl.ds(ys_al, ROWS),
                           pl.ds(xs_al, 128)],
                buf.at[slot, :, :, 0:128], sem.at[k, 0])
            c2 = pltpu.make_async_copy(
                dog_hbm.at[pl.ds(s_ref[i] - 1, 3), pl.ds(ys_al, ROWS),
                           pl.ds(xs_al + 128, 128)],
                buf.at[slot, :, :, 128:256], sem.at[k, 1])
            return c1, c2, need2

        # region DMAs: only candidates with the load bit start one (first of
        # each region in the block + 126/127-lane straddlers); the rest of
        # the region's candidates reuse the slot
        for k in range(BK):
            @pl.when(((pack_ref[base + k] >> 1) & 1) > 0)
            def _(k=k):
                c1, c2, need2 = copies(k)
                c1.start()

                @pl.when(need2)
                def _():
                    c2.start()

        for k in range(BK):
            @pl.when(((pack_ref[base + k] >> 1) & 1) > 0)
            def _(k=k):
                c1, c2, need2 = copies(k)
                c1.wait()

                @pl.when(need2)
                def _():
                    c2.wait()

        # dense Newton solve per loaded slot -> field bank. Cells at window
        # rows 1..8 / lanes 1..128 are the only ones candidates select
        # (8-aligned row start, 128-aligned lane start), and their roll taps
        # stay inside the window, so the wrap rows/lanes are never read.
        for j in range(BK):
            @pl.when(j < blk_nslots[blk])
            def _(j=j):
                rowtap = {}
                for p in range(3):
                    plane = buf[j, p]
                    rowtap[(p, 1)] = plane
                    rowtap[(p, 0)] = pltpu.roll(plane, 1, axis=0)
                    rowtap[(p, 2)] = pltpu.roll(plane, ROWS - 1, axis=0)
                cube = {}
                for p in range(3):
                    for dy in range(3):
                        rt = rowtap[(p, dy)]
                        cube[(p, dy, 1)] = rt
                        cube[(p, dy, 0)] = pltpu.roll(rt, 1, axis=1)
                        cube[(p, dy, 2)] = pltpu.roll(rt, LANES - 1, axis=1)
                f = _newton_cols(
                    cube, contrast_threshold=contrast_threshold,
                    edge_threshold=edge_threshold,
                    scales_per_octave=scales_per_octave)
                fields = [f["ok"].astype(F32), f["step_s"], f["step_y"],
                          f["step_x"], f["off_s"], f["off_y"], f["off_x"],
                          f["response"], f["keep"].astype(F32)]
                for fi, arr in enumerate(fields):
                    # zero non-finite values (inf offsets from singular
                    # Hessians; NaN from unloaded window lanes) so the
                    # extraction matmuls stay exact — non-finite values only
                    # arise on lanes whose ok flag is false, where the caller
                    # never reads the offsets/response (refine_tpu masks by
                    # newly-converged), so semantics match the per-step kernel
                    arr = jnp.where(arr - arr == F32(0.0), arr, F32(0.0))
                    r0 = fi * FIELD_SLAB + j * ROWS
                    bank[r0:r0 + ROWS, :] = arr

        # one-hot extraction: row-select matmul over the bank's sublanes,
        # lane-select matmul, then a diagonal sum — all vector/MXU ops,
        # exact because each one-hot row sums one selected value with zeros
        i_slab = jax.lax.broadcasted_iota(I32, (FIELD_SLAB, BK), 0)
        i_lane = jax.lax.broadcasted_iota(I32, (LANES, BK), 0)
        kcol = jax.lax.broadcasted_iota(I32, (FIELD_SLAB, BK), 1)
        kcol_l = jax.lax.broadcasted_iota(I32, (LANES, BK), 1)
        Rt = jnp.zeros((FIELD_SLAB, BK), F32)
        C = jnp.zeros((LANES, BK), F32)
        for k in range(BK):
            i = base + k
            slot = pack_ref[i] >> 2
            sel = slot * ROWS + (y_ref[i] - 1) % 8 + 1
            co = (x_ref[i] - 1) % 128 + 1
            Rt = Rt + jnp.where((i_slab == sel) & (kcol == k), F32(1.0),
                                F32(0.0))
            C = C + jnp.where((i_lane == co) & (kcol_l == k), F32(1.0),
                              F32(0.0))

        diag = (jax.lax.broadcasted_iota(I32, (BK, BK), 0)
                == jax.lax.broadcasted_iota(I32, (BK, BK), 1))
        olane = jax.lax.broadcasted_iota(I32, (BK, 16), 1)
        out = jnp.zeros((BK, 16), F32)
        for fi in range(N_FIELDS):
            Ff = bank[fi * FIELD_SLAB:(fi + 1) * FIELD_SLAB, :]
            # precision=HIGHEST: default-precision f32 dots run one
            # bf16x bf16 MXU pass on hardware, rounding extracted field
            # values to 8 mantissa bits (measured ~1e-3 drift vs the XLA
            # reference). One-hot operands make the multi-pass split exact.
            D = jax.lax.dot_general(Rt, Ff, (((0,), (0,)), ((), ())),
                                    preferred_element_type=F32,
                                    precision=jax.lax.Precision.HIGHEST)
            E = jax.lax.dot_general(D, C, (((1,), (0,)), ((), ())),
                                    preferred_element_type=F32,
                                    precision=jax.lax.Precision.HIGHEST)
            colf = jnp.sum(jnp.where(diag, E, F32(0.0)), axis=1,
                           keepdims=True)
            out = out + jnp.where(olane == fi, colf, F32(0.0))
        out_ref[:, :] = out


@functools.partial(jax.jit, static_argnums=(6, 7))
def _region_call(blk_active, blk_nslots, pack, s, y, x,
                 cfg: SiftConfig, interpret, dog_padded):
    nb = blk_active.shape[0]
    kernel = functools.partial(
        _kernel, contrast_threshold=cfg.contrast_threshold,
        edge_threshold=cfg.edge_threshold,
        scales_per_octave=cfg.scales_per_octave, BK=BK)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(nb,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((BK, 16), lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((BK, 3, ROWS, LANES), jnp.float32),
            pltpu.VMEM((N_FIELDS * FIELD_SLAB, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((BK, 2)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb * BK, 16), jnp.float32),
        interpret=interpret,
    )(blk_active, blk_nslots, pack, s, y, x, dog_padded)


def refine_step_region(dog_padded: jnp.ndarray, s, y, x, active,
                       w_pad: int, cfg: SiftConfig = DEFAULT_CONFIG,
                       interpret: bool = False):
    """One Newton step for all candidates, region-grouped. Same contract as
    refine_kernel.refine_step_pallas: dog_padded (S_tot, Hp, Wp) f32 with
    Hp % 8 == 0 and Wp % 128 == 0 (fused padded layout); s already
    plane-offset; y/x in PADDED coords; active (K,) int32. Returns (K, 16)
    f32 rows in the ORIGINAL candidate order."""
    assert dog_padded.dtype == jnp.float32
    S_tot, Hp, Wp = dog_padded.shape
    K = s.shape[0]

    s_c = jnp.clip(s, 1, S_tot - 2).astype(I32)
    y_c = jnp.clip(y, 1, Hp - ROWS).astype(I32)
    x_c = jnp.clip(x, 1, Wp - 2).astype(I32)
    act = active.astype(I32)

    NRY = Hp // 8
    NRX = Wp // 128
    key = (s_c * NRY + (y_c - 1) // 8) * NRX + (x_c - 1) // 128
    SENT = S_tot * NRY * NRX
    key = jnp.where(act > 0, key, SENT)

    perm = jnp.argsort(key, stable=True)       # dead lanes sort to the end
    inv_perm = jnp.argsort(perm, stable=True)
    sp, yp, xp, ap = s_c[perm], y_c[perm], x_c[perm], act[perm]
    keyp = key[perm]

    nb = -(-K // BK)
    padn = nb * BK - K

    def pad1(a, val):
        return jnp.pad(a, (0, padn), constant_values=val)

    sp, yp, xp = pad1(sp, 1), pad1(yp, 1), pad1(xp, 1)
    ap, keyp = pad1(ap, 0), pad1(keyp, SENT)

    idx = jnp.arange(nb * BK, dtype=I32)
    blockstart = (idx % BK) == 0
    keychange = jnp.concatenate(
        [jnp.ones((1,), bool), keyp[1:] != keyp[:-1]])
    straddle = ((xp - 1) % 128) >= 126
    load = (blockstart | keychange | straddle) & (ap > 0)
    slot = jnp.clip(
        jnp.cumsum(load.astype(I32).reshape(nb, BK), axis=1).reshape(-1) - 1,
        0, BK - 1)
    pack = ap + load.astype(I32) * 2 + slot * 4
    blk_nslots = jnp.sum(load.astype(I32).reshape(nb, BK), axis=1)
    blk_active = jnp.sum(ap.reshape(nb, BK), axis=1)

    # SMEM scalar-prefetch budget: chunk like refine_tpu (block-aligned)
    CHUNK = 32768
    if nb * BK <= CHUNK:
        out_p = _region_call(blk_active, blk_nslots, pack, sp, yp, xp,
                             cfg, interpret, dog_padded)
    else:
        outs = []
        for t0 in range(0, nb * BK, CHUNK):
            t1 = min(t0 + CHUNK, nb * BK)
            b0, b1 = t0 // BK, t1 // BK
            outs.append(_region_call(
                blk_active[b0:b1], blk_nslots[b0:b1], pack[t0:t1],
                sp[t0:t1], yp[t0:t1], xp[t0:t1], cfg, interpret,
                dog_padded))
        out_p = jnp.concatenate(outs, axis=0)

    return out_p[:K][inv_perm]
