"""Pallas TPU kernel: one masked Newton-refinement step over a candidate
batch (reference interpolate_extremum, lib.rs:508-603).

The XLA path gathers (K, 3, 3, 3) DoG cubes per step; on TPU that gather is
quasi-serial (measured 26 ms for 32k candidates at 1080p). Here each grid
step DMAs its candidates' cube neighborhoods HBM->VMEM (tile-aligned
(3, 8, 128) row-tiles — the second 128-lane half and second row-tile are
fetched only when the cube actually straddles those boundaries (~2% / ~25%),
all of a block's copies in flight together), extracts the 27 cube values
via rolls + (1,1) slices into
a (BK, 32) VMEM matrix, and solves the 3x3 Newton system VECTORIZED over
the block. Candidate positions arrive as scalar prefetch; the surrounding
lax loop (ops.extrema.refine_tpu) feeds each step's updated positions back
in, skips blocks whose candidates have all converged/died via a per-block
active-count prefetch, and skips individual converged/dead candidates'
DMAs via a per-candidate active prefetch.

Output row layout (BK, 16) f32:
  0 ok | 1 step_s | 2 step_y | 3 step_x | 4 off_s | 5 off_y | 6 off_x |
  7 response | 8 keep | 9.. unused
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
BK = 16          # candidates per grid step: small blocks keep the
                 # convergence skip fine-grained (BK=64 measured SLOWER: nearly
                 # every block then contains an active lane in steps 2-5)
BK_INTERPRET = 16  # small blocks keep interpret-mode tests tractable
ROWS = 16        # f32: 8-aligned rows covering 3 cube rows + <=7 shift
ROWS_BF16 = 32   # bf16: 16-aligned rows + <=15 shift
LANES_DMA = 256  # 128-aligned lanes covering 3 cube cols + <=127 shift


def _kernel(active_ref, s_ref, y_ref, x_ref, cand_ref, dog_hbm, out_ref, buf,
            sem, *, contrast_threshold, edge_threshold, scales_per_octave,
            w_pad, BK, n_rows=ROWS, al=8):
    blk = pl.program_id(0)
    base = blk * BK

    half = n_rows // 2   # one HBM row tile (8 rows f32 / 16 rows bf16)

    def copies(k):
        # conditional DMA quarters: the 3-lane cube straddles a 128-lane
        # boundary only when its first lane lands on offset >= 126 (~2%),
        # and the 3-row cube straddles a row-tile boundary only when its
        # first row lands on tile offset > half-3 (~25% f32) — so the
        # typical fetch is ONE (3, half, 128) tile instead of (3, 2*half,
        # 256): ~1.6x fewer refine bytes at bench density.
        i = base + k
        ys = y_ref[i] - 1
        xs = x_ref[i] - 1
        ys_al = pl.multiple_of((ys // al) * al, al)
        xs_al = pl.multiple_of((xs // 128) * 128, 128)
        need_l2 = (xs - xs_al) + 3 > 128
        need_r2 = (ys - ys_al) + 3 > half
        cs = []
        for ri in range(2):
            for li in range(2):
                cs.append(pltpu.make_async_copy(
                    dog_hbm.at[pl.ds(s_ref[i] - 1, 3),
                               pl.ds(ys_al + ri * half, half),
                               pl.ds(xs_al + li * 128, 128)],
                    buf.at[k, :, ri * half:(ri + 1) * half,
                           li * 128:(li + 1) * 128],
                    sem.at[k, ri * 2 + li]))
        return cs, need_r2, need_l2

    def _dma(k, op):
        cs, need_r2, need_l2 = copies(k)
        op(cs[0])

        @pl.when(need_l2)
        def _():
            op(cs[1])

        @pl.when(need_r2)
        def _():
            op(cs[2])

        @pl.when(need_r2 & need_l2)
        def _():
            op(cs[3])

    def dma_start(k):
        _dma(k, lambda c: c.start())

    def dma_wait(k):
        _dma(k, lambda c: c.wait())

    @pl.when(active_ref[blk] > 0)
    def _():
        # per-candidate DMA skip: converged/dead lanes (active 0) keep stale
        # buffer contents; their outputs are discarded by the caller's masks
        for k in range(BK):
            @pl.when(cand_ref[base + k] > 0)
            def _(k=k):
                dma_start(k)
        for k in range(BK):
            @pl.when(cand_ref[base + k] > 0)
            def _(k=k):
                dma_wait(k)
        # extract cubes -> M (BK, 32): scalar-reduce each cube value and
        # scatter it into its lane via one-hot fma (multi-offset concats are
        # not lowerable on Mosaic)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 32), 1)
        rows = []
        for k in range(BK):
            i = base + k
            ys = y_ref[i] - 1
            xs = x_ref[i] - 1
            ro = ys - (ys // al) * al
            co = xs - (xs // 128) * 128
            row = jnp.zeros((1, 32), F32)
            j = 0
            for ds in range(3):
                plane = pltpu.roll(buf[k, ds].astype(F32),
                                   jax.lax.rem(n_rows - ro, jnp.int32(n_rows)), axis=0)
                plane = pltpu.roll(plane,
                                   jax.lax.rem(LANES_DMA - co, jnp.int32(LANES_DMA)),
                                   axis=1)
                for dy in range(3):
                    for dx in range(3):
                        v = jnp.sum(plane[dy:dy + 1, dx:dx + 1])
                        row = row + jnp.where(lane == j, v, F32(0.0))
                        j += 1
            rows.append(row)
        subl = jax.lax.broadcasted_iota(jnp.int32, (BK, 1), 0)
        M = jnp.zeros((BK, 32), F32)
        for k, row in enumerate(rows):
            M = M + jnp.where(subl == k, row, F32(0.0))    # (BK,1)&(1,32) bcast

        def c(ds, dy, dx):
            j = (ds * 3 + dy) * 3 + dx
            return M[:, j:j + 1]                           # (BK, 1)

        two = F32(2.0)
        four = F32(4.0)
        v = c(1, 1, 1)
        v2 = v * two
        g1 = (c(2, 1, 1) - c(0, 1, 1)) / two
        g2 = (c(1, 2, 1) - c(1, 0, 1)) / two
        g3 = (c(1, 1, 2) - c(1, 1, 0)) / two
        h11 = c(2, 1, 1) + c(0, 1, 1) - v2
        h12 = (c(2, 2, 1) - c(2, 0, 1) - c(0, 2, 1) + c(0, 0, 1)) / four
        h13 = (c(2, 1, 2) - c(2, 1, 0) - c(0, 1, 2) + c(0, 1, 0)) / four
        h22 = c(1, 2, 1) + c(1, 0, 1) - v2
        h33 = c(1, 1, 2) + c(1, 1, 0) - v2
        h23 = (c(1, 2, 2) - c(1, 2, 0) - c(1, 0, 2) + c(1, 0, 0)) / four

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

        cols = [ok.astype(F32), step_s, step_y, step_x, off_s, off_y, off_x,
                jnp.abs(contrast), (keep_c & ~on_edge).astype(F32)]
        olane = jax.lax.broadcasted_iota(jnp.int32, (1, 16), 1)
        out = jnp.zeros((BK, 16), F32)
        for j, col in enumerate(cols):                      # (BK,1)x(1,16)
            out = out + jnp.where(olane == j, col, F32(0.0))
        out_ref[:, :] = out

    @pl.when(active_ref[blk] == 0)
    def _():
        out_ref[:, :] = jnp.zeros((BK, 16), F32)


@functools.partial(jax.jit, static_argnums=(5, 6, 7))
def refine_step_pallas(dog_padded, s, y, x, active, w_pad: int,
                       cfg: SiftConfig = DEFAULT_CONFIG,
                       interpret: bool = False):
    """One Newton step for all candidates. dog_padded: (S+2, H+2P, W+2P) f32
    with the SAME padding as the Gaussian stack (pad >= 9 rows / lane budget
    per pad_stack_for_kernels). s/y/x: (K,) int32 positions in PADDED
    coordinates (i.e. unpadded + P). active: (K,) int32 (1 = evaluate).
    Returns (K, 16) f32 per-candidate row (layout in module docstring)."""
    K = s.shape[0]
    BK = BK_INTERPRET if interpret else globals()["BK"]
    nb = -(-K // BK)
    padn = nb * BK - K

    def pad1(a, val=0):
        return jnp.pad(a, (0, padn), constant_values=val)

    blk_active = jnp.sum(pad1(active).reshape(nb, BK), axis=1,
                         dtype=jnp.int32)

    bf16 = dog_padded.dtype == jnp.bfloat16
    rows = ROWS_BF16 if bf16 else ROWS
    kernel = functools.partial(
        _kernel, contrast_threshold=cfg.contrast_threshold,
        edge_threshold=cfg.edge_threshold,
        scales_per_octave=cfg.scales_per_octave, w_pad=w_pad, BK=BK,
        n_rows=rows, al=16 if bf16 else 8)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,   # blk_active, s, y, x, per-candidate active
        grid=(nb,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((BK, 16), lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((BK, 3, rows, LANES_DMA), dog_padded.dtype),
            pltpu.SemaphoreType.DMA((BK, 4)),
        ],
    )

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb * BK, 16), jnp.float32),
        interpret=interpret,
    )(blk_active,
      pad1(jnp.clip(s, 1, dog_padded.shape[0] - 2)).astype(jnp.int32),
      # row clamp keeps the aligned row DMA in-bounds even for dead lanes
      pad1(jnp.clip(y, 1, dog_padded.shape[1] - rows)).astype(jnp.int32),
      pad1(jnp.clip(x, 1, dog_padded.shape[2] - 2)).astype(jnp.int32),
      pad1(active).astype(jnp.int32),
      dog_padded)
    return out[:K]
