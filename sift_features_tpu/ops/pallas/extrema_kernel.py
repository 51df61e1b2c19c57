"""Pallas TPU kernel: fused DoG extrema mask + bit-packing.

Replaces the reduce_window extrema_mask + boolean-mask compaction front end
on TPU: each grid step DMAs a row strip of all 5 DoG planes once, computes
the 26-neighbor extremum test (3x3x3 max/min via sublane/lane rolls —
reference point_is_local_extremum, lib.rs:437-506, ties allowed, |v|>0
prefilter quirk) for the 3 detection scales in VMEM, and PACKS the boolean
mask into int32 words on the MXU: two matmuls against a block-diagonal
0/2^j selector (16-bit halves — exact in f32) produce the lo/hi half-words,
combined to int32 in-register. The mask leaves the kernel 32x smaller than
a bool field (3.5 MB vs 113 MB f32 at 1080p octave 0), and candidate
compaction then runs entirely on the packed words
(utils.compact.compact_words).

Word order: word (s, y, w) covers columns [32w, 32w+32) of padded row y,
bit j = column 32w+j — identical to the row-major ravel of the padded
(3, H_pad, W_pad) mask, so candidate emission order is unchanged.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...config import SiftConfig

F32 = jnp.float32
TILE = 64       # mask rows per grid step (VMEM: ~10 live strip arrays)
LB_MAX = 1024   # lane-block width (Mosaic crashes on >=2048-lane roll chains)
LHALO = 128     # lane halo per side when lane-blocked


def _sel_matrix(lb: int) -> np.ndarray:
    """(4*lb, lb/32) f32 selector stack: slab b (rows b*lb..b*lb+lb) maps
    lane l to column l//32 with weight 2^(l%16-8b) for lanes with
    l%32 in [8b, 8b+8) — i.e. one matmul per BYTE of the packed word. Byte
    sums are <= 255 (exact under any MXU precision), and the four (TILE, nw)
    results are combined without any lane-offset slicing (non-128-aligned
    lane slices of matmul outputs were measured lossy on this backend)."""
    nw = lb // 32
    sel = np.zeros((4, lb, nw), np.float32)
    for l in range(lb):
        w, b, j = l // 32, (l % 32) // 8, l % 8
        sel[b, l, w] = float(2 ** j)
    return sel.reshape(4 * lb, nw)


def _roll2(x, sub, lane, r0, wb):
    if sub:
        x = pltpu.roll(x, sub % r0, axis=0)
    if lane:
        x = pltpu.roll(x, lane % wb, axis=1)
    return x


def _kernel(dog_hbm, sel_ref, out_ref, buf, sem, *, n_planes, h_pad, w_pad,
            lb, lhalo, bounds, n_scales, batched=False, al=8):
    if batched:                   # leading frame grid dim (B, ni, nj)
        f = pl.program_id(0)
        i = pl.program_id(1)
        j = pl.program_id(2)
    else:
        i = pl.program_id(0)
        j = pl.program_id(1)
    wb = lb + 2 * lhalo
    r0 = TILE + 2 * al

    start = jnp.clip(i * TILE - al, 0, h_pad - r0)
    start = pl.multiple_of((start // al) * al, al)
    lstart = jnp.clip(j * lb - lhalo, 0, w_pad - wb)
    lstart = pl.multiple_of((lstart // 128) * 128, 128)

    def src(p):
        if batched:
            return dog_hbm.at[f, p, pl.ds(start, r0), pl.ds(lstart, wb)]
        return dog_hbm.at[p, pl.ds(start, r0), pl.ds(lstart, wb)]

    for p in range(n_planes):
        pltpu.make_async_copy(src(p), buf.at[p], sem.at[p]).start()

    # logical (mask row i*TILE - 1 + q, lane j*lb - lhalo + c) -> (q, c)
    rofs = (i * TILE - 1) - start
    lofs = (j * lb - lhalo) - lstart
    planes = []
    for p in range(n_planes):
        pltpu.make_async_copy(src(p), buf.at[p], sem.at[p]).wait()
        x = pltpu.roll(buf[p].astype(F32), jnp.mod(-rofs, jnp.int32(r0)),
                       axis=0)
        x = pltpu.roll(x, jnp.mod(-lofs, jnp.int32(wb)), axis=1)
        planes.append(x)

    # 3x3 per-plane max/min (rolls wrap at strip edges; wrapped values only
    # reach rows/cols outside the scan bounds, masked below)
    def m3(x, op):
        c = op(op(_roll2(x, 1, 0, r0, wb), x), _roll2(x, -1, 0, r0, wb))
        return op(op(_roll2(c, 0, 1, r0, wb), c), _roll2(c, 0, -1, r0, wb))

    mx3 = [m3(p, jnp.maximum) for p in planes]
    mn3 = [m3(p, jnp.minimum) for p in planes]

    y0, y1, x0, x1 = bounds
    ys = jax.lax.broadcasted_iota(jnp.int32, (TILE, lb), 0) + i * TILE
    xs = jax.lax.broadcasted_iota(jnp.int32, (TILE, lb), 1) + j * lb
    inb = (ys >= y0) & (ys < y1) & (xs >= x0) & (xs < x1)

    sel = sel_ref[:, :]
    for s in range(1, n_scales + 1):
        v = planes[s][1:1 + TILE, lhalo:lhalo + lb]
        mx = jnp.maximum(jnp.maximum(mx3[s - 1], mx3[s]), mx3[s + 1])
        mn = jnp.minimum(jnp.minimum(mn3[s - 1], mn3[s]), mn3[s + 1])
        mx = mx[1:1 + TILE, lhalo:lhalo + lb]
        mn = mn[1:1 + TILE, lhalo:lhalo + lb]
        m = (((v > 0.0) & (v >= mx)) | ((v < 0.0) & (v <= mn))) & inb
        mf = m.astype(F32)
        words = None
        for byte in range(4):
            part = jax.lax.dot(mf, sel[byte * lb:(byte + 1) * lb, :],
                               preferred_element_type=F32)   # (TILE, lb/32)
            part = part.astype(jnp.int32) << (8 * byte)
            words = part if words is None else words | part
        if batched:
            out_ref[0, s - 1, :, :] = words
        else:
            out_ref[s - 1, :, :] = words


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def extrema_words(dog_padded: jnp.ndarray, bounds: tuple, n_scales: int = 3,
                  interpret: bool = False) -> jnp.ndarray:
    """dog_padded: (S+2, H_pad, W_pad) f32 padded DoG stack
    (H_pad % TILE == 0, W_pad % 128 == 0; W_pad % LB_MAX == 0 when
    W_pad > 1536). bounds = (y0, y1, x0, x1) padded-coordinate scan range.

    Returns (n_scales, H_pad, W_pad // 32) int32 packed extremum masks,
    bit (y, 32w+j) = mask at padded (y, 32w+j)."""
    n_planes, h_pad, w_pad = dog_padded.shape
    if w_pad > 1536:
        lb, lhalo = LB_MAX, LHALO
        assert w_pad % LB_MAX == 0, w_pad
    else:
        lb, lhalo = w_pad, 0
    nj = w_pad // lb
    ni = h_pad // TILE
    nw = lb // 32

    al = 16 if dog_padded.dtype == jnp.bfloat16 else 8
    kernel = functools.partial(
        _kernel, n_planes=n_planes, h_pad=h_pad, w_pad=w_pad, lb=lb,
        lhalo=lhalo, bounds=tuple(int(b) for b in bounds), n_scales=n_scales,
        al=al)

    out = pl.pallas_call(
        kernel,
        grid=(ni, nj),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],   # selector
        out_specs=pl.BlockSpec((n_scales, TILE, nw),
                               lambda i, j: (0, i * nj + j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_scales, ni * nj * TILE, nw),
                                       jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((n_planes, TILE + 2 * al, lb + 2 * lhalo),
                       dog_padded.dtype),
            pltpu.SemaphoreType.DMA((n_planes,)),
        ],
        interpret=interpret,
    )(dog_padded, jnp.asarray(_sel_matrix(lb)))

    # (ni*nj*TILE, nw) row blocks -> logical (H_pad, W_pad/32) word rows
    out = out.reshape(n_scales, ni, nj, TILE, nw).swapaxes(2, 3)
    return out.reshape(n_scales, h_pad, w_pad // 32)


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def extrema_words_batched(dog_padded: jnp.ndarray, bounds: tuple,
                          n_scales: int = 3,
                          interpret: bool = False) -> jnp.ndarray:
    """Batched extrema_words: (B, S+2, H_pad, W_pad) ->
    (B, n_scales, H_pad, W_pad // 32); one launch covers all frames."""
    batch, n_planes, h_pad, w_pad = dog_padded.shape
    if w_pad > 1536:
        lb, lhalo = LB_MAX, LHALO
        assert w_pad % LB_MAX == 0, w_pad
    else:
        lb, lhalo = w_pad, 0
    nj = w_pad // lb
    ni = h_pad // TILE
    nw = lb // 32

    al = 16 if dog_padded.dtype == jnp.bfloat16 else 8
    kernel = functools.partial(
        _kernel, n_planes=n_planes, h_pad=h_pad, w_pad=w_pad, lb=lb,
        lhalo=lhalo, bounds=tuple(int(b) for b in bounds),
        n_scales=n_scales, batched=True, al=al)

    out = pl.pallas_call(
        kernel,
        grid=(batch, ni, nj),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],   # selector
        out_specs=pl.BlockSpec((1, n_scales, TILE, nw),
                               lambda f, i, j: (f, 0, i * nj + j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((batch, n_scales, ni * nj * TILE, nw),
                                       jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((n_planes, TILE + 2 * al, lb + 2 * lhalo),
                       dog_padded.dtype),
            pltpu.SemaphoreType.DMA((n_planes,)),
        ],
        interpret=interpret,
    )(dog_padded, jnp.asarray(_sel_matrix(lb)))

    out = out.reshape(batch, n_scales, ni, nj, TILE, nw).swapaxes(3, 4)
    return out.reshape(batch, n_scales, h_pad, w_pad // 32)
