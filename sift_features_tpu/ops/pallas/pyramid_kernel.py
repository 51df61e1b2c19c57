"""Pallas TPU kernels: fused Gaussian pyramid + DoG construction.

The XLA path runs each blur as two tap-sum passes over reflect-padded
copies, then subtracts DoG and re-pads the stack for the window kernels —
at this device's measured ~50 GB/s effective HBM bandwidth those extra
full-image passes dominate the pyramid cost. Here each level is ONE fused
kernel: a row strip of the previous level is DMA'd once, the horizontal +
vertical tap sums AND the DoG slice are computed in VMEM, and both land
directly in the PADDED layout the window kernels consume — the separate
pad and DoG passes vanish, and Gaussian levels 0/4/5 (whose only consumer
is the DoG) are never written to HBM at all.

Storage layout produced per octave (build_octave_padded):
  gauss slots (5, H_pad, W_pad) = [L1, L2, L3, L4, L5]  (window kernels
    index Gaussian level s at slot s-1; L4/L5 slots are chain scratch)
  dog   slots (5, H_pad, W_pad) = [D0..D4], D_k = L_{k+1} - L_k

Border semantics: the octave base is reflect-101 pre-extended into its pad
ring once (reflect_pad_image); deeper levels inherit correct pad values
inductively (blur o reflect-ext == reflect-ext o blur for symmetric
kernels, within the taps' reach). Strip-edge tap wrap (rolls) only poisons
outermost pad rows/cols no consumer reads. Tap order is ascending,
matching ops.gaussian on the interior. Reference semantics:
build_gaussian_scale_space / build_dog (lib.rs:213-279).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...config import SiftConfig
from ..gaussian import cv_ksize, gaussian_kernel

F32 = jnp.float32
TILE = 64       # output rows per grid step
LB_MAX = 1024   # lane-block width (Mosaic crashes on >=2048-lane roll chains)
LHALO = 128     # lane halo per side when lane-blocked


def _blur_strip(x, taps, r0, wb):
    """Fused H+V tap sums on an (r0, wb) strip (ascending tap order)."""
    r = len(taps) // 2
    hsum = None
    for j, t in enumerate(taps):
        sh = (r - j) % wb                 # out[c] += t * x[c + j - r]
        term = F32(t) * pltpu.roll(x, sh, axis=1)
        hsum = term if hsum is None else hsum + term
    vsum = None
    for j, t in enumerate(taps):
        sh = (r - j) % r0
        term = F32(t) * pltpu.roll(hsum, sh, axis=0)
        vsum = term if vsum is None else vsum + term
    return vsum


def _kernel(*refs, taps, halo8, h_pad, w_pad, src_slot, lb, lhalo,
            batched=False, al=8, has_g16=False):
    g16_ref = None
    if src_slot is None:          # first level: (base_in, g_out, d_out, ...)
        if has_g16:
            in_hbm, gauss_ref, dog_ref, g16_ref, buf, sem = refs
        else:
            in_hbm, gauss_ref, dog_ref, buf, sem = refs
    else:                         # aliased: (g_in, d_in, g_out, d_out, ...)
        if has_g16:
            in_hbm, _d_in, _g16_in, gauss_ref, dog_ref, g16_ref, buf, sem = refs
        else:
            in_hbm, _d_in, gauss_ref, dog_ref, buf, sem = refs
    if batched:                   # leading frame grid dim (B, nb, nlb)
        f = pl.program_id(0)
        i = pl.program_id(1)
        j = pl.program_id(2)
    else:
        i = pl.program_id(0)
        j = pl.program_id(1)
    r0 = TILE + 2 * halo8
    wb = lb + 2 * lhalo

    start = jnp.clip(i * TILE - halo8, 0, h_pad - r0)
    start = pl.multiple_of((start // al) * al, al)
    lstart = jnp.clip(j * lb - lhalo, 0, w_pad - wb)
    lstart = pl.multiple_of((lstart // 128) * 128, 128)
    if batched:
        if src_slot is None:
            src = in_hbm.at[f, pl.ds(start, r0), pl.ds(lstart, wb)]
        else:
            src = in_hbm.at[f, src_slot, pl.ds(start, r0), pl.ds(lstart, wb)]
    elif src_slot is None:
        src = in_hbm.at[pl.ds(start, r0), pl.ds(lstart, wb)]
    else:
        src = in_hbm.at[src_slot, pl.ds(start, r0), pl.ds(lstart, wb)]
    cp = pltpu.make_async_copy(src, buf, sem)
    cp.start()
    cp.wait()

    # align buffer so logical (row i*TILE - halo8 + q, lane j*lb - lhalo + c)
    # sits at (q, c); tap math always runs in f32 (bf16 is a STORAGE mode)
    ofs = (i * TILE - halo8) - start          # in [-halo8, +halo8]
    x = pltpu.roll(buf[:, :].astype(F32), jnp.mod(-ofs, jnp.int32(r0)), axis=0)
    lofs = (j * lb - lhalo) - lstart
    x = pltpu.roll(x, jnp.mod(-lofs, jnp.int32(wb)), axis=1)

    out = _blur_strip(x, taps, r0, wb)
    rows = out[halo8:halo8 + TILE, lhalo:lhalo + lb]
    # dog keeps its own dtype: the "split" storage mode stores the Gaussian
    # stack bf16 (window-stage reads) but the DoG f32 (everything Newton
    # refinement reads), computed from the UNROUNDED f32 blur result
    dog = (rows - x[halo8:halo8 + TILE, lhalo:lhalo + lb]).astype(
        dog_ref.dtype)
    rows = rows.astype(gauss_ref.dtype)
    if batched:
        gauss_ref[0, 0, :, :] = rows
        dog_ref[0, 0, :, :] = dog
        if g16_ref is not None:   # bf16 window-gather copy (levels 1-3)
            g16_ref[0, 0, :, :] = rows.astype(jnp.bfloat16)
    else:
        gauss_ref[0, :, :] = rows
        dog_ref[0, :, :] = dog
        if g16_ref is not None:
            g16_ref[0, :, :] = rows.astype(jnp.bfloat16)


def _call_level(src, dst_slot: int, sigma: float, h_pad: int, w_pad: int,
                n_slots: int, gd: tuple | None, interpret: bool,
                batch: int | None = None, gather16: bool = False,
                n_g16: int = 3, g_dtype=None, dog_dtype=None):
    """One blur level. src: base image (h_pad, w_pad) when gd is None (first
    level; allocates the slot stacks), else reads gd[0][dst_slot-1]. Writes
    gauss slot dst_slot and dog slot dst_slot in place (aliased). With
    `batch`, arrays carry a leading frame dim (B, ...) and the grid gains a
    frame axis — one launch covers the whole batch.

    g_dtype/dog_dtype override the two output stacks' storage dtypes (the
    "split" mode stores gauss bf16 / dog f32); tap arithmetic is f32 either
    way. Defaults: both follow the input dtype."""
    taps = tuple(float(t) for t in gaussian_kernel(sigma, cv_ksize(sigma)))
    dtype = (src if gd is None else gd[0]).dtype
    g_dtype = dtype if g_dtype is None else g_dtype
    dog_dtype = g_dtype if dog_dtype is None else dog_dtype
    al = 16 if dtype == jnp.bfloat16 else 8   # bf16 tiles are 16 sublanes
    halo8 = -(-(len(taps) // 2) // al) * al
    nb = h_pad // TILE
    if w_pad > 1536:  # single-block roll chains crash Mosaic at >=2048 lanes
        lb, lhalo = LB_MAX, LHALO
        assert w_pad % LB_MAX == 0, w_pad
    else:
        lb, lhalo = w_pad, 0
    nlb = w_pad // lb
    has_g16 = gather16 and dst_slot < n_g16
    kernel = functools.partial(
        _kernel, taps=taps, halo8=halo8, h_pad=h_pad, w_pad=w_pad,
        src_slot=None if gd is None else dst_slot - 1, lb=lb, lhalo=lhalo,
        batched=batch is not None, al=al, has_g16=has_g16)

    if batch is None:
        grid = (nb, nlb)
        blk = pl.BlockSpec((1, TILE, lb), lambda i, j: (dst_slot, i, j),
                           memory_space=pltpu.VMEM)
        out_shape = [jax.ShapeDtypeStruct((n_slots, h_pad, w_pad), g_dtype),
                     jax.ShapeDtypeStruct((n_slots, h_pad, w_pad),
                                          dog_dtype)]
        if has_g16:
            out_shape.append(jax.ShapeDtypeStruct(
                (n_g16, h_pad, w_pad), jnp.bfloat16))
    else:
        grid = (batch, nb, nlb)
        blk = pl.BlockSpec((1, 1, TILE, lb),
                           lambda f, i, j: (f, dst_slot, i, j),
                           memory_space=pltpu.VMEM)
        out_shape = [jax.ShapeDtypeStruct((batch, n_slots, h_pad, w_pad),
                                          g_dtype),
                     jax.ShapeDtypeStruct((batch, n_slots, h_pad, w_pad),
                                          dog_dtype)]
        if has_g16:
            out_shape.append(jax.ShapeDtypeStruct(
                (batch, n_g16, h_pad, w_pad), jnp.bfloat16))
    outs = [blk] * len(out_shape)
    scratch = [pltpu.VMEM((TILE + 2 * halo8, lb + 2 * lhalo), dtype),
               pltpu.SemaphoreType.DMA]
    if gd is None:
        return pl.pallas_call(
            kernel, grid=grid,
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=outs, out_shape=out_shape,
            scratch_shapes=scratch, interpret=interpret)(src)
    if has_g16:
        g, d, g16 = gd
        return pl.pallas_call(
            kernel, grid=grid,
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3,
            out_specs=outs, out_shape=out_shape,
            scratch_shapes=scratch,
            input_output_aliases={0: 0, 1: 1, 2: 2},
            interpret=interpret)(g, d, g16)
    g, d = gd[:2]
    return pl.pallas_call(
        kernel, grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=outs, out_shape=out_shape,
        scratch_shapes=scratch,
        input_output_aliases={0: 0, 1: 1},
        interpret=interpret)(g, d)


def build_octave_padded(base_padded: jnp.ndarray, cfg: SiftConfig,
                        interpret: bool = False):
    """base_padded: (H_pad, W_pad) f32 octave base (Gaussian level 0) with a
    reflect-extended pad ring, H_pad % 128 == 0, W_pad % 128 == 0. Returns
    (gauss_slots, dog) both (5, H_pad, W_pad): gauss_slots[k] = level k+1,
    dog[k] = level_{k+1} - level_k."""
    h_pad, w_pad = base_padded.shape
    sigmas = cfg.octave_sigmas()
    n_slots = len(sigmas) - 1
    gd = None
    for k, sigma in enumerate(sigmas[1:]):
        if gd is None:
            # level 1 reads the base image; dog_0 = L1 - base
            g, d = _call_level(base_padded, 0, sigma, h_pad, w_pad, n_slots,
                               None, interpret)
        else:
            g, d = _call_level(None, k, sigma, h_pad, w_pad, n_slots, gd,
                               interpret)
        gd = (g, d)
    return gd


def build_octave_padded_batched(base_padded: jnp.ndarray, cfg: SiftConfig,
                                interpret: bool = False,
                                gather16: bool = False,
                                split: bool = False):
    """Batched build_octave_padded: base_padded (B, H_pad, W_pad) ->
    (gauss_slots, dog, g16) with gauss/dog (B, 5, H_pad, W_pad) and g16 a
    (B, 3, H_pad, W_pad) bf16 window-gather copy of levels 1-3 when
    `gather16` (else None). One kernel launch per level covers the whole
    frame batch (frame axis on the grid).

    split (storage_dtype="split"): the Gaussian stack is STORED bf16 (what
    the blur chain re-reads and the window kernels sample) while the DoG is
    stored f32 from the unrounded f32 tap sums — Newton refinement reads
    exactly what an f32 chain seeded with the same base would produce up to
    the bf16 rounding of the chain inputs, and stays on the walk/tile
    kernels (which require f32 DoG). Mutually exclusive with gather16."""
    batch, h_pad, w_pad = base_padded.shape
    sigmas = cfg.octave_sigmas()
    n_slots = len(sigmas) - 1
    assert not (split and gather16)
    g_dtype = jnp.bfloat16 if split else None
    dog_dtype = jnp.float32 if split else None
    gd = None
    g16 = None
    for k, sigma in enumerate(sigmas[1:]):
        has16 = gather16 and k < 3
        if gd is None:
            res = _call_level(base_padded, 0, sigma, h_pad, w_pad, n_slots,
                              None, interpret, batch=batch, gather16=gather16,
                              g_dtype=g_dtype, dog_dtype=dog_dtype)
        elif has16:
            res = _call_level(None, k, sigma, h_pad, w_pad, n_slots,
                              (gd[0], gd[1], g16), interpret, batch=batch,
                              gather16=gather16)
        else:
            res = _call_level(None, k, sigma, h_pad, w_pad, n_slots, gd,
                              interpret, batch=batch,
                              g_dtype=g_dtype, dog_dtype=dog_dtype)
        if has16:
            g, d, g16 = res
        else:
            g, d = res
        gd = (g, d)
    return gd[0], gd[1], g16


TILE_F = 128    # output rows per grid step, fused whole-octave kernel


def _octave_kernel(*refs, taps_list, n_keep, halo8t, h_pad, w_pad, lb,
                   lhalo, has_g16, has_l3, al):
    """Whole-octave fused kernel: ALL blur levels chained in VMEM.

    One strip of the octave base is DMA'd once; levels 1..S+2 are computed
    sequentially in VMEM (f32 tap math, identical op order to _kernel /
    ops.gaussian, so results are bit-equal to the per-level chain) and only
    the consumed products reach HBM: Gaussian levels 1..3 (the only levels
    the window kernels sample — s_level is in [1, 3]) and all 5 DoG slices.
    Levels 4/5 never touch HBM (their only consumer is the DoG); the
    per-level chain's L_k re-reads vanish entirely.

    halo8t covers the CUMULATIVE tap reach of the whole chain (sum of the
    per-level radii, 42 for the default config): level k's valid strip rows
    shrink by r_k per side, so the TILE_F output window stays exact through
    level S+2. Strip-edge roll wrap poisons at most that many outermost pad
    rows/cols — still inside the PAD_DESC=56 ring, and every consumer
    either masks out-of-image samples (window kernels, reference
    lib.rs:685-688/841-848) or stays >= image_border from the edge
    (extrema/refinement), so the deeper poison is as unread as the
    per-level kernel's.

    refs layout: (base_hbm, gauss_ref, dog_ref, [g16_ref], [l3_ref],
    buf, sem). g16: bf16 window-gather copy of levels 1-3 (gather16 mode).
    l3: separate f32 copy of level 3 ("split" mode: the next octave's chain
    base must stay f32 while the stored Gaussian stack is bf16)."""
    base_hbm, gauss_ref, dog_ref = refs[:3]
    k = 3
    g16_ref = l3_ref = None
    if has_g16:
        g16_ref = refs[k]; k += 1
    if has_l3:
        l3_ref = refs[k]; k += 1
    buf, sem = refs[k:k + 2]
    f = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    r0 = TILE_F + 2 * halo8t
    wb = lb + 2 * lhalo

    start = jnp.clip(i * TILE_F - halo8t, 0, h_pad - r0)
    start = pl.multiple_of((start // al) * al, al)
    lstart = jnp.clip(j * lb - lhalo, 0, w_pad - wb)
    lstart = pl.multiple_of((lstart // 128) * 128, 128)
    src = base_hbm.at[f, pl.ds(start, r0), pl.ds(lstart, wb)]
    cp = pltpu.make_async_copy(src, buf, sem)
    cp.start()
    cp.wait()

    ofs = (i * TILE_F - halo8t) - start
    x = pltpu.roll(buf[:, :].astype(F32), jnp.mod(-ofs, jnp.int32(r0)),
                   axis=0)
    lofs = (j * lb - lhalo) - lstart
    x = pltpu.roll(x, jnp.mod(-lofs, jnp.int32(wb)), axis=1)

    cur = x
    for lv, taps in enumerate(taps_list):
        nxt = _blur_strip(cur, taps, r0, wb)
        rows_n = nxt[halo8t:halo8t + TILE_F, lhalo:lhalo + lb]
        rows_c = cur[halo8t:halo8t + TILE_F, lhalo:lhalo + lb]
        dog_ref[0, lv, :, :] = (rows_n - rows_c).astype(dog_ref.dtype)
        if lv < n_keep:
            gauss_ref[0, lv, :, :] = rows_n.astype(gauss_ref.dtype)
            if g16_ref is not None:
                g16_ref[0, lv, :, :] = rows_n.astype(jnp.bfloat16)
        if l3_ref is not None and lv == n_keep - 1:
            l3_ref[0, :, :] = rows_n
        cur = nxt


def build_octave_fused(base_padded: jnp.ndarray, cfg: SiftConfig,
                       interpret: bool = False, gather16: bool = False,
                       split: bool = False):
    """Whole-octave fused builder: base_padded (B, H_pad, W_pad) ->
    (gauss, dog, g16, l3) with gauss (B, 3, H_pad, W_pad) = levels 1-3
    (the only Gaussian levels any window kernel samples), dog
    (B, 5, H_pad, W_pad), g16 a bf16 copy of gauss when `gather16`, l3 a
    separate f32 level-3 plane when `split` (next-octave chain base).

    ONE kernel launch per octave for the whole batch; the blur chain lives
    in VMEM, so vs. the per-level builder the L1..L4 HBM re-reads and the
    L4/L5 writes disappear (~2x less pyramid traffic at f32). f32 results
    are bit-equal to build_octave_padded_batched (same taps, same roll
    order, f32 HBM roundtrips are exact).

    split (storage_dtype="split"): Gaussian stack STORED bf16, DoG f32 from
    the unrounded in-VMEM f32 chain — unlike the per-level split mode the
    chain never rounds, so the DoG (everything detection reads) is
    BIT-EXACT vs the f32 chain: keypoint positions/scales/responses are
    detection-safe; only window samples (orientation/descriptor) see bf16.

    Requires h_pad >= TILE_F + cumulative halo (>= 256 for the default
    config) and the usual lane layout (w_pad % 1024 == 0 when > 1536)."""
    batch, h_pad, w_pad = base_padded.shape
    sigmas = cfg.octave_sigmas()
    taps_list = tuple(
        tuple(float(t) for t in gaussian_kernel(s, cv_ksize(s)))
        for s in sigmas[1:])
    n_dog = len(taps_list)
    n_keep = cfg.scales_per_octave   # window kernels sample levels 1..S only
    assert not (split and gather16)
    dtype = base_padded.dtype
    al = 16 if dtype == jnp.bfloat16 else 8
    cum = sum(len(t) // 2 for t in taps_list)
    halo8t = -(-cum // al) * al
    assert h_pad % TILE_F == 0 and h_pad >= TILE_F + 2 * halo8t, h_pad
    nb = h_pad // TILE_F
    if w_pad > 1536:
        lb, lhalo = LB_MAX, LHALO
        assert w_pad % LB_MAX == 0, w_pad
    else:
        lb, lhalo = w_pad, 0
    nlb = w_pad // lb
    g_dtype = jnp.bfloat16 if (split or dtype == jnp.bfloat16) else F32
    dog_dtype = jnp.bfloat16 if dtype == jnp.bfloat16 else F32

    kernel = functools.partial(
        _octave_kernel, taps_list=taps_list, n_keep=n_keep, halo8t=halo8t,
        h_pad=h_pad, w_pad=w_pad, lb=lb, lhalo=lhalo, has_g16=gather16,
        has_l3=split, al=al)
    grid = (batch, nb, nlb)
    out_shape = [
        jax.ShapeDtypeStruct((batch, n_keep, h_pad, w_pad), g_dtype),
        jax.ShapeDtypeStruct((batch, n_dog, h_pad, w_pad), dog_dtype),
    ]
    out_specs = [
        pl.BlockSpec((1, n_keep, TILE_F, lb), lambda f, i, j: (f, 0, i, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n_dog, TILE_F, lb), lambda f, i, j: (f, 0, i, j),
                     memory_space=pltpu.VMEM),
    ]
    if gather16:
        out_shape.append(jax.ShapeDtypeStruct((batch, n_keep, h_pad, w_pad),
                                              jnp.bfloat16))
        out_specs.append(pl.BlockSpec((1, n_keep, TILE_F, lb),
                                      lambda f, i, j: (f, 0, i, j),
                                      memory_space=pltpu.VMEM))
    if split:
        out_shape.append(jax.ShapeDtypeStruct((batch, h_pad, w_pad), F32))
        out_specs.append(pl.BlockSpec((1, TILE_F, lb),
                                      lambda f, i, j: (f, i, j),
                                      memory_space=pltpu.VMEM))
    res = pl.pallas_call(
        kernel, grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=out_specs, out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((TILE_F + 2 * halo8t, lb + 2 * lhalo), dtype),
            pltpu.SemaphoreType.DMA,
        ],
        # the whole blur chain's value stack + double-buffered output
        # blocks (~24 MB at lb=1024) exceed the default 16 MB scoped-vmem
        # budget; the chip has 128 MB of VMEM
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 2**20),
        interpret=interpret)(base_padded)
    g, d = res[0], res[1]
    g16 = res[2] if gather16 else None
    l3 = res[2] if split else None
    return g, d, g16, l3


def reflect_pad_image(img: jnp.ndarray, pad: int, extra_right: int,
                      extra_bottom: int = 0) -> jnp.ndarray:
    """Reflect-101-extend (H, W) -> (H+2p+eb, W+2p+er) with zero fill in the
    alignment rows/columns (never read by valid consumers)."""
    from ..gaussian import _reflect101_pad

    out = _reflect101_pad(img, pad, axis=0)
    out = _reflect101_pad(out, pad, axis=1)
    if extra_right or extra_bottom:
        out = jnp.pad(out, ((0, extra_bottom), (0, extra_right)))
    return out
