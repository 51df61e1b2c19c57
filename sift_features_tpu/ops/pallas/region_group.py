"""Shared candidate->region grouping for the whole-loop refinement drivers.

Both the tile kernel (refine_tile_kernel) and the region-walk kernel
(refine_walk_kernel) group candidates by an aligned image region per frame,
pad each region's candidate list to kernel-block multiples so every grid
block belongs to exactly one region, and map block outputs back to the
original candidate order. This module holds that logic once, parameterized
by (region dims, window dims, margins, block size) — the chunk-boundary
row-shift class of bug only has to be fixed in one place.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

I32 = jnp.int32


@dataclasses.dataclass
class RegionLayout:
    """Slot-level layout for one grouped launch (all jnp arrays)."""

    s_slot: jnp.ndarray    # (T_cap,) frame-local scale per slot
    y_slot: jnp.ndarray    # (T_cap,) padded row per slot
    x_slot: jnp.ndarray    # (T_cap,) padded lane per slot
    a_slot: jnp.ndarray    # (T_cap,) 1 = real candidate
    seg_b: jnp.ndarray     # (nb,) segment id per block
    r0_b: jnp.ndarray      # (nb,) aligned window row origin per block
    c0_b: jnp.ndarray      # (nb,) aligned window lane origin per block
    pb_b: jnp.ndarray      # (nb,) plane base (frame * n_dog) per block
    active_b: jnp.ndarray  # (nb,) real-candidate count per block
    slot_k: jnp.ndarray    # (K,) slot index of each original candidate
    T_cap: int
    nb: int


def group_by_region(s0, y0, x0, valid, pad: int, Hp: int, Wp: int,
                    n_dog: int, n_frames: int, plane_off,
                    reg_r: int, reg_c: int, win_r: int, win_c: int,
                    margin_r: int, margin_c: int, bk: int) -> RegionLayout:
    """Group candidates by (frame, reg_r-row, reg_c-lane) region.

    Regions partition the padded image; each block's window origin is the
    region origin minus (margin_r, margin_c), clamped into the stack. Every
    region's candidate list is padded to a multiple of bk so blocks never
    straddle regions; invalid candidates sort into a per-frame virtual
    segment that emits no slots."""
    K = s0.shape[0]
    LR = min(win_r, Hp)
    LW = min(win_c, Wp)
    NRY = -(-Hp // reg_r) if LR < Hp else 1
    NRX = -(-Wp // reg_c) if LW < Wp else 1
    NR = NRY * NRX

    frame = (plane_off // n_dog if plane_off is not None
             else jnp.zeros((K,), I32))
    ry = jnp.clip(y0 // reg_r, 0, NRY - 1)
    rx = jnp.clip(x0 // reg_c, 0, NRX - 1)
    reg = ry * NRX + rx
    gkey = frame * (NR + 1) + jnp.where(valid, reg, NR)

    perm = jnp.argsort(gkey, stable=True)
    inv_perm = jnp.argsort(perm, stable=True)
    sorted_keys = gkey[perm]
    NSEG = n_frames * (NR + 1)
    seg_ids = jnp.arange(NSEG, dtype=I32)
    starts = jnp.searchsorted(sorted_keys, seg_ids, side="left").astype(I32)
    ends = jnp.searchsorted(sorted_keys, seg_ids, side="right").astype(I32)
    counts = ends - starts
    is_virtual = (seg_ids % (NR + 1)) == NR
    padded = jnp.where(is_virtual, 0, -(-counts // bk) * bk)
    cum = jnp.cumsum(padded)
    offsets = cum - padded

    T_cap = K + n_frames * NR * bk
    T_cap = -(-T_cap // bk) * bk

    slots = jnp.arange(T_cap, dtype=I32)
    seg = jnp.searchsorted(cum, slots, side="right").astype(I32)
    seg_c = jnp.minimum(seg, NSEG - 1)
    rank = slots - offsets[seg_c]
    active = (seg < NSEG) & (rank < counts[seg_c])
    src = perm[jnp.clip(starts[seg_c] + rank, 0, K - 1)]

    nb = T_cap // bk
    seg_b = seg_c.reshape(nb, bk)[:, 0]
    reg_b = seg_b % (NR + 1)
    frame_b = seg_b // (NR + 1)
    ry_b = jnp.clip(reg_b, 0, NR - 1) // NRX
    rx_b = jnp.clip(reg_b, 0, NR - 1) % NRX
    a_slot = active.astype(I32)

    gclip = jnp.clip(gkey, 0, NSEG - 1)
    return RegionLayout(
        s_slot=jnp.where(active, s0[src], 1).astype(I32),
        y_slot=jnp.where(active, y0[src], pad).astype(I32),
        x_slot=jnp.where(active, x0[src], pad).astype(I32),
        a_slot=a_slot,
        seg_b=seg_b,
        r0_b=jnp.clip(ry_b * reg_r - margin_r, 0, Hp - LR).astype(I32),
        c0_b=jnp.clip(rx_b * reg_c - margin_c, 0, Wp - LW).astype(I32),
        pb_b=(frame_b * n_dog).astype(I32),
        active_b=jnp.sum(a_slot.reshape(nb, bk), axis=1, dtype=I32),
        slot_k=offsets[gclip] + (inv_perm - starts[gclip]),
        T_cap=T_cap, nb=nb)


def merge_escaped(rows, valid, fallback):
    """Split kernel output rows (K, 16) into the result dict and re-refine
    escaped candidates (col 9) from scratch via fallback(escaped_mask) —
    identical reference semantics; blocks with no escaped lanes skip fast."""
    escaped = (rows[:, 9] > 0) & valid
    ok = (rows[:, 0] > 0) & valid
    res = {
        "ok": ok,
        "s": rows[:, 1].astype(I32), "y": rows[:, 2].astype(I32),
        "x": rows[:, 3].astype(I32),
        "off_s": rows[:, 4], "off_y": rows[:, 5], "off_x": rows[:, 6],
        "response": rows[:, 7], "keep": (rows[:, 8] > 0) & ok,
    }
    fb = fallback(escaped)
    return {k: jnp.where(escaped, fb[k], res[k]) for k in res}
