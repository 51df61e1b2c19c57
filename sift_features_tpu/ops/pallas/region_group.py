"""Shared candidate->region grouping for the whole-loop refinement drivers.

Both the tile kernel (refine_tile_kernel) and the region-walk kernel
(refine_walk_kernel) group candidates by an aligned image region per frame,
pad each region's candidate list to kernel-block multiples so every grid
block belongs to exactly one region, and map block outputs back to the
original candidate order. This module holds that logic once, parameterized
by (region dims, window dims, margins, block size) — the chunk-boundary
row-shift class of bug only has to be fixed in one place.

Round-4 rewrite: the round-3 implementation cost ~56 ms/batch at octave-0
bench density (tools/group_profile.py breakdown: per-slot searchsorted over
the ~278k slot axis 37 ms, second argsort 6.4 ms, two K-wide searchsorted
passes 7 ms). Everything except the one key argsort is now O(NSEG) or
block-granular:
  - inverse permutation: unique-index scatter instead of argsort(perm);
  - per-segment counts: scatter-add histogram instead of searchsorted x2;
  - per-slot segment ids: every block lies in exactly one segment (padded
    sizes are bk-multiples), so segment boundaries are marked at block
    granularity and cumsum'd — no per-slot binary search;
  - (s, y, x) slot fields: one packed-word gather + div/mod decode instead
    of three K-table gathers.
Measured 56 -> ~13 ms/batch (131072 lanes), byte-identical layout.

Round 5: a two-level stable counting sort (_stable_bucket_positions) was
built to replace the argsort, but the phase microbenches that motivated it
were DISPATCH-poisoned (tools/dispatch_calib.py: in-graph argsort of 131k
lanes costs ~0.05 ms; a lone dispatch carries 3-6 ms of tunnel overhead),
and the in-pipeline A/B showed the argsort path faster (10.84 vs 10.72
fps). The argsort path is the default again; the counting sort is kept
behind SIFT_GROUP_CSORT=1 as the measured record. Slot layout is
byte-identical either way.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

I32 = jnp.int32


def _stable_bucket_positions(gkey: jnp.ndarray, nseg: int, L: int = 128):
    """Stable counting-sort positions for keys in [0, nseg).

    Returns (pos, counts, starts): pos[i] is element i's rank in the stable
    ascending sort of gkey — exactly argsort(gkey, stable=True)'s inverse
    permutation — plus the per-key counts and exclusive-prefix starts.

    Two-level decomposition (VERDICT r4 task 3: candidates leave compaction
    in scan order, already nearly region-ordered — a full sort network
    recomputes an ordering the data nearly has):
      pos[i] = starts[key_i]                      (key's global base)
             + prefix_{chunks < c}(hist[:, key_i]) (earlier chunks' share)
             + #(j < i in chunk c: key_j == key_i) (within-chunk rank)
    Costs one K-lane scatter-add, a (C, nseg) cumsum, and a (C, L, L)
    strict-lower-triangular equality reduce — all VPU/bandwidth-linear —
    vs the K·log²K bitonic argsort."""
    K = gkey.shape[0]
    Kp = -(-K // L) * L
    keyp = (jnp.concatenate([gkey, jnp.full((Kp - K,), nseg - 1, I32)])
            if Kp > K else gkey)
    keyc = keyp.reshape(-1, L)                                  # (C, L)
    C = keyc.shape[0]
    hist = jnp.zeros((C, nseg), I32).at[
        jnp.arange(C, dtype=I32)[:, None], keyc].add(1, mode="drop")
    counts_p = jnp.sum(hist, axis=0)                            # (nseg,)
    starts = jnp.cumsum(counts_p, dtype=I32) - counts_p
    chunk_pfx = jnp.cumsum(hist, axis=0, dtype=I32) - hist      # exclusive
    lane = jnp.arange(L, dtype=I32)
    eq = (keyc[:, :, None] == keyc[:, None, :]) & (
        lane[:, None] > lane[None, :])
    occ = jnp.sum(eq, axis=2, dtype=I32)                        # (C, L)
    base = jnp.take_along_axis(chunk_pfx, keyc, axis=1)         # (C, L)
    pos = jnp.take(starts, keyp) + (base + occ).reshape(-1)
    if Kp > K:
        # padding lanes hold key nseg-1 and sit AFTER every real element in
        # array order, so stable ranks place them last within that key:
        # real elements' positions are unaffected. Their count is removed
        # so counts/starts describe the real keys only... except key nseg-1
        # itself, whose count must subtract the padding.
        counts_p = counts_p.at[nseg - 1].add(K - Kp)
    return pos[:K], counts_p, starts


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
    src: jnp.ndarray       # (T_cap,) candidate index per slot (drivers
    #                        gather per-candidate f32 params with it;
    #                        garbage on inactive slots — mask with a_slot)
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
    NSEG = n_frames * (NR + 1)
    seg_ids = jnp.arange(NSEG, dtype=I32)

    import os

    if os.environ.get("SIFT_GROUP_CSORT") == "1":
        # round-5 counting-sort experiment, kept for A/B measurement only:
        # its phase-level microbenches looked favorable but were DISPATCH-
        # poisoned (tools/dispatch_calib.py: a lone dispatch carries 3-6 ms
        # of tunnel overhead while an in-graph 131k argsort costs ~0.05 ms);
        # in-pipeline the argsort path benches faster (10.84 vs 10.72 fps,
        # round-5 A/B). Identical stable order either way.
        inv_perm, counts, starts = _stable_bucket_positions(gkey, NSEG)
        perm = jnp.zeros((K,), I32).at[inv_perm].set(
            jnp.arange(K, dtype=I32), unique_indices=True, mode="drop")
    else:
        # default: bitonic argsort (in-graph ~0.05 ms at octave-0 density)
        # + unique-index scatter inverse
        perm = jnp.argsort(gkey, stable=True)
        inv_perm = jnp.zeros((K,), I32).at[perm].set(
            jnp.arange(K, dtype=I32), unique_indices=True, mode="drop")
        counts = jnp.zeros((NSEG,), I32).at[gkey].add(1, mode="drop")
        starts = jnp.cumsum(counts, dtype=I32) - counts
    is_virtual = (seg_ids % (NR + 1)) == NR
    padded = jnp.where(is_virtual, 0, -(-counts // bk) * bk)
    cum = jnp.cumsum(padded, dtype=I32)
    offsets = cum - padded

    T_cap = K + n_frames * NR * bk
    T_cap = -(-T_cap // bk) * bk
    nb = T_cap // bk

    # per-BLOCK segment id: seg of block b = #{i: cum[i] <= b*bk}; cum values
    # are bk-multiples, so mark each boundary's block and cumsum
    markb = jnp.zeros((nb + 1,), I32).at[jnp.clip(cum // bk, 0, nb)].add(
        1, mode="drop")
    seg_raw = jnp.cumsum(markb, dtype=I32)[:nb]       # may reach NSEG (tail)
    seg_b = jnp.minimum(seg_raw, NSEG - 1)

    lanes = jnp.arange(bk, dtype=I32)
    rank = ((jnp.arange(nb, dtype=I32) * bk - offsets[seg_b])[:, None]
            + lanes[None, :])                         # (nb, bk)
    active2 = (seg_raw < NSEG)[:, None] & (rank < counts[seg_b][:, None])
    src = perm[jnp.clip(starts[seg_b][:, None] + rank, 0, K - 1)].reshape(-1)
    active = active2.reshape(-1)

    # one packed gather for (s, y, x); dead slots decode to (1, pad, pad)
    pk = (s0 * Hp + y0) * Wp + x0
    pv = jnp.where(active, pk[src], (Hp + pad) * Wp + pad)
    x_sl = pv % Wp
    yy = pv // Wp
    y_sl = yy % Hp
    s_sl = yy // Hp

    reg_b = seg_b % (NR + 1)
    frame_b = seg_b // (NR + 1)
    ry_b = jnp.clip(reg_b, 0, NR - 1) // NRX
    rx_b = jnp.clip(reg_b, 0, NR - 1) % NRX
    a_slot = active.astype(I32)

    gclip = jnp.clip(gkey, 0, NSEG - 1)
    return RegionLayout(
        s_slot=s_sl.astype(I32),
        y_slot=y_sl.astype(I32),
        x_slot=x_sl.astype(I32),
        a_slot=a_slot,
        seg_b=seg_b,
        r0_b=jnp.clip(ry_b * reg_r - margin_r, 0, Hp - LR).astype(I32),
        c0_b=jnp.clip(rx_b * reg_c - margin_c, 0, Wp - LW).astype(I32),
        pb_b=(frame_b * n_dog).astype(I32),
        active_b=jnp.sum(a_slot.reshape(nb, bk), axis=1, dtype=I32),
        slot_k=offsets[gclip] + (inv_perm - starts[gclip]),
        src=src,
        T_cap=T_cap, nb=nb)


def chunk_schedule(g: RegionLayout, t0: int, t1: int, bk: int):
    """Double-buffered window-prefetch schedule for slot chunk [t0, t1).

    Returns per-block arrays for the chunk: (active, load, r0, c0, pb, par,
    first, nxt_r0, nxt_c0, nxt_pb, nxt_has). `load` marks blocks whose
    region differs from the previous block's (they own the window copy);
    load-ordinal parity picks the window buffer half; each load block
    starts the NEXT load block's DMAs (nxt_*). Every chunk restarts the
    schedule (first load block bootstraps its own copies)."""
    b0, b1 = t0 // bk, t1 // bk
    nbc = b1 - b0
    seg_chunk = g.seg_b[b0:b1]
    load = jnp.concatenate([
        jnp.ones((1,), I32),
        (seg_chunk[1:] != seg_chunk[:-1]).astype(I32)])
    ordinal = jnp.cumsum(load) - 1
    par_c = (ordinal % 2).astype(I32)
    first_c = ((ordinal == 0) & (load > 0)).astype(I32)
    idx = jnp.arange(nbc, dtype=I32)
    idx_if = jnp.where(load > 0, idx, nbc)
    suf = jnp.flip(jax.lax.cummin(jnp.flip(
        jnp.concatenate([idx_if[1:], jnp.full((1,), nbc, I32)]))))
    nxtidx = jnp.clip(suf, 0, nbc - 1)
    act_c = g.active_b[b0:b1]
    nxt_has = ((suf < nbc) & (act_c[nxtidx] > 0)).astype(I32)
    r0c, c0c, pbc = g.r0_b[b0:b1], g.c0_b[b0:b1], g.pb_b[b0:b1]
    return (act_c, load, r0c, c0c, pbc, par_c, first_c,
            r0c[nxtidx], c0c[nxtidx], pbc[nxtidx], nxt_has)


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


def merge_escaped_compact(rows, valid, run_fallback, gather_args, e_cap: int):
    """merge_escaped with the fallback run on a COMPACTED escapee buffer.

    The full-width per-step fallback costs ~36 ms/batch in pure grid-step
    overhead at octave-0 bench density even with ZERO escapes (measured,
    tools/refine_breakdown.py 'fb0') because its grid still walks all
    K/BK blocks x 5 steps. Escapes are ~1.4% of candidates, so they are
    compacted into an e_cap buffer first; if the (never observed) case of
    more than e_cap escapes occurs, a lax.cond falls back to the exact
    full-width path — semantics are identical either way.

    run_fallback(args_tuple, act) -> result dict, where args_tuple is
    gather_args gathered at the compacted indices (full-width path passes
    gather_args unchanged with the escape mask)."""
    from ...utils.compact import compact_indices

    escaped = (rows[:, 9] > 0) & valid
    ok = (rows[:, 0] > 0) & valid
    res = {
        "ok": ok,
        "s": rows[:, 1].astype(I32), "y": rows[:, 2].astype(I32),
        "x": rows[:, 3].astype(I32),
        "off_s": rows[:, 4], "off_y": rows[:, 5], "off_x": rows[:, 6],
        "response": rows[:, 7], "keep": (rows[:, 8] > 0) & ok,
    }
    keys = tuple(res.keys())

    eidx, evalid, ecount = compact_indices(escaped, e_cap)
    rank = jnp.cumsum(escaped.astype(I32)) - 1
    take = jnp.clip(rank, 0, e_cap - 1)

    def compact_path(_):
        fb = run_fallback(tuple(a[eidx] for a in gather_args), evalid)
        return tuple(jnp.where(escaped, fb[k][take], res[k]) for k in keys)

    def full_path(_):
        fb = run_fallback(gather_args, escaped)
        return tuple(jnp.where(escaped, fb[k], res[k]) for k in keys)

    def no_escape_path(_):
        # zero escapes (the norm on the small octaves): the fallback's 5
        # per-step launches + XLA glue are pure overhead — skip them
        # entirely; merged output is res verbatim (round 5)
        return tuple(res[k] for k in keys)

    out = jax.lax.cond(
        ecount == 0, no_escape_path,
        lambda _: jax.lax.cond(ecount <= e_cap, compact_path, full_path,
                               None), None)
    merged = dict(zip(keys, out))
    merged["n_escaped"] = ecount   # observability + stress-test hook
    return merged
