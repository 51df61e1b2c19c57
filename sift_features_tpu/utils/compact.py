"""Fixed-capacity, order-preserving compaction of masked lanes.

TPU programs are fixed-shape; variable-length keypoint lists live as
(capacity,) buffers + validity masks. `compact_indices` turns a boolean mask
into the ordered index buffer of its True positions. Order preservation
matters: the reference emits keypoints in scan order (SURVEY.md §7 'Ragged
outputs').

TPU design: scatter-free. XLA TPU lowers scatter quasi-serially (a
cumsum+scatter compaction measured 129 ms for a 24.9M-element mask — it was
the single hottest op in the pipeline); instead the True positions are FOUND
from the output side: block-count the mask, prefix-sum the per-block counts
(small), then each output slot binary-searches its block (searchsorted) and
locates its rank inside the gathered block row. All gathers/cumsums are
O(capacity x block) and vectorize on the VPU; measured ~40x faster than the
scatter form at 1080p octave-0 scale.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def compact_words(words: jnp.ndarray, capacity: int, chunk: int = 64):
    """Compaction over a BIT-PACKED mask: words (nw,) int32, bit j of word w
    = mask element 32w + j. Same contract as compact_indices (row-major
    order, 0-fill, true count).

    Round-5 rewrite: the round-2 version (jnp.searchsorted over the word
    prefix + a 32-wide in-register bit scan) was the single hottest op
    class in the whole pipeline on the dev chip — the octave-0 candidate
    compaction alone cost ~56 ms/batch (device trace, tools/trace_profile):
    searchsorted lowers to a ~20-step while loop whose per-step (capacity,)
    gather from the multi-MB prefix table costs ~1.4 ms, and the (capacity,
    32) bit expansion another ~28 ms. This version finds each slot's word
    in two levels — a scatter-free 'bump histogram' of CHUNK-level prefix
    values locates the chunk (cumsum of nc boundary marks, no search), and
    a log2(chunk)-step in-chunk bisection needs only 6 more prefix gathers
    — and selects the bit by a 5-step popcount-halving (select-bit-by-rank)
    instead of the 32-lane scan. Identical outputs, ~4x fewer big-table
    gathers."""
    nw = words.shape[0]
    pc = jax.lax.population_count(words)
    prefix = jnp.cumsum(pc, dtype=jnp.int32)           # inclusive
    count = prefix[-1]

    slots = jnp.arange(capacity, dtype=jnp.int32)

    # --- level 1: chunk per slot, scatter-free searchsorted equivalent ---
    # ci[slot] = #{c : cpre[c] <= slot} == searchsorted(cpre, slot, 'right')
    nc = -(-nw // chunk)
    csum = jnp.sum(jnp.pad(pc, (0, nc * chunk - nw)).reshape(nc, chunk),
                   axis=1, dtype=jnp.int32)
    cpre = jnp.cumsum(csum, dtype=jnp.int32)           # inclusive
    bump = jnp.zeros((capacity + 1,), jnp.int32).at[
        jnp.clip(cpre, 0, capacity)].add(1, mode="drop")
    ci = jnp.cumsum(bump, dtype=jnp.int32)[:capacity]
    ci = jnp.minimum(ci, nc - 1)
    prev = jnp.where(ci > 0, cpre[jnp.maximum(ci - 1, 0)], 0)

    # --- level 2: word within chunk, log2(chunk)-step bisection over the
    # word prefix; `prev` tracks prefix[wi-1] so no extra gather is needed
    wi = ci * chunk
    step = chunk
    while step > 1:
        step //= 2
        probe = jnp.minimum(wi + step - 1, nw - 1)
        pv = prefix[probe]
        go = pv <= slots
        wi = jnp.where(go, wi + step, wi)
        prev = jnp.where(go, pv, prev)
    wi = jnp.minimum(wi, nw - 1)
    rank = slots - prev                                # rank within word

    # --- bit within word: select-bit-by-rank via popcount halving ---
    w = words[wi]                                      # (capacity,)
    j = jnp.zeros_like(slots)
    r = rank
    width = 32
    while width > 1:
        width //= 2
        lowmask = ((jnp.int32(1) << width) - 1) << j
        c = jax.lax.population_count(w & lowmask)
        go = r >= c
        j = jnp.where(go, j + width, j)
        r = jnp.where(go, r - c, r)
    idx = wi * 32 + j
    valid = slots < jnp.minimum(count, capacity)
    return jnp.where(valid, idx, 0), valid, count


def compact_indices_packed(mask_flat: jnp.ndarray, capacity: int):
    """compact_indices for HUGE masks (image-scale): bit-packs the mask into
    int32 words via an MXU dot (two 16-bit halves — 2^0..2^15 are exact in
    f32), then delegates to compact_words. Reads the mask ONCE."""
    n = mask_flat.shape[0]
    nw = -(-n // 32)
    bits = jnp.pad(mask_flat, (0, nw * 32 - n)).reshape(nw, 32)
    wmat = np.zeros((32, 2), np.float32)               # bit j -> half j//16
    wmat[:16, 0] = 2.0 ** np.arange(16)
    wmat[16:, 1] = 2.0 ** np.arange(16)
    halves = jax.lax.dot(bits.astype(jnp.float32), jnp.asarray(wmat),
                         precision=jax.lax.Precision.HIGHEST).astype(jnp.int32)
    words = halves[:, 0] | (halves[:, 1] << 16)        # (nw,) packed bits
    return compact_words(words, capacity)


def compact_indices(mask_flat: jnp.ndarray, capacity: int, block: int = 512):
    """Returns (idx (capacity,) int32, valid (capacity,) bool, count int32).

    idx[i] = position of the i-th True element of mask_flat (row-major),
    0-filled past `count`. Overflow beyond capacity is dropped (detect via
    count > capacity)."""
    n = mask_flat.shape[0]
    if n >= 8192:
        # large masks: the bit-packed path's per-slot gathers are 32x
        # smaller (identical outputs; see test_compact_packed_matches_dense)
        return compact_indices_packed(mask_flat, capacity)
    if n <= block:
        # small inputs: direct per-slot search over one block
        pos = jnp.cumsum(mask_flat, dtype=jnp.int32)
        count = pos[-1]
        slots = jnp.arange(capacity, dtype=jnp.int32)
        hit = mask_flat[None, :] & (pos[None, :] == slots[:, None] + 1)
        idx = jnp.argmax(hit, axis=1).astype(jnp.int32)
        valid = slots < jnp.minimum(count, capacity)
        return jnp.where(valid, idx, 0), valid, count

    nb = -(-n // block)
    pad = nb * block - n
    mb = jnp.pad(mask_flat, (0, pad)).reshape(nb, block)
    counts = jnp.sum(mb, axis=1, dtype=jnp.int32)          # (nb,)
    prefix = jnp.cumsum(counts, dtype=jnp.int32)           # inclusive
    count = prefix[-1]

    slots = jnp.arange(capacity, dtype=jnp.int32)
    b = jnp.searchsorted(prefix, slots, side="right").astype(jnp.int32)
    b = jnp.minimum(b, nb - 1)
    prev = jnp.where(b > 0, prefix[jnp.maximum(b - 1, 0)], 0)
    rank = slots - prev                                    # rank within block

    rows = mb[b]                                           # (capacity, block)
    rpos = jnp.cumsum(rows, axis=1, dtype=jnp.int32)
    hit = rows & (rpos == rank[:, None] + 1)
    j = jnp.argmax(hit, axis=1).astype(jnp.int32)
    idx = b * block + j
    valid = slots < jnp.minimum(count, capacity)
    return jnp.where(valid, idx, 0), valid, count
