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


def compact_words(words: jnp.ndarray, capacity: int):
    """Compaction over a BIT-PACKED mask: words (nw,) int32, bit j of word w
    = mask element 32w + j. Locates each output slot's word by binary search
    over the word-popcount prefix and its bit by a 32-wide in-register scan
    — every pass touches the 32x-compressed word array only. Same contract
    as compact_indices (row-major order, 0-fill, true count)."""
    nw = words.shape[0]
    pc = jax.lax.population_count(words)
    prefix = jnp.cumsum(pc, dtype=jnp.int32)           # inclusive
    count = prefix[-1]

    slots = jnp.arange(capacity, dtype=jnp.int32)
    wi = jnp.searchsorted(prefix, slots, side="right").astype(jnp.int32)
    wi = jnp.minimum(wi, nw - 1)
    prev = jnp.where(wi > 0, prefix[jnp.maximum(wi - 1, 0)], 0)
    rank = slots - prev                                # rank within word
    w = words[wi]                                      # (capacity,)
    b = ((w[:, None] >> jnp.arange(32, dtype=jnp.int32)[None, :]) & 1)
    cpos = jnp.cumsum(b, axis=1, dtype=jnp.int32)
    hit = (b > 0) & (cpos == rank[:, None] + 1)
    j = jnp.argmax(hit, axis=1).astype(jnp.int32)
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
