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

import jax.numpy as jnp


def compact_indices(mask_flat: jnp.ndarray, capacity: int, block: int = 512):
    """Returns (idx (capacity,) int32, valid (capacity,) bool, count int32).

    idx[i] = position of the i-th True element of mask_flat (row-major),
    0-filled past `count`. Overflow beyond capacity is dropped (detect via
    count > capacity)."""
    n = mask_flat.shape[0]
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
