"""Fixed-capacity, order-preserving compaction of masked lanes.

TPU programs are fixed-shape; variable-length keypoint lists live as
(capacity,) buffers + validity masks. `compact_indices` turns a boolean mask
into the ordered index buffer of its True positions (O(N) cumsum + scatter,
vmap-friendly — unlike jnp.nonzero). Order preservation matters: the
reference emits keypoints in scan order (SURVEY.md §7 'Ragged outputs')."""

from __future__ import annotations

import jax.numpy as jnp


def compact_indices(mask_flat: jnp.ndarray, capacity: int):
    """Returns (idx (capacity,) int32, valid (capacity,) bool, count int32).

    idx[i] = position of the i-th True element of mask_flat (row-major),
    0-filled past `count`. Overflow beyond capacity is dropped (detect via
    count > capacity)."""
    n = mask_flat.shape[0]
    pos = jnp.cumsum(mask_flat, dtype=jnp.int32) - 1
    count = jnp.sum(mask_flat, dtype=jnp.int32)
    scatter_to = jnp.where(mask_flat & (pos < capacity), pos, capacity)
    idx = jnp.zeros(capacity, jnp.int32).at[scatter_to].set(
        jnp.arange(n, dtype=jnp.int32), mode="drop")
    valid = jnp.arange(capacity, dtype=jnp.int32) < jnp.minimum(count, capacity)
    return idx, valid, count
