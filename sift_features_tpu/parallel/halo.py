"""Halo-exchange spatial sharding for the pyramid's separable blurs.

When a single frame's pyramid is sharded by rows over the `space` mesh axis
(SURVEY.md §2.3 'Intra-image spatial parallel'), the vertical blur pass needs
`r` rows of halo from each neighbor. This module provides that pass as a
`ppermute` exchange + local valid convolution, to be called INSIDE a
`shard_map` region. The horizontal pass is embarrassingly row-local and uses
the ordinary ops.gaussian.blur_1d.

Numerics match the unsharded ops.gaussian path (same ascending tap-sum
order, same reflect-101 global border) up to XLA FMA-fusion differences
(<= a couple of ULPs). Global borders (first/last shard) are reconstructed from
local rows via reflect-101, which requires shard_height > kernel radius — the
caller falls back to replicated compute for the tiny top octaves where that
fails.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.gaussian import blur_1d, gaussian_kernel

F32 = jnp.float32


def _ring_perms(n: int):
    up = [(i, (i + 1) % n) for i in range(n)]     # send to next (i receives from i-1)
    down = [(i, (i - 1) % n) for i in range(n)]   # send to prev (i receives from i+1)
    return up, down


def blur_rows_halo(x: jnp.ndarray, kernel: np.ndarray, axis_name: str,
                   n_shards: int) -> jnp.ndarray:
    """Vertical (rows) blur pass of a row-sharded array inside shard_map.

    x: (..., h_local, W) — this device's contiguous row shard, equal-sized
    across shards. Requires h_local >= r (asserted). Returns same shape.
    """
    r = len(kernel) // 2
    h_loc = x.shape[-2]
    assert h_loc >= r, f"shard height {h_loc} < kernel radius {r}"
    if n_shards == 1:
        return blur_1d(x, kernel, axis=x.ndim - 2)

    up, down = _ring_perms(n_shards)
    # halo from prev neighbor (my top halo = prev's bottom r rows)
    top_halo = jax.lax.ppermute(x[..., -r:, :], axis_name, up)
    # halo from next neighbor (my bottom halo = next's top r rows)
    bot_halo = jax.lax.ppermute(x[..., :r, :], axis_name, down)

    idx = jax.lax.axis_index(axis_name)
    # Global reflect-101 borders, built from local rows (h_loc > r):
    # top of image: rows r..1  -> x[1:r+1] flipped; bottom: x[-r-1:-1] flipped
    refl_top = x[..., 1:r + 1, :][..., ::-1, :]
    refl_bot = x[..., -r - 1:-1, :][..., ::-1, :]
    top = jnp.where(idx == 0, refl_top, top_halo)
    bot = jnp.where(idx == n_shards - 1, refl_bot, bot_halo)

    xp = jnp.concatenate([top, x, bot], axis=-2)
    out = None
    for i in range(len(kernel)):
        term = F32(kernel[i]) * jax.lax.slice_in_dim(xp, i, i + h_loc, axis=-2)
        out = term if out is None else out + term
    return out


def gaussian_blur_sharded(x: jnp.ndarray, sigma: float, axis_name: str,
                          n_shards: int) -> jnp.ndarray:
    """OpenCV-semantics Gaussian blur of a row-sharded (..., h_local, W) array:
    horizontal pass local, vertical pass via halo exchange (OpenCV order:
    rows filter first — here 'rows filter' = along W, matching ops.gaussian)."""
    kern = gaussian_kernel(sigma)
    out = blur_1d(x, kern, axis=x.ndim - 1)      # horizontal: row-local
    return blur_rows_halo(out, kern, axis_name, n_shards)
