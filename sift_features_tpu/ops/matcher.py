"""Brute-force descriptor matching (JAX, TPU-native).

The reference delegates matching to OpenCV's BFMatcher(NORM_L2,
crossCheck=true) in its examples (examples/sift-match.rs:30-39,
opencv-cross-match.rs:63-90) — matching is therefore first-class framework
code here, not a port (SURVEY.md §2.3/§7).

TPU design: ||a-b||^2 = ||a||^2 + ||b||^2 - 2 a.b as a tiled MXU matmul over
the u8 descriptors (upcast f32 — values are integers <= 255 so f32 products
are exact; distances match OpenCV's f32 L2 on upcast descriptors).
Cross-check = mutual row/column argmin, replicating BFMatcher's semantics:
argmin ties resolve to the lowest index (jnp.argmin does the same).
"""

from __future__ import annotations

import dataclasses
import functools
import os

import numpy as np
import jax
import jax.numpy as jnp


@dataclasses.dataclass
class Matches:
    """query index / train index / L2 distance for each retained match."""

    query_idx: np.ndarray
    train_idx: np.ndarray
    distance: np.ndarray


def _dot_qt_int8(a_u8: jnp.ndarray, b_u8: jnp.ndarray) -> jnp.ndarray:
    """Exact u8 descriptor dot products on the MXU int8 path.

    u8 values don't fit int8, so shift: a.b = (a-128).(b-128)
    + 128*(sum(a) + sum(b)) - 128*128*D, all exact in int32 (per-entry
    products <= 127*128, summed over D=128 dims < 2^21)."""
    d = a_u8.shape[1]
    a8 = (a_u8.astype(jnp.int32) - 128).astype(jnp.int8)
    b8 = (b_u8.astype(jnp.int32) - 128).astype(jnp.int8)
    ab = jax.lax.dot_general(b8, a8, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.int32)
    sa = jnp.sum(a_u8.astype(jnp.int32), axis=1)
    sb = jnp.sum(b_u8.astype(jnp.int32), axis=1)
    return ab + 128 * (sb[:, None] + sa[None, :]) - 128 * 128 * d


def _int8_match_enabled() -> bool:
    """Read SIFT_INT8_MATCH OUTSIDE jit: compilations cache per (dtype,
    shape, statics), so a trace-time env read would freeze the first value
    seen for the rest of the process."""
    return bool(int(os.environ.get("SIFT_INT8_MATCH", "0")))


@functools.partial(jax.jit, static_argnums=(2, 3))
def _match_jit(d_train: jnp.ndarray, d_query: jnp.ndarray, cross_check: bool,
               int8: bool = False):
    if d_train.dtype == jnp.uint8 and d_query.dtype == jnp.uint8 and int8:
        # int8 MXU path: exact integer distances, but MEASURED ~8x slower
        # than the f32 MXU on this backend (s8 dot lowers poorly;
        # tools/bench_matcher_db.py) — opt-in only. The f32 path below is
        # bit-exact on u8 inputs anyway (values <= 255: products and sums
        # stay within the f32 integer range).
        aa = jnp.sum(jnp.square(d_train.astype(jnp.int32)), axis=1)
        bb = jnp.sum(jnp.square(d_query.astype(jnp.int32)), axis=1)
        ab = _dot_qt_int8(d_train, d_query)
        d2 = (bb[:, None] + aa[None, :] - 2 * ab).astype(jnp.float32)
    else:
        a = d_train.astype(jnp.float32)
        b = d_query.astype(jnp.float32)
        # squared L2 distance matrix (Q, T) on the MXU
        aa = jnp.sum(a * a, axis=1)
        bb = jnp.sum(b * b, axis=1)
        ab = jax.lax.dot_general(b, a, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32,
                                 precision=jax.lax.Precision.HIGHEST)
        d2 = bb[:, None] + aa[None, :] - 2.0 * ab
    d2 = jnp.maximum(d2, 0.0)
    best_train = jnp.argmin(d2, axis=1)            # per query
    best_d2 = jnp.min(d2, axis=1)
    if cross_check:
        best_query = jnp.argmin(d2, axis=0)        # per train
        keep = best_query[best_train] == jnp.arange(d2.shape[0])
    else:
        keep = jnp.ones(d2.shape[0], bool)
    return best_train, jnp.sqrt(best_d2), keep


def match_brute_force(d_train, d_query, cross_check: bool = True) -> Matches:
    """BFMatcher.match(query) analog: d_train was 'add'ed, d_query matched.

    Returns matches for each query descriptor whose nearest train descriptor
    is mutual (when cross_check). Arrays are (N,128) u8 or f32.
    """
    d_train = jnp.asarray(d_train)
    d_query = jnp.asarray(d_query)
    bt, dist, keep = _match_jit(d_train, d_query, cross_check,
                                _int8_match_enabled())
    bt, dist, keep = np.asarray(bt), np.asarray(dist), np.asarray(keep)
    qi = np.nonzero(keep)[0]
    return Matches(query_idx=qi, train_idx=bt[qi], distance=dist[qi])
