"""Ring-streamed brute-force matcher over a device mesh.

The matcher (ops.matcher) is a (Q,128)x(128,T) distance matmul + mutual
argmin. At database scale the T axis no longer fits one chip, so the database
is sharded and streamed around the ring the way ring attention streams KV
blocks (SURVEY.md §5.7): each chip keeps its query shard resident; train
blocks circulate via `ppermute`; running row-wise (per-query) minima stay on
the chip and running column-wise (per-train) minima travel WITH the block, so
after D hops every block has seen every query and returns home complete.
One small `all_gather` of per-train best-query indices then resolves the
cross-check locally.

Semantics match ops.matcher.match_brute_force / cv2.BFMatcher(NORM_L2,
crossCheck): exact f32 distances (HIGHEST precision matmul), argmin ties to
the lowest global index (enforced by the (<, ==&<idx) update rule, which is
visit-order invariant).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

F32 = jnp.float32
I32 = jnp.int32


def _d2_block(q: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """(Qd,128),(Td,128) f32 -> (Qd,Td) squared L2 on the MXU."""
    qq = jnp.sum(q * q, axis=1)
    tt = jnp.sum(t * t, axis=1)
    qt = jax.lax.dot_general(q, t, (((1,), (1,)), ((), ())),
                             preferred_element_type=F32,
                             precision=jax.lax.Precision.HIGHEST)
    return jnp.maximum(qq[:, None] + tt[None, :] - 2.0 * qt, 0.0)


def _d2_block_u8(q: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """(Qd,128),(Td,128) u8 -> (Qd,Td) squared L2, exact.

    u8 descriptors ride the ring as-is (1/4 the ICI bytes of f32) but the
    DISTANCE matmul upcasts to f32: on this backend the s8xs8->s32 dot
    lowers ~8x slower than the f32 MXU path (measured 4.6 vs 37.8 Gdist/s,
    tools/bench_matcher_db.py), while f32 on integer values <= 255 is
    exact (products <= 65025, sums < 2^24) — identical results either
    way."""
    qf = q.astype(F32)
    tf = t.astype(F32)
    qt = jax.lax.dot_general(qf, tf, (((1,), (1,)), ((), ())),
                             preferred_element_type=F32,
                             precision=jax.lax.Precision.HIGHEST)
    qq = jnp.sum(qf * qf, axis=1)
    tt = jnp.sum(tf * tf, axis=1)
    return jnp.maximum(qq[:, None] + tt[None, :] - 2.0 * qt, 0.0)


def _ring_body(q, qv, t, tv, axis_name: str, n_shards: int, t_blk: int,
               q_tag=None, t_tag=None):
    """Per-device shard_map body. q:(Qd,128) qv:(Qd,) t:(Td,128) tv:(Td,).

    Optional q_tag (Qd,) / t_tag (Td,) int32: train rows whose tag equals the
    query's tag are excluded from that query's candidates (self-frame
    exclusion for batch-internal matching)."""
    me = jax.lax.axis_index(axis_name)
    inf = F32(np.inf)
    Qd = q.shape[0]
    Td = t.shape[0]

    best_d = jnp.full((Qd,), np.inf, F32)
    best_t = jnp.zeros((Qd,), I32)
    # column-side state travels with the block
    col_d = jnp.full((Td,), np.inf, F32)
    col_q = jnp.zeros((Td,), I32)
    owner = me
    perm = [(i, (i + 1) % n_shards) for i in range(n_shards)]

    u8 = q.dtype == jnp.uint8 and t.dtype == jnp.uint8
    for _ in range(n_shards):
        # u8 descriptors ride the ring as-is (4x less ICI traffic);
        # distances are computed exactly either way
        d2 = _d2_block_u8(q, t) if u8 else _d2_block(q, t)
        if q_tag is not None:
            d2 = jnp.where(t_tag[None, :] == q_tag[:, None], inf, d2)
        d2_rows = jnp.where(tv[None, :], d2, inf)       # invalid train never wins
        d2_cols = jnp.where(qv[:, None], d2, inf)       # invalid query never wins

        # per-query (row) running min with lowest-global-index tie-break
        loc_arg = jnp.argmin(d2_rows, axis=1).astype(I32)
        loc_min = jnp.min(d2_rows, axis=1)
        g_t = owner * t_blk + loc_arg
        take = (loc_min < best_d) | ((loc_min == best_d) & (g_t < best_t))
        best_d = jnp.where(take, loc_min, best_d)
        best_t = jnp.where(take, g_t, best_t)

        # per-train (column) running min
        carg = jnp.argmin(d2_cols, axis=0).astype(I32)
        cmin = jnp.min(d2_cols, axis=0)
        g_q = me * Qd + carg
        ctake = (cmin < col_d) | ((cmin == col_d) & (g_q < col_q))
        col_d = jnp.where(ctake, cmin, col_d)
        col_q = jnp.where(ctake, g_q, col_q)

        # rotate the block (and its column state) to the next device
        t = jax.lax.ppermute(t, axis_name, perm)
        tv = jax.lax.ppermute(tv, axis_name, perm)
        if t_tag is not None:
            t_tag = jax.lax.ppermute(t_tag, axis_name, perm)
        col_d = jax.lax.ppermute(col_d, axis_name, perm)
        col_q = jax.lax.ppermute(col_q, axis_name, perm)
        owner = (owner - 1) % n_shards

    # After n_shards hops each block is home: col_q is complete for MY block.
    all_col_q = jax.lax.all_gather(col_q, axis_name, tiled=True)  # (T,)
    my_q = me * Qd + jnp.arange(Qd, dtype=I32)
    keep = (all_col_q[best_t] == my_q) & qv & jnp.isfinite(best_d)
    return best_t, jnp.sqrt(best_d), keep


@functools.partial(jax.jit, static_argnums=(4, 5, 6))
def _ring_match_jit(q, qv, t, tv, mesh: Mesh, axis_name: str, cross_check: bool):
    n_shards = mesh.shape[axis_name]
    t_blk = t.shape[0] // n_shards
    spec_q = P(axis_name)

    def body(q_, qv_, t_, tv_):
        bt, bd, keep = _ring_body(q_, qv_, t_, tv_, axis_name, n_shards, t_blk)
        if not cross_check:
            keep = qv_ & jnp.isfinite(bd)
        return bt, bd, keep

    return jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(axis_name, None), spec_q, P(axis_name, None), spec_q),
        out_specs=(spec_q, spec_q, spec_q))(q, qv, t, tv)


def ring_match(d_train, d_query, mesh: Mesh, axis_name: str = "data",
               cross_check: bool = True):
    """Sharded BFMatcher.match analog. d_train/d_query: (T,128)/(Q,128) u8 or
    f32 host arrays. Returns (query_idx, train_idx, distance) numpy arrays for
    retained matches — identical to ops.matcher.match_brute_force."""
    n = mesh.shape[axis_name]
    d_query = np.asarray(d_query)
    d_train = np.asarray(d_train)
    # u8 descriptors stay u8 end-to-end on the wire; anything else f32
    u8 = d_query.dtype == np.uint8 and d_train.dtype == np.uint8
    dt = np.uint8 if u8 else np.float32
    q = d_query.astype(dt, copy=False)
    t = d_train.astype(dt, copy=False)
    Q, T = len(q), len(t)
    Qp = -(-max(Q, 1) // n) * n
    Tp = -(-max(T, 1) // n) * n
    qv = np.zeros(Qp, bool)
    qv[:Q] = True
    tv = np.zeros(Tp, bool)
    tv[:T] = True
    qp = np.zeros((Qp, q.shape[1]), dt)
    qp[:Q] = q
    tp = np.zeros((Tp, t.shape[1]), dt)
    tp[:T] = t
    bt, bd, keep = _ring_match_jit(qp, qv, tp, tv, mesh, axis_name, cross_check)
    bt, bd, keep = np.asarray(bt), np.asarray(bd), np.asarray(keep)
    qi = np.nonzero(keep[:Q])[0]
    return qi, bt[qi], bd[qi]
