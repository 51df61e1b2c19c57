"""Micro-profile of group_by_region's internal phases on TPU.

Decomposes the measured ~56 ms/batch grouping cost (tools/refine_breakdown.py,
octave 0, 131072 lanes) into: argsort(gkey), argsort(perm), the NSEG
searchsorted pair, and the T_cap slot machinery — to decide which part the
round-4 restructuring must eliminate. Run alone on the chip.
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from sift_features_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    I32 = jnp.int32
    K = 131072
    NR = 1152
    n_frames = 4
    NSEG = n_frames * (NR + 1)
    BK = 32
    T_cap = -(-(K + n_frames * NR * BK) // BK) * BK

    rng = np.random.RandomState(0)
    # realistic clustered keys: sorted-ish per frame with noise
    gkey = np.sort(rng.randint(0, NSEG, size=K)).astype(np.int32)
    gkey = jnp.asarray(gkey)

    def timed(name, fn, *args, iters=10):
        out = fn(*args)
        jax.block_until_ready(out)
        s = sum(jnp.asarray(leaf).ravel()[0].astype(jnp.float32)
                for leaf in jax.tree_util.tree_leaves(out))
        float(np.asarray(s))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
            s = sum(jnp.asarray(leaf).ravel()[0].astype(jnp.float32)
                    for leaf in jax.tree_util.tree_leaves(out))
        float(np.asarray(s))
        print(f"{name:>12s}: {(time.perf_counter() - t0) / iters * 1e3:8.2f} ms",
              flush=True)

    timed("argsort_K", jax.jit(lambda k: jnp.argsort(k, stable=True)), gkey)

    perm = jnp.argsort(gkey, stable=True)
    timed("argsort2_K", jax.jit(lambda p: jnp.argsort(p, stable=True)), perm)

    sorted_keys = gkey[perm]
    seg_ids = jnp.arange(NSEG, dtype=I32)

    def seg_bounds(sk):
        starts = jnp.searchsorted(sk, seg_ids, side="left").astype(I32)
        ends = jnp.searchsorted(sk, seg_ids, side="right").astype(I32)
        return starts, ends

    timed("searchNSEG", jax.jit(seg_bounds), sorted_keys)

    starts, ends = seg_bounds(sorted_keys)
    counts = ends - starts
    padded = -(-counts // BK) * BK
    cum = jnp.cumsum(padded)
    offsets = cum - padded

    def slot_machinery(cum, offsets, starts, counts, perm):
        slots = jnp.arange(T_cap, dtype=I32)
        seg = jnp.searchsorted(cum, slots, side="right").astype(I32)
        seg_c = jnp.minimum(seg, NSEG - 1)
        rank = slots - offsets[seg_c]
        active = (seg < NSEG) & (rank < counts[seg_c])
        src = perm[jnp.clip(starts[seg_c] + rank, 0, K - 1)]
        return seg_c, active, src

    timed("slots_Tcap", jax.jit(slot_machinery), cum, offsets, starts,
          counts, perm)

    def gathers(src, active):
        a = jnp.where(active, src, 0)
        return a + jnp.where(active, src, 1)

    src = slot_machinery(cum, offsets, starts, counts, perm)[2]
    act = slot_machinery(cum, offsets, starts, counts, perm)[1]
    timed("gathers", jax.jit(gathers), src, act)


if __name__ == "__main__":
    main()
