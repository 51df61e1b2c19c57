"""Phase-level TPU microbench of the round-5 counting-sort grouping.

tools/refine_breakdown.py measured the counting-sort group_by_region at
45.3 ms/batch vs the round-4 argsort version's 32.1 — this decomposes
_stable_bucket_positions into its phases and times the primitive
alternatives (argsort, masked-cumsum radix pass) so the fix targets the
measured cost, not a guess. Run alone on the chip.
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
    L = 128
    C = K // L

    rng = np.random.RandomState(0)
    gkey_np = np.sort(rng.randint(0, NSEG, size=K)).astype(np.int32)
    gkey = jnp.asarray(gkey_np)

    def timed(name, fn, *args, iters=10):
        out = fn(*args)
        s = sum(jnp.asarray(leaf).ravel()[0].astype(jnp.float32)
                for leaf in jax.tree_util.tree_leaves(out))
        float(np.asarray(s))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
            s = sum(jnp.asarray(leaf).ravel()[0].astype(jnp.float32)
                    for leaf in jax.tree_util.tree_leaves(out))
        float(np.asarray(s))
        print(f"{name:>14s}: {(time.perf_counter() - t0) / iters * 1e3:8.2f}"
              " ms", flush=True)

    from sift_features_tpu.ops.pallas.region_group import (
        _stable_bucket_positions)

    timed("csort_full", jax.jit(
        lambda k: _stable_bucket_positions(k, NSEG)), gkey)
    timed("argsort", jax.jit(lambda k: jnp.argsort(k, stable=True)), gkey)

    keyc = gkey.reshape(C, L)

    def hist_scatter(kc):
        return jnp.zeros((C, NSEG), I32).at[
            jnp.arange(C, dtype=I32)[:, None], kc].add(1, mode="drop")

    timed("hist_scatter", jax.jit(hist_scatter), keyc)
    hist = hist_scatter(keyc)

    def hist_1d(k):
        # 1D equivalent (the round-4 counts scatter): chunked key c*NSEG+key
        ck = (jnp.arange(K, dtype=I32) // L) * NSEG + k
        return jnp.zeros((C * NSEG,), I32).at[ck].add(1, mode="drop")

    timed("hist_1d_scat", jax.jit(hist_1d), gkey)

    def hist_cumsum(h):
        return jnp.cumsum(h, axis=0, dtype=I32)

    timed("hist_cumsum", jax.jit(hist_cumsum), hist)

    def tri_occ(kc):
        lane = jnp.arange(L, dtype=I32)
        eq = (kc[:, :, None] == kc[:, None, :]) & (
            lane[:, None] > lane[None, :])
        return jnp.sum(eq, axis=2, dtype=I32)

    timed("tri_occ", jax.jit(tri_occ), keyc)

    def base_gather(h, kc):
        pfx = jnp.cumsum(h, axis=0, dtype=I32) - h
        return jnp.take_along_axis(pfx, kc, axis=1)

    timed("base_gather", jax.jit(base_gather), hist, keyc)

    pos = _stable_bucket_positions(gkey, NSEG)[0]

    def perm_scatter(p):
        return jnp.zeros((K,), I32).at[p].set(
            jnp.arange(K, dtype=I32), unique_indices=True, mode="drop")

    timed("perm_scatter", jax.jit(perm_scatter), pos)

    # masked-cumsum stable counting pass over a 16-value digit (the radix
    # alternative: 3 such passes + 3 permutation applies replace the sort)
    def radix16(k):
        d = k & 15
        eq = (d[None, :] == jnp.arange(16, dtype=I32)[:, None])
        within = jnp.cumsum(eq.astype(I32), axis=1)
        counts = within[:, -1]
        starts = jnp.cumsum(counts) - counts
        sel = jnp.take_along_axis(within, d[None, :], axis=0)[0]
        return jnp.take(starts, d) + sel - 1

    timed("radix16_pass", jax.jit(radix16), gkey)

    def radix36(k):
        d = k % 36
        eq = (d[None, :] == jnp.arange(36, dtype=I32)[:, None])
        within = jnp.cumsum(eq.astype(I32), axis=1)
        counts = within[:, -1]
        starts = jnp.cumsum(counts) - counts
        sel = jnp.take_along_axis(within, d[None, :], axis=0)[0]
        return jnp.take(starts, d) + sel - 1

    timed("radix36_pass", jax.jit(radix36), gkey)

    def apply_perm(p, k):
        return k[p]

    perm = jnp.argsort(gkey, stable=True)
    timed("apply_gather", jax.jit(apply_perm), perm, gkey)


if __name__ == "__main__":
    main()
