"""Calibrate per-dispatch overhead vs in-graph op cost on the axon tunnel.

csort_profile.py times each grouping phase as its OWN jit; on this backend a
separate dispatch carries tunnel overhead that can dwarf the op. This tool
times each primitive twice: as a single dispatch, and as R=8 data-dependent
in-graph repetitions (cost = slope between R=8 and R=1 per extra rep), so
the grouping redesign targets real op costs. Run alone on the chip.
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
    NSEG = 4612
    rng = np.random.RandomState(0)
    gkey = jnp.asarray(np.sort(rng.randint(0, NSEG, size=K)).astype(np.int32))
    perm = jnp.asarray(rng.permutation(K).astype(np.int32))

    def timed(name, fn, *args, iters=10):
        # block_until_ready returns BEFORE device execution completes on
        # this backend (see bench.py NOTE); sync via an output-derived
        # scalar host transfer instead
        out = fn(*args)
        float(np.asarray(out.ravel()[0]))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        float(np.asarray(out.ravel()[0]))
        dt = (time.perf_counter() - t0) / iters * 1e3
        print(f"{name:>16s}: {dt:8.2f} ms", flush=True)
        return dt

    def rep(op, r):
        # r data-dependent repetitions (perturb input by iteration index so
        # XLA cannot CSE them away)
        def f(x):
            def body(i, acc):
                return acc ^ op(acc ^ i)
            return jax.lax.fori_loop(0, r, body, x)
        return jax.jit(f)

    ops = {
        "noop": lambda x: x ^ 1,
        "argsort": lambda x: jnp.argsort(x, stable=True).astype(I32),
        "gather_k": lambda x: x[jnp.clip(jnp.abs(x), 0, K - 1)],
        "scatter_set": lambda x: jnp.zeros((K,), I32).at[
            jnp.clip(jnp.abs(x), 0, K - 1)].set(x, unique_indices=False,
                                                mode="drop"),
        "scatter_add": lambda x: jnp.zeros((NSEG,), I32).at[
            jnp.clip(jnp.abs(x) % NSEG, 0, NSEG - 1)].add(
                1, mode="drop")[jnp.clip(jnp.abs(x) % NSEG, 0, NSEG - 1)],
        "sorted_gath": lambda x: x[jnp.argsort(x, stable=True)],
        "searchsorted": lambda x: jnp.searchsorted(
            gkey, jnp.clip(jnp.abs(x) % NSEG, 0, NSEG - 1)).astype(I32)[
                jnp.arange(K, dtype=I32)],
        "cumsum_k": lambda x: jnp.cumsum(x, dtype=I32),
    }
    for name, op in ops.items():
        t1 = timed(name + "_r1", rep(op, 1), perm)
        t8 = timed(name + "_r8", rep(op, 8), perm)
        print(f"{name:>16s}: per-op {(t8 - t1) / 7:8.2f} ms "
              f"(dispatch+ {t1 - (t8 - t1) / 7:6.2f})", flush=True)


if __name__ == "__main__":
    main()
