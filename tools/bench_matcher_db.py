"""Database-scale matcher benchmark: int8 vs f32 MXU distance throughput.

Simulates the descriptor-database workload (VERDICT r1 item 5): Q query
descriptors against a T-descriptor database tile on one chip, reporting
distances/s for the f32 and int8 paths plus an exact-equality check of the
retained matches. Run on the real chip: python tools/bench_matcher_db.py
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from sift_features_tpu.ops.matcher import _match_jit

    Q = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 65536
    rng = np.random.RandomState(0)
    dq8 = jnp.asarray(rng.randint(0, 256, (Q, 128)).astype(np.uint8))
    dt8 = jnp.asarray(rng.randint(0, 256, (T, 128)).astype(np.uint8))
    dqf = dq8.astype(jnp.float32)
    dtf = dt8.astype(jnp.float32)

    def timed(name, fn, *args, iters=8):
        out = fn(*args)
        int(np.asarray(out[0])[0])   # host sync (block_until_ready lies here)
        t0 = time.perf_counter()
        s = None
        for _ in range(iters):
            out = fn(*args)
            s = out[0][0]
        int(s)
        dt = (time.perf_counter() - t0) / iters
        print(f"{name:>12s}: {dt * 1e3:8.2f} ms  "
              f"{Q * T / dt / 1e9:8.2f} Gdist/s", flush=True)
        return out

    import os

    o8 = timed("int8 MXU", lambda a, b: _match_jit(a, b, True, True), dt8, dq8)
    of = timed("f32 MXU", lambda a, b: _match_jit(a, b, True), dtf, dqf)
    bt8, d8, k8 = (np.asarray(x) for x in o8)
    btf, df, kf = (np.asarray(x) for x in of)
    assert (bt8 == btf).all() and (k8 == kf).all() and (d8 == df).all(), \
        "int8/f32 mismatch"
    print(f"exact equality OK ({k8.sum()} retained matches)")


if __name__ == "__main__":
    main()
