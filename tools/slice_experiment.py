"""A/B the octave ½-downsample formulations on TPU.

The device trace (tools/trace_profile.py) shows the fused pipeline's
octave-seed slice `x[:, P:P+2h:2, P:P+2w:2]` lowering to a 35 ms/batch
gather fusion (f32[2073600,4] from the padded octave-0 plane) — XLA turns
the odd-offset stride-2 slice into an index-vector gather. This measures
alternatives at bench shapes. Run alone on the chip.
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
    B, Hp, Wp = 4, 2304, 4096
    P = 8
    h, w = 2160, 3840
    x = jnp.asarray(np.random.rand(B, Hp, Wp).astype(np.float32))

    def timed(name, fn, iters=10):
        out = fn(x)
        float(np.asarray(out.ravel()[0]))   # scalar readback, not the array
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(x)
        float(np.asarray(out.ravel()[0]))
        print(f"{name:>14s}: {(time.perf_counter() - t0) / iters * 1e3:8.2f}"
              f" ms {out.shape}", flush=True)
        return out

    h2, w2 = h // 2, w // 2

    @jax.jit
    def strided(x):
        return x[:, P:P + h2 * 2:2, P:P + w2 * 2:2]

    @jax.jit
    def reshaped(x):
        y = x[:, P:P + h2 * 2, P:P + w2 * 2]
        return y.reshape(B, h2, 2, w2, 2)[:, :, 0, :, 0]

    @jax.jit
    def rows_then_lanes(x):
        y = x[:, P:P + h2 * 2:2, :]          # sublane stride only
        return y[:, :, P:P + w2 * 2:2]       # lane stride only

    @jax.jit
    def matmul_dec(x):
        # lane decimation as an MXU contraction with a 0/1 selector
        y = x[:, P:P + h2 * 2:2, P:P + w2 * 2]      # rows strided, lanes dense
        sel = np.zeros((w2 * 2, w2), np.float32)
        sel[np.arange(w2) * 2, np.arange(w2)] = 1.0
        return jax.lax.dot_general(
            y, jnp.asarray(sel), (((2,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST)

    a = timed("strided", strided)
    b = timed("reshaped", reshaped)
    c = timed("rows_lanes", rows_then_lanes)
    d = timed("matmul_dec", matmul_dec)
    an = np.asarray(a)
    for name, o in [("reshaped", b), ("rows_lanes", c), ("matmul_dec", d)]:
        print(f"  {name} == strided: {np.array_equal(an, np.asarray(o))}")


if __name__ == "__main__":
    main()
