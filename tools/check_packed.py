"""On-TPU check: lane-packed orientation/descriptor kernels vs the
per-keypoint kernels — byte equality and timing at realistic density.

Usage: python tools/check_packed.py [K iters]
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
    from sift_features_tpu.config import DEFAULT_CONFIG
    from sift_features_tpu.ops import descriptor as desc_ops
    from sift_features_tpu.ops.pallas.descriptor_kernel import (
        descriptor_hist_pallas)
    from sift_features_tpu.ops.pallas.descriptor_packed import (
        descriptor_hist_packed)
    from sift_features_tpu.ops.pallas.orientation_kernel import (
        orientation_histograms_pallas)
    from sift_features_tpu.ops.pallas.orientation_packed import (
        orientation_histograms_packed)

    K = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    cfg = DEFAULT_CONFIG
    P = desc_ops.PAD_DESC
    h, w = 1080, 1920
    Hp = -(-(h + 2 * P) // 128) * 128
    Wp = -(-(w + 2 * P) // 128) * 128
    rng = np.random.RandomState(5)
    g = np.zeros((6, Hp, Wp), np.float32)
    g[:, P:P + h, P:P + w] = rng.rand(6, h, w).astype(np.float32)
    gj = jnp.asarray(g)

    count = K - 37
    s = rng.randint(0, 6, K).astype(np.int32)
    y = rng.randint(0, h, K).astype(np.int32)
    x = rng.randint(0, w, K).astype(np.int32)
    ks = (rng.rand(K).astype(np.float32) * 2.0 + 0.6)
    ang = (rng.rand(K) * 360).astype(np.float32)

    def timed(name, fn, *args):
        # leading args are device arrays; the tail (counts/config/flags) is
        # static and must be closed over, not traced
        na = 0
        while na < len(args) and isinstance(args[na], jnp.ndarray):
            na += 1
        arrs, tail = args[:na], args[na:]
        f = jax.jit(lambda *a: jnp.sum(fn(*a, *tail)))
        float(f(*arrs))
        args = arrs
        t0 = time.time()
        r = None
        for _ in range(iters):
            r = f(*args)
        float(r)
        dt = (time.time() - t0) / iters
        print(f"  {name}: {dt*1e3:.2f} ms ({dt/count*1e6:.3f} us/cand)",
              flush=True)

    for r_max in (10, 13, 16):
        a = (gj, jnp.asarray(s), jnp.asarray(y), jnp.asarray(x),
             jnp.asarray(ks), count, h, w, P, cfg, False, r_max, False)
        ref = np.asarray(orientation_histograms_pallas(*a))[:count]
        new = np.asarray(orientation_histograms_packed(*a))[:count]
        eq = (ref == new).all()
        print(f"ori r_max={r_max}: byte-equal={eq} "
              f"maxdiff={np.abs(ref - new).max():.3e}", flush=True)
        timed("perkey", orientation_histograms_pallas, *a)
        timed("packed", orientation_histograms_packed, *a)

    for r_max in (24, 30, 38):
        a = (gj, jnp.asarray(s), jnp.asarray(x), jnp.asarray(y),
             jnp.asarray(ks), jnp.asarray(ang), count, h, w, P, cfg,
             False, r_max)
        ref = np.asarray(descriptor_hist_pallas(*a))[:count]
        new = np.asarray(descriptor_hist_packed(*a))[:count]
        eq = (ref == new).all()
        print(f"desc r_max={r_max}: byte-equal={eq} "
              f"maxdiff={np.abs(ref - new).max():.3e}", flush=True)
        timed("perkey", descriptor_hist_pallas, *a)
        timed("packed", descriptor_hist_packed, *a)


if __name__ == "__main__":
    main()
