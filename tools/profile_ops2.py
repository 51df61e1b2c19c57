"""Micro-profile v2: the reworked detection components on the real chip.
Usage: python tools/profile_ops2.py
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from sift_features_tpu.config import DEFAULT_CONFIG
    from sift_features_tpu.ops import descriptor as desc_ops
    from sift_features_tpu.ops import extrema as ext_ops
    from sift_features_tpu.ops import orientation as ori_ops
    from sift_features_tpu.utils.compact import compact_indices

    cfg = DEFAULT_CONFIG
    H, W = 2160, 3840
    rng = np.random.RandomState(0)

    def timed(name, fn, *args, iters=4):
        f = jax.jit(fn)
        out = f(*args)
        float(jax.tree_util.tree_leaves(out)[0].ravel()[0].astype(jnp.float32))
        t0 = time.perf_counter()
        s = None
        for _ in range(iters):
            out = f(*args)
            s = jax.tree_util.tree_leaves(out)[0].ravel()[0]
        float(s.astype(jnp.float32))
        dt = (time.perf_counter() - t0) / iters
        print(f"{name:>30s}: {dt * 1e3:9.3f} ms", flush=True)
        return out

    gauss = jnp.asarray(rng.rand(6, H, W).astype(np.float32))
    dog = jax.block_until_ready(gauss[1:] - gauss[:-1])
    mask_np = rng.rand(3 * H * W) < 0.0011
    mask = jnp.asarray(mask_np)

    timed("extrema_mask(rw)", lambda d: ext_ops.extrema_mask(d, cfg), dog)
    timed("compact 24.9M->32k", lambda m: compact_indices(m, 32768)[0], mask)

    K = 32768
    idx = np.nonzero(mask_np)[0][:K]
    count = len(idx)
    sc = np.zeros(K, np.int32)
    yc = np.zeros(K, np.int32)
    xc = np.zeros(K, np.int32)
    sc[:count] = idx[:count] // (H * W) + 1
    yc[:count] = (idx[:count] % (H * W)) // W
    xc[:count] = idx[:count] % W
    yc = np.clip(yc, 8, H - 9)
    xc = np.clip(xc, 8, W - 9)
    valid = np.arange(K) < count
    sj, yj, xj, vj = map(jnp.asarray, (sc, yc, xc, valid))

    timed("gather_cubes 32k", lambda d, s, y, x: ext_ops._gather_cubes(d, s, y, x),
          dog, sj, yj, xj)
    timed("refine 32k(5 steps)",
          lambda d, s, y, x, v: ext_ops.refine(d, s, y, x, v, cfg)["response"],
          dog, sj, yj, xj, vj)

    K2 = 8192
    s2 = jnp.asarray(np.clip(sc[:K2], 1, 3))
    y2 = jnp.asarray(yc[:K2])
    x2 = jnp.asarray(xc[:K2])
    ks2 = jnp.asarray((rng.rand(K2) * 2 + 2).astype(np.float32))
    v2 = jnp.asarray(np.arange(K2) < 6000)
    gp = jax.block_until_ready(desc_ops.pad_stack_for_kernels(gauss))

    timed("ori_blocked 8k(cnt=6k)",
          lambda g, s, y, x, k, v: ori_ops.orientation_histograms_blocked(
              g, H, W, s, y, x, k, v, cfg, pad=desc_ops.PAD_DESC,
              count=jnp.int32(6000)),
          gp, s2, y2, x2, ks2, v2, iters=2)

    from sift_features_tpu.ops.pallas.orientation_kernel import (
        orientation_histograms_pallas)

    timed("ori_PALLAS 8k(cnt=6k)",
          lambda g, s, y, x, k: orientation_histograms_pallas(
              g, s, y, x, k, jnp.int32(6000), H, W, cfg),
          gp, s2, y2, x2, ks2, iters=2)

    aM = jnp.asarray((rng.rand(K2) * 360).astype(np.float32))
    xf = x2.astype(jnp.float32)
    yf = y2.astype(jnp.float32)
    timed("desc_blocked 8k(cnt=6k)",
          lambda g, s, x, y, k, a, v: desc_ops.descriptor_batch_blocked(
              g, H, W, s, x, y, k, a, v, cfg, count=jnp.int32(6000)),
          gp, s2, xf, yf, ks2, aM, v2, iters=2)

    from sift_features_tpu.ops.pallas.descriptor_kernel import descriptor_hist_pallas

    timed("desc_PALLAS 8k(cnt=6k)",
          lambda g, s, x, y, k, a: desc_ops.finalize_descriptor(
              descriptor_hist_pallas(g, s, x, y, k, a, jnp.int32(6000),
                                     H, W, cfg), cfg),
          gp, s2, x2, y2, ks2, aM, iters=2)


if __name__ == "__main__":
    main()
