"""Micro-profile of individual detection/description ops at octave-0 1080p
scale on the real chip, with honest (host-transfer) sync. Also prints the
per-octave stage counters for a real 1080p frame so capacities can be sized.

Usage: python tools/profile_ops.py
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

    cfg = DEFAULT_CONFIG
    H, W = 2160, 3840
    S = 6
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
        print(f"{name:>28s}: {dt * 1e3:9.3f} ms")

    gauss = jnp.asarray(rng.rand(S, H, W).astype(np.float32))
    dog = gauss[1:] - gauss[:-1]
    dog = jax.block_until_ready(dog)

    timed("extrema_mask", lambda d: ext_ops.extrema_mask(d, cfg), dog)
    timed("dense_cube_fields",
          lambda d: ext_ops._dense_cube_fields(d, cfg)["off_s"], dog)

    K, K2, M = 32768, 8192, 8192
    s_idx = jnp.asarray(rng.randint(1, 4, K2).astype(np.int32))
    y = jnp.asarray(rng.randint(16, H - 16, K2).astype(np.int32))
    x = jnp.asarray(rng.randint(16, W - 16, K2).astype(np.int32))
    kp_scale = jnp.asarray((rng.rand(K2) * 2 + 2).astype(np.float32))
    valid = jnp.ones(K2, bool)

    gp = jnp.pad(gauss, ((0, 0), (desc_ops.PAD_DESC, desc_ops.PAD_DESC),
                         (desc_ops.PAD_DESC, desc_ops.PAD_DESC)))
    gp = jax.block_until_ready(gp)

    timed("orientation_histograms(8k)",
          lambda g, s_, y_, x_, ks, v: ori_ops.orientation_histograms(
              g, H, W, s_, y_, x_, ks, v, cfg, pad=desc_ops.PAD_DESC),
          gp, s_idx, y, x, kp_scale, valid, iters=2)

    sM = jnp.asarray(rng.randint(1, 4, M).astype(np.int32))
    xM = jnp.asarray(rng.randint(16, W - 16, M).astype(np.float32))
    yM = jnp.asarray(rng.randint(16, H - 16, M).astype(np.float32))
    ksM = jnp.asarray((rng.rand(M) * 2 + 2).astype(np.float32))
    aM = jnp.asarray((rng.rand(M) * 360).astype(np.float32))
    vM = jnp.ones(M, bool)

    timed("descriptor_batch_8k(b32)",
          lambda g, s_, x_, y_, k_, a_, v_: desc_ops.descriptor_batch_blocked(
              g, H, W, s_, x_, y_, k_, a_, v_, cfg, block=32),
          gp, sM, xM, yM, ksM, aM, vM, iters=2)

    timed("compaction(3HW->32k)",
          lambda m: ext_ops.find_candidates(m, K)[0],
          jnp.asarray(rng.rand(3, H, W) > 0.999))

    # real-image per-octave counters at 1080p
    from bench import make_frames
    from sift_features_tpu.models.extractor import extract_batch

    res = extract_batch(make_frames(1), cfg)
    print("n_candidates:", np.asarray(res["n_candidates"])[0].tolist())
    print("n_survivors :", np.asarray(res["n_survivors"])[0].tolist())
    print("n_emitted   :", np.asarray(res["n_emitted"])[0].tolist())


if __name__ == "__main__":
    main()
