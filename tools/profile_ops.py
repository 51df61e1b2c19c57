"""Stage micro-profile: the fused-path stages at octave-0 1080p scale
(successor of the round-1/2 profile_ops generations, now the single harness).
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
    from sift_features_tpu.ops.pallas.extrema_kernel import extrema_words
    from sift_features_tpu.ops.pallas.orientation_kernel import (
        orientation_histograms_bucketed, orientation_histograms_pallas)
    from sift_features_tpu.ops.pallas.descriptor_kernel import (
        descriptor_hist_bucketed, descriptor_hist_pallas)
    from sift_features_tpu.ops.pallas.pyramid_kernel import (
        build_octave_padded, reflect_pad_image)

    cfg = DEFAULT_CONFIG
    # octave-0 padded dims for a 1080p frame (seed 2160x3840, P=56)
    HP, WP = 2304, 4096
    H, W = 2160, 3840
    P = desc_ops.PAD_DESC
    rng = np.random.RandomState(0)

    def timed(name, fn, *args, iters=4):
        fn = jax.jit(fn)
        out = fn(*args)
        float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
        t0 = time.perf_counter()
        s = None
        for _ in range(iters):
            out = fn(*args)
            s = jax.tree_util.tree_leaves(out)[0].ravel()[0]
        float(np.asarray(s))
        print(f"{name:>28s}: {(time.perf_counter() - t0) / iters * 1e3:9.3f} ms",
              flush=True)
        return out

    base = jnp.asarray(rng.rand(HP, WP).astype(np.float32))
    g, d = timed("pyramid octave0 (fused)", lambda b: build_octave_padded(b, cfg), base)
    dog = jax.block_until_ready(jnp.asarray(rng.randn(5, HP, WP).astype(np.float32) * 0.05))

    b = cfg.image_border
    bounds = (P + b, P + H - b, P + b, P + W - b)
    words = timed("extrema_words", lambda dd: extrema_words(dd, bounds, 3), dog)
    K = 32768
    timed("find_candidates_words", lambda ww: ext_ops.find_candidates_words(ww, K)[4], words)

    s0, y0, x0, valid, count = ext_ops.find_candidates_words(words, K)
    n_real = int(np.asarray(count))
    print(f"  (real extrema count on noise: {n_real})")
    s0, y0, x0, valid = (jax.block_until_ready(v) for v in (s0, y0, x0, valid))
    timed("refine_tpu 5 steps", lambda: ext_ops.refine_tpu(dog, s0, y0, x0, valid, P, H, W, cfg)["response"])

    # survivor-ish batch for window kernels
    K2 = 8192
    n_surv = 7000
    sc = rng.randint(1, 4, K2).astype(np.int32)
    ks = (1.6 * 2.0 ** ((sc + (rng.rand(K2) - 0.5) * 0.999) / 3.0)).astype(np.float32)
    yc = rng.randint(0, H, K2).astype(np.int32)
    xc = rng.randint(0, W, K2).astype(np.int32)
    gp = jax.block_until_ready(g)
    sj, yj, xj, kj = map(jnp.asarray, (sc, yc, xc, ks))
    cnt = jnp.int32(n_surv)

    timed("orientation full-window", lambda: orientation_histograms_pallas(
        gp, sj - 1, yj, xj, kj, cnt, H, W, P, cfg))
    timed("orientation bucketed", lambda: orientation_histograms_bucketed(
        gp, sj - 1, sj, yj, xj, kj, cnt, H, W, P, cfg))

    M = 8192
    n_emit = 7000
    ang = jnp.asarray((rng.rand(M) * 360).astype(np.float32))
    timed("descriptor full-window", lambda: descriptor_hist_pallas(
        gp, sj - 1, xj, yj, kj, ang, cnt, H, W, P, cfg))
    timed("descriptor bucketed", lambda: descriptor_hist_bucketed(
        gp, sj - 1, sj, xj, yj, kj, ang, cnt, H, W, P, cfg))


if __name__ == "__main__":
    main()
