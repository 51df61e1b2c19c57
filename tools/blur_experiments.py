"""Blur implementation shootout at octave-0 1080p scale on the chip:
current tap-sum vs conv_general_dilated vs full-chain cost.
Usage: python tools/blur_experiments.py
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from sift_features_tpu.config import DEFAULT_CONFIG
    from sift_features_tpu.ops.gaussian import gaussian_blur, gaussian_kernel

    H, W = 2160, 3840
    B = 4
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(B, H, W).astype(np.float32))
    sigma = 1.9365  # largest chain sigma

    def timed(name, fn, *args, iters=6):
        f = jax.jit(fn)
        out = f(*args)
        float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        t0 = time.perf_counter()
        s = None
        for _ in range(iters):
            out = f(*args)
            s = jax.tree_util.tree_leaves(out)[0].ravel()[0]
        float(s)
        dt = (time.perf_counter() - t0) / iters
        gb = B * H * W * 4 * 2 / 1e9
        print(f"{name:>24s}: {dt * 1e3:8.3f} ms  ({gb / dt:6.1f} GB/s rw)",
              flush=True)

    kern = gaussian_kernel(sigma)
    print(f"ksize={len(kern)}")

    timed("tap-sum (current)", lambda a: gaussian_blur(a, sigma), x)

    def conv_blur(a):
        k = jnp.asarray(kern)
        r = len(kern) // 2
        # horizontal then vertical via conv_general_dilated, SAME-style with
        # reflect pad precomputed
        ap = jnp.pad(a, ((0, 0), (r, r), (r, r)), mode="reflect")
        lhs = ap[:, None, :, :]
        kh = k.reshape(1, 1, 1, len(kern))
        kv = k.reshape(1, 1, len(kern), 1)
        o = jax.lax.conv_general_dilated(lhs, kh, (1, 1), "VALID",
                                         precision=jax.lax.Precision.HIGHEST)
        o = jax.lax.conv_general_dilated(o, kv, (1, 1), "VALID",
                                         precision=jax.lax.Precision.HIGHEST)
        return o[:, 0]

    timed("conv_general", conv_blur, x)

    def chain(a):
        from sift_features_tpu.config import DEFAULT_CONFIG as cfg

        imgs = [a]
        for s_ in cfg.octave_sigmas()[1:]:
            imgs.append(gaussian_blur(imgs[-1], s_))
        return jnp.stack(imgs, 1)

    timed("5-blur chain", chain, x)

    # single pass cost floor: one elementwise copy
    timed("copy (x*1.0001)", lambda a: a * np.float32(1.0001), x)


if __name__ == "__main__":
    main()
