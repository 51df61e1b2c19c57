"""Compiled-numerics check of the Pallas kernels vs their XLA twins ON TPU
(interpret mode already matches; this catches compiled-lowering bugs).
Usage: python tools/kernel_check.py
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np  # noqa: E402


def main():
    import jax.numpy as jnp

    from sift_features_tpu.config import DEFAULT_CONFIG
    from sift_features_tpu.ops import descriptor as desc_ops
    from sift_features_tpu.ops import extrema as ext_ops
    from sift_features_tpu.ops import orientation as ori_ops
    from sift_features_tpu.ops.pallas.descriptor_kernel import descriptor_hist_pallas
    from sift_features_tpu.ops.pallas.orientation_kernel import (
        orientation_histograms_pallas)
    from sift_features_tpu.ops.pallas.refine_kernel import refine_step_pallas

    cfg = DEFAULT_CONFIG
    rng = np.random.RandomState(0)
    h, w = 128, 320
    gauss = rng.rand(6, h, w).astype(np.float32)
    gp = desc_ops.pad_stack_for_kernels(jnp.asarray(gauss))
    P = desc_ops.PAD_DESC
    K = 24
    count = 17
    s = rng.randint(1, 4, K).astype(np.int32)
    y = rng.randint(8, h - 8, K).astype(np.int32)
    x = rng.randint(8, w - 8, K).astype(np.int32)
    ks = (rng.rand(K).astype(np.float32) * 2.0 + 1.6)
    ang = (rng.rand(K) * 360).astype(np.float32)
    valid = np.arange(K) < count
    for a in (s, y, x, ks, ang):
        a[count:] = 0

    # refine step
    dog = rng.randn(5, h, w).astype(np.float32) * 0.05
    dp = desc_ops.pad_stack_for_kernels(jnp.asarray(dog))
    out = np.asarray(refine_step_pallas(
        dp, jnp.asarray(s), jnp.asarray(y + P), jnp.asarray(x + P),
        jnp.asarray(valid.astype(np.int32)), dp.shape[2], cfg))
    cube = ext_ops._gather_cubes(jnp.asarray(dog), jnp.asarray(s),
                                 jnp.asarray(y), jnp.asarray(x))
    ref = {k2: np.asarray(v) for k2, v in
           ext_ops._newton_from_cubes(cube, cfg).items()}
    a_ = slice(0, count)
    ok_off = np.abs(out[a_, 4] - ref["off_s"][a_]).max()
    print(f"refine: ok match {(out[a_,0]>0).tolist()==ref['ok'][a_].tolist()}, "
          f"max off_s err {ok_off:.2e}", flush=True)

    # orientation
    hp = np.asarray(orientation_histograms_pallas(
        gp, jnp.asarray(s), jnp.asarray(y), jnp.asarray(x), jnp.asarray(ks),
        count, h, w, P, cfg))
    hj = np.asarray(ori_ops.orientation_histograms(
        gp, h, w, jnp.asarray(s), jnp.asarray(y), jnp.asarray(x),
        jnp.asarray(ks), jnp.asarray(valid), cfg, pad=P))
    d = np.abs(hp[:count] - hj[:count])
    rel = d.max() / (np.abs(hj[:count]).max() + 1e-9)
    print(f"orientation: max abs err {d.max():.3e} rel {rel:.3e}", flush=True)

    # descriptor
    from sift_features_tpu.ops.extrema import rust_round

    xf = x.astype(np.float32)
    yf = y.astype(np.float32)
    xi = np.asarray(rust_round(jnp.asarray(xf))).astype(np.int32)
    yi = np.asarray(rust_round(jnp.asarray(yf))).astype(np.int32)
    hist = descriptor_hist_pallas(
        gp, jnp.asarray(s), jnp.asarray(xi), jnp.asarray(yi),
        jnp.asarray(ks), jnp.asarray(ang), count, h, w, P, cfg)
    desc_p = np.asarray(desc_ops.finalize_descriptor(hist, cfg))
    desc_j = np.asarray(desc_ops.descriptor_batch(
        gp, h, w, jnp.asarray(s), jnp.asarray(xf), jnp.asarray(yf),
        jnp.asarray(ks), jnp.asarray(ang), jnp.asarray(valid), cfg))
    dd = np.abs(desc_p[:count].astype(int) - desc_j[:count].astype(int))
    print(f"descriptor: max byte err {dd.max()}, frac>1 {(dd>1).mean():.4f}",
          flush=True)


if __name__ == "__main__":
    main()
