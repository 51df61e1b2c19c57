"""On-TPU breakdown of the walk-refinement stage at pipeline conditions.

The round-3 ablation showed refine_mode="walk" costing the same end-to-end
as "step" (~67 ms/frame) although the walk kernel microbenches 30% faster
per candidate (tools/check_tile_refine.py bench). This tool isolates where
the pipeline-context time goes, on REAL octave-0/1 candidates from the
bench frame (clustered density, ~72% padding lanes):

  group   group_by_region alone (argsorts + slot layout)
  walk    full refine_walk_tpu (group + kernel + fallback + merge)
  step    refine_tpu per-step loop (the "step" mode baseline)
  fb0     per-step loop on an all-False active mask — the fixed cost the
          walk path pays for its fallback even when nothing escapes

Run alone on the chip: python tools/refine_breakdown.py [octave]
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
    from bench import make_frames
    from sift_features_tpu.config import DEFAULT_CONFIG as cfg
    from sift_features_tpu.models import extractor
    from sift_features_tpu.models.extractor import _octave_capacities
    from sift_features_tpu.ops import descriptor as desc_ops
    from sift_features_tpu.ops import extrema as ext_ops
    from sift_features_tpu.ops.pallas.extrema_kernel import (
        extrema_words_batched)
    from sift_features_tpu.ops.pallas.region_group import group_by_region
    from sift_features_tpu.ops.pallas.refine_walk_kernel import (
        BK, REG_C, REG_R, WIN_C, WIN_R, refine_walk_tpu)

    octave = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    B = 4
    frames = make_frames(B)

    # build octave stacks exactly like the fused pipeline does
    from sift_features_tpu.ops import pyramid as pyr_ops
    from sift_features_tpu.ops.pallas.pyramid_kernel import (
        build_octave_padded_batched, reflect_pad_image)

    P0 = desc_ops.PAD_DESC

    @jax.jit
    def stacks(imgs):
        initial = pyr_ops.create_seed_image(imgs, cfg)
        for o in range(octave + 1):
            h, w = initial.shape[-2], initial.shape[-1]
            h_pad = -(-(h + 2 * P0) // 128) * 128
            w_pad = -(-(w + 2 * P0) // 128) * 128
            if w_pad > 1536:
                w_pad = -(-w_pad // 1024) * 1024
            base = jax.vmap(lambda im: reflect_pad_image(
                im, P0, w_pad - w - 2 * P0, h_pad - h - 2 * P0))(initial)
            g, d, _ = build_octave_padded_batched(base, cfg, False)
            sp = cfg.scales_per_octave
            initial = g[:, sp - 1, P0:P0 + (h // 2) * 2:2,
                        P0:P0 + (w // 2) * 2:2]
        return d

    dog_p = stacks(jnp.asarray(frames))
    h, w = frames.shape[1] * 2, frames.shape[2] * 2
    for _ in range(octave):
        h, w = h // 2, w // 2
    B, n_planes = dog_p.shape[0], dog_p.shape[1]
    hp, wp = dog_p.shape[-2], dog_p.shape[-1]
    K, K2, M = _octave_capacities(h, w, cfg)
    P = desc_ops.PAD_DESC
    b_ = cfg.image_border
    bounds = (P + b_, P + h - b_, P + b_, P + w - b_)

    @jax.jit
    def candidates(dog_p):
        words = extrema_words_batched(dog_p, bounds, cfg.scales_per_octave,
                                      False)
        return jax.vmap(
            lambda ww: ext_ops.find_candidates_words(ww, K))(words)

    s0, y0, x0, valid, n_cand = candidates(dog_p)
    n_real = int(np.asarray(n_cand).sum())
    print(f"octave {octave}: {h}x{w}, K={K} lanes x {B} frames "
          f"({B * K} total), {n_real} real candidates", flush=True)

    dog_flat = dog_p.reshape(B * n_planes, hp, wp)
    poff = jnp.repeat(jnp.arange(B, dtype=jnp.int32) * n_planes, K)
    sf, yf, xf, vf = (s0.reshape(-1), y0.reshape(-1), x0.reshape(-1),
                      valid.reshape(-1))
    n_dog = cfg.scales_per_octave + 2

    def sync(out):
        leaves = jax.tree_util.tree_leaves(out)
        s = sum(leaf.ravel()[0].astype(jnp.float32) for leaf in leaves)
        return float(np.asarray(s))

    def timed(name, fn, *args, iters=8):
        out = fn(*args)
        sync(out)
        out = fn(*args)
        sync(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
            leaves = jax.tree_util.tree_leaves(out)
            s = sum(leaf.ravel()[0].astype(jnp.float32) for leaf in leaves)
        float(np.asarray(s))
        dt = (time.perf_counter() - t0) / iters
        print(f"{name:>6s}: {dt * 1e3:8.2f} ms/batch "
              f"({dt * 1e9 / max(n_real, 1):7.1f} ns/real-cand)", flush=True)
        return out

    g = group_by_region(sf, yf, xf, vf, P, hp, wp, n_dog, B, poff,
                        REG_R, REG_C, WIN_R, WIN_C, 8, 128, BK)
    n_blocks = g.nb
    n_active = int(np.asarray((g.active_b > 0).sum()))
    n_loads = int(np.asarray(
        ((g.seg_b[1:] != g.seg_b[:-1]).sum() + 1)))
    print(f"layout: T_cap={g.T_cap} nb={n_blocks} active_blocks={n_active} "
          f"window_loads~={n_loads}", flush=True)

    # explicit wrapper (not functools.partial): poff must bind to plane_off,
    # and jit needs jnp-leaf outputs (RegionLayout is not a pytree)
    @jax.jit
    def group_fields(s, y, x, v, po):
        gg = group_by_region(s, y, x, v, P, hp, wp, n_dog, B, po,
                             REG_R, REG_C, WIN_R, WIN_C, 8, 128, BK)
        return (gg.s_slot, gg.y_slot, gg.x_slot, gg.a_slot, gg.seg_b,
                gg.r0_b, gg.c0_b, gg.pb_b, gg.active_b, gg.slot_k)

    timed("group", group_fields, sf, yf, xf, vf, poff)

    walk = jax.jit(lambda d, s, y, x, v: refine_walk_tpu(
        d, s, y, x, v, P, h, w, cfg, plane_off=poff))
    timed("walk", walk, dog_flat, sf, yf, xf, vf)

    step = jax.jit(lambda d, s, y, x, v: ext_ops.refine_tpu(
        d, s, y, x, v, P, h, w, cfg, plane_off=poff))
    timed("step", step, dog_flat, sf, yf, xf, vf)

    # fallback cost in the zero-escape regime: per-step loop on an
    # all-False mask (what merge_escaped pays today even with no escapes)
    zmask = jnp.zeros_like(vf)
    timed("fb0", step, dog_flat, sf, yf, xf, zmask)


if __name__ == "__main__":
    main()
