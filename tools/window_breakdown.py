"""On-TPU breakdown of the orientation/descriptor window stages.

The round-4 ablation has orient +22.5 and desc+final +35.3 ms/frame — the
two biggest post-refine stages. Both deltas bundle several distinct costs:

  ori_full    orientation_histograms_bucketed on real survivors (3 bucket
              kernels + per-bucket compaction/gather/scatter wrapper)
  ori_wrap0   same call, live = all-False: wrapper + dead-grid cost only
  ori_perkey  same inputs, window_kernel="perkey": ~p x the VPU work with
              the SAME per-candidate DMA schedule (packed vs perkey gap
              isolates compute share; perkey ~ packed => DMA-bound)
  peaks       orientation_peaks + emission compaction + keypoint gathers
              (the XLA tail the ablation folds into "orientation")
  desc_full / desc_wrap0 / desc_perkey   descriptor analogs
  final       finalize_descriptor (fold + cap + quantize)

Run alone on the chip: python tools/window_breakdown.py [octave]
"""

import dataclasses
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
    from sift_features_tpu.models.extractor import _octave_capacities
    from sift_features_tpu.ops import descriptor as desc_ops
    from sift_features_tpu.ops import extrema as ext_ops
    from sift_features_tpu.ops import orientation as ori_ops
    from sift_features_tpu.ops import pyramid as pyr_ops
    from sift_features_tpu.ops.extrema import rust_round
    from sift_features_tpu.ops.pallas.descriptor_kernel import (
        descriptor_hist_bucketed)
    from sift_features_tpu.ops.pallas.extrema_kernel import (
        extrema_words_batched)
    from sift_features_tpu.ops.pallas.orientation_kernel import (
        orientation_histograms_bucketed)
    from sift_features_tpu.ops.pallas.pyramid_kernel import (
        build_octave_padded_batched, reflect_pad_image)
    from sift_features_tpu.utils.compact import compact_indices

    octave = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    B = 4
    frames = make_frames(B)
    P = desc_ops.PAD_DESC

    @jax.jit
    def stacks(imgs):
        initial = pyr_ops.create_seed_image(imgs, cfg)
        for o in range(octave + 1):
            h, w = initial.shape[-2], initial.shape[-1]
            h_pad = -(-(h + 2 * P) // 128) * 128
            w_pad = -(-(w + 2 * P) // 128) * 128
            if w_pad > 1536:
                w_pad = -(-w_pad // 1024) * 1024
            base = jax.vmap(lambda im: reflect_pad_image(
                im, P, w_pad - w - 2 * P, h_pad - h - 2 * P))(initial)
            g, d, _ = build_octave_padded_batched(base, cfg, False)
            sp = cfg.scales_per_octave
            initial = g[:, sp - 1, P:P + (h // 2) * 2:2,
                        P:P + (w // 2) * 2:2]
        return g, d

    gauss_p, dog_p = stacks(jnp.asarray(frames))
    h, w = frames.shape[1] * 2, frames.shape[2] * 2
    for _ in range(octave):
        h, w = h // 2, w // 2
    B, n_planes = dog_p.shape[0], dog_p.shape[1]
    hp, wp = dog_p.shape[-2], dog_p.shape[-1]
    K, K2, M = _octave_capacities(h, w, cfg)
    b_ = cfg.image_border
    bounds = (P + b_, P + h - b_, P + b_, P + w - b_)
    nb_ = cfg.n_orientation_bins

    # ---- reproduce the pipeline up to the orientation stage inputs ----
    @jax.jit
    def survivors(gauss_p, dog_p):
        words = extrema_words_batched(dog_p, bounds, cfg.scales_per_octave,
                                      False)
        s0, y0, x0, valid, n_cand = jax.vmap(
            lambda ww: ext_ops.find_candidates_words(ww, K))(words)
        dog_flat = dog_p.reshape(B * n_planes, hp, wp)
        poff_k = jnp.repeat(jnp.arange(B, dtype=jnp.int32) * n_planes, K)
        ref = ext_ops.refine_tpu_auto(
            dog_flat, s0.reshape(-1), y0.reshape(-1), x0.reshape(-1),
            valid.reshape(-1), P, h, w, cfg, plane_off=poff_k)
        keep = (ref["keep"] & valid.reshape(-1)).reshape(B, K)
        sidx, svalid, n_surv = jax.vmap(
            lambda m: compact_indices(m, K2))(keep)

        def g2(a):
            return jnp.take_along_axis(a.reshape(B, K), sidx, axis=1)

        s = g2(ref["s"])
        y = g2(ref["y"]) - P
        x = g2(ref["x"]) - P
        kp_scale = ori_ops.kp_scale_of(s, g2(ref["off_s"]), cfg)
        return (s, y, x, g2(ref["off_y"]), g2(ref["off_x"]),
                g2(ref["response"]), kp_scale, svalid, n_surv)

    s, y, x, off_y, off_x, resp, kp_scale, svalid, n_surv = jax.block_until_ready(
        survivors(gauss_p, dog_p))
    n_sv = int(np.asarray(n_surv).sum())
    print(f"octave {octave}: {h}x{w}  K={K} K2={K2} M={M}  "
          f"survivors={n_sv} ({n_sv / B:.0f}/frame)", flush=True)

    gauss_flat = gauss_p.reshape(B * n_planes, hp, wp)
    poff_k2 = jnp.repeat(jnp.arange(B, dtype=jnp.int32) * n_planes, K2)
    live2 = svalid.reshape(-1)
    s_img = (s - 1).reshape(-1) + poff_k2
    s_lvl = s.reshape(-1)
    yf, xf = y.reshape(-1), x.reshape(-1)
    scf = kp_scale.reshape(-1)
    count2 = jnp.sum(n_surv)

    def sync(out):
        leaves = jax.tree_util.tree_leaves(out)
        ss = sum(leaf.ravel()[0].astype(jnp.float32) for leaf in leaves)
        return float(np.asarray(ss))

    def timed(name, fn, *args, iters=8):
        out = fn(*args)
        sync(out)
        out = fn(*args)
        sync(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
            leaves = jax.tree_util.tree_leaves(out)
            ss = sum(leaf.ravel()[0].astype(jnp.float32) for leaf in leaves)
        float(np.asarray(ss))
        dt = (time.perf_counter() - t0) / iters
        print(f"{name:>11s}: {dt * 1e3:8.2f} ms/batch", flush=True)
        return out

    cfg_pk = dataclasses.replace(cfg, window_kernel="perkey")

    # ---- orientation stage ----
    ori = jax.jit(lambda gf, si, sl, yy, xx, sc, lv: (
        orientation_histograms_bucketed(gf, si, sl, yy, xx, sc, count2,
                                        h, w, P, cfg, live=lv)))
    hist = timed("ori_full", ori, gauss_flat, s_img, s_lvl, yf, xf, scf,
                 live2)
    timed("ori_wrap0", ori, gauss_flat, s_img, s_lvl, yf, xf, scf,
          jnp.zeros_like(live2))
    ori_pk = jax.jit(lambda gf, si, sl, yy, xx, sc, lv: (
        orientation_histograms_bucketed(gf, si, sl, yy, xx, sc, count2,
                                        h, w, P, cfg_pk, live=lv)))
    timed("ori_perkey", ori_pk, gauss_flat, s_img, s_lvl, yf, xf, scf, live2)

    # round-5 mask-dispatched wrapper (no compaction/restore machinery)
    from sift_features_tpu.ops.pallas.orientation_kernel import (
        orientation_histograms_masked)

    ori_m = jax.jit(lambda gf, si, sl, yy, xx, sc, lv: (
        orientation_histograms_masked(gf, si, sl, yy, xx, sc,
                                      h, w, P, cfg, live=lv)))
    hist_m = timed("ori_masked", ori_m, gauss_flat, s_img, s_lvl, yf, xf,
                   scf, live2)
    timed("ori_mask0", ori_m, gauss_flat, s_img, s_lvl, yf, xf, scf,
          jnp.zeros_like(live2))
    lv_np = np.asarray(live2)
    print("  ori masked == bucketed:",
          bool(np.array_equal(np.asarray(hist_m)[lv_np],
                              np.asarray(hist)[lv_np])), flush=True)

    # ---- peaks + emission compaction + gathers (the XLA tail) ----
    @jax.jit
    def peaks(hist, svalid, y, x, off_y, off_x, kp_scale, resp, s):
        angles, emit = ori_ops.orientation_peaks(hist, cfg)
        angles = angles.reshape(B, K2 * nb_)
        emit = (emit.reshape(B, K2, nb_)
                & svalid[:, :, None]).reshape(B, K2 * nb_)
        eidx, evalid, n_emit = jax.vmap(
            lambda m: compact_indices(m, M))(emit)
        ci = eidx // nb_
        kp_angle = jnp.where(
            evalid, jnp.take_along_axis(angles, eidx, axis=1),
            jnp.float32(0.0))

        def gc(a):
            return jnp.take_along_axis(a, ci, axis=1)

        x_oct = gc(x.astype(jnp.float32)) + gc(off_x)
        y_oct = gc(y.astype(jnp.float32)) + gc(off_y)
        xi = rust_round(x_oct).astype(jnp.int32)
        yi = rust_round(y_oct).astype(jnp.int32)
        return (gc(s), xi, yi, gc(kp_scale), kp_angle, evalid, n_emit)

    kp_s, xi, yi, kp_sc, kp_angle, evalid, n_emit = timed(
        "peaks", peaks, hist, svalid, y, x, off_y, off_x, kp_scale, resp, s)
    n_em = int(np.asarray(n_emit).sum())
    print(f"  emitted={n_em} ({n_em / B:.0f}/frame)", flush=True)

    # ---- descriptor stage ----
    poff_m = jnp.repeat(jnp.arange(B, dtype=jnp.int32) * n_planes, M)
    sm_img = (kp_s - 1).reshape(-1) + poff_m
    sm_lvl = kp_s.reshape(-1)
    xim, yim = xi.reshape(-1), yi.reshape(-1)
    scm = kp_sc.reshape(-1)
    angm = kp_angle.reshape(-1)
    livem = evalid.reshape(-1)
    countm = jnp.sum(n_emit)

    desc = jax.jit(lambda gf, si, sl, xx, yy, sc, an, lv: (
        descriptor_hist_bucketed(gf, si, sl, xx, yy, sc, an, countm,
                                 h, w, P, cfg, live=lv)))
    h128 = timed("desc_full", desc, gauss_flat, sm_img, sm_lvl, xim, yim,
                 scm, angm, livem)
    timed("desc_wrap0", desc, gauss_flat, sm_img, sm_lvl, xim, yim,
          scm, angm, jnp.zeros_like(livem))
    desc_pk = jax.jit(lambda gf, si, sl, xx, yy, sc, an, lv: (
        descriptor_hist_bucketed(gf, si, sl, xx, yy, sc, an, countm,
                                 h, w, P, cfg_pk, live=lv)))
    timed("desc_perkey", desc_pk, gauss_flat, sm_img, sm_lvl, xim, yim,
          scm, angm, livem)

    from sift_features_tpu.ops.pallas.descriptor_kernel import (
        descriptor_hist_masked)

    desc_m = jax.jit(lambda gf, si, sl, xx, yy, sc, an, lv: (
        descriptor_hist_masked(gf, si, sl, xx, yy, sc, an,
                               h, w, P, cfg, live=lv)))
    h128_m = timed("desc_masked", desc_m, gauss_flat, sm_img, sm_lvl, xim,
                   yim, scm, angm, livem)
    timed("desc_mask0", desc_m, gauss_flat, sm_img, sm_lvl, xim, yim,
          scm, angm, jnp.zeros_like(livem))
    lvm_np = np.asarray(livem)
    print("  desc masked == bucketed:",
          bool(np.array_equal(np.asarray(h128_m)[lvm_np],
                              np.asarray(h128)[lvm_np])), flush=True)

    fin = jax.jit(lambda hh: desc_ops.finalize_descriptor(hh, cfg))
    timed("final", fin, h128)

    # per-bucket occupancy (what a region-shared kernel would amortize)
    from sift_features_tpu.ops.pallas.descriptor_kernel import bucket_radii
    sl_np = np.asarray(sm_lvl)[np.asarray(livem)]
    for si in bucket_radii(cfg):
        cnt = int((sl_np == si).sum())
        print(f"  desc bucket s={si}: {cnt} kps "
              f"({cnt / max(n_em, 1) * 100:.0f}%)", flush=True)


if __name__ == "__main__":
    main()
