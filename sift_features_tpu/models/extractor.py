"""End-to-end SIFT extractor (the framework's flagship 'model').

Orchestrates the TPU pipeline per SURVEY.md §3.1's call stack, re-designed
dense/batched/fixed-shape:

    seed -> per-octave [blur chain -> DoG -> extrema mask -> candidate
    compaction -> Newton refinement -> contrast/edge -> survivor compaction
    -> orientation histograms -> (cand, bin) emission compaction ->
    descriptors] -> concatenated fixed-capacity keypoint buffers

Everything under one jit per input shape; batch axis (frames) is the primary
throughput axis. Host-side compaction to ragged numpy arrays happens at the
edge only. The octave chain is serial (lib.rs:241-249) — parallelism comes
from the batch and from each octave's dense ops.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..config import DEFAULT_CONFIG, SiftConfig
from ..ops import descriptor as desc_ops
from ..ops import extrema as ext_ops
from ..ops import orientation as ori_ops
from ..ops import pyramid as pyr_ops
from ..utils.compact import compact_indices

F32 = jnp.float32


def _octave_capacities(h: int, w: int, cfg: SiftConfig):
    """Static per-octave buffer sizes: raw candidates K, survivors K2,
    emitted keypoints M (multiples of 128 for clean blocking).

    Density model (measured on the feature-dense bench frame,
    tools/stage_counts.py round 4): discrete extrema are ~0.11% of DoG
    cells at octave 0 and ~0.10% at octave 1; K allows ~1.8x that
    ((3HW)//512 = 0.195%). Survivors are ~41% of candidates (K/2 gives
    1.45x headroom over the measured worst); multi-orientation emissions
    ~1.24x survivors (3*K2/2 gives ~1.2x). The round-3 sizing used
    (3HW)//192 with K2=K/4: it oversized octave 1+ candidates ~5x (pure
    capacity-proportional overhead) while SILENTLY TRUNCATING 27% of
    octave-0 survivors and 19% of emissions at bench density — the config
    cap already bound octave 0 to a lower density tolerance than the other
    octaves got. Overflows remain observable via the n_candidates /
    n_survivors / n_emitted counters (and bench.py's overflow field)."""
    # cfg.max_candidates_per_octave is honored even below the 512 floor so
    # overflow behavior (scan-order prefix truncation) is testable
    k = min(cfg.max_candidates_per_octave,
            max(512, (3 * h * w) // 512))
    k = -(-k // 128) * 128
    k2 = max(256, k // 2)
    m = min(cfg.max_keypoints_per_octave, max(256, (3 * k2) // 2))
    return k, k2, -(-m // 128) * 128


def _detect_octave(gauss: jnp.ndarray, dog: jnp.ndarray, octave: int,
                   cfg: SiftConfig, padded=None, hw=None, row_range=None,
                   describe: bool = True, interpret: bool = False):
    """Single-image single-octave detection. gauss: (S+3,H,W), dog: (S+2,H,W)
    — OR, when `padded` is given, pre-built padded stacks from the fused
    pyramid kernels: padded = (gauss_slots, dog_p, slot_off) where
    gauss_slots[k] holds Gaussian level k + slot_off and hw = (h, w) is the
    unpadded octave size.

    row_range = (y0, y1) (possibly traced) restricts CANDIDATE rows to
    [y0, y1) — the spatial-parallel path gives each space member its own
    row band so detection work (not just the blurs) is sharded. The Pallas
    branch supports it too: the extrema scan takes the XLA reduce-window
    path (traced bounds), while refinement/orientation/description stay on
    the Pallas kernels (they take explicit candidate lists).

    Returns dict of fixed-capacity (M,) keypoint fields + overflow counters.
    """
    if padded is not None:
        gauss_padded, dog_p, slot_off = padded
        h, w = hw
    else:
        h, w = gauss.shape[-2], gauss.shape[-1]
        slot_off = 0
    K, K2, M = _octave_capacities(h, w, cfg)
    P = desc_ops.PAD_DESC

    if padded is None:
        gauss_padded = desc_ops.pad_stack_for_kernels(gauss)
    # Pallas kernels need the padded plane to cover a 256-lane aligned DMA
    use_pallas = (((cfg.use_pallas and jax.devices()[0].platform == "tpu")
                   or interpret)
                  and gauss_padded.shape[-1] >= 256)

    if use_pallas:
        # padded-coordinate detection: the DoG is formed in the padded
        # layout (no unpadded copy is ever materialized) and refinement
        # runs in the DMA'd Pallas kernel
        if padded is None:
            dog_p = gauss_padded[1:] - gauss_padded[:-1]
        b = cfg.image_border
        if row_range is None:
            bounds = (P + b, P + h - b, P + b, P + w - b)
        else:
            # spatial row band (possibly traced): padded coords
            bounds = (jnp.maximum(P + b, P + row_range[0]),
                      jnp.minimum(P + h - b, P + row_range[1]),
                      P + b, P + w - b)
        hp, wp = dog_p.shape[-2], dog_p.shape[-1]
        if (row_range is None and hp % 128 == 0
                and (wp <= 1536 or wp % 1024 == 0)):
            # fused extrema + MXU bit-pack kernel; compaction on words
            from ..ops.pallas.extrema_kernel import extrema_words

            words = extrema_words(dog_p, bounds, cfg.scales_per_octave,
                                  interpret)
            s0, y0, x0, valid, n_cand = ext_ops.find_candidates_words(words, K)
        else:
            # traced bounds (row bands) take the XLA extrema scan; the
            # per-candidate Pallas kernels below are bound-agnostic
            mask = ext_ops.extrema_mask(dog_p, cfg, bounds=bounds)
            s0, y0, x0, valid, n_cand = ext_ops.find_candidates(mask, K)
        ref = ext_ops.refine_tpu_auto(dog_p, s0, y0, x0, valid, P, h, w,
                                       cfg, interpret=interpret)
        coord_off = P
    else:
        if dog is None:
            dog = gauss[1:] - gauss[:-1]
        if row_range is None:
            mask = ext_ops.extrema_mask(dog, cfg)
        else:
            bnd = (jnp.maximum(b0 := cfg.image_border, row_range[0]),
                   jnp.minimum(h - b0, row_range[1]),
                   b0, w - b0)
            mask = ext_ops.extrema_mask(dog, cfg, bounds=bnd)
        s0, y0, x0, valid, n_cand = ext_ops.find_candidates(mask, K)
        ref = ext_ops.refine(dog, s0, y0, x0, valid, cfg)
        coord_off = 0
    response = ref["response"]
    keep = ref["keep"] & valid

    # survivor compaction
    sidx, svalid, n_surv = compact_indices(keep, K2)
    s = ref["s"][sidx]
    y = ref["y"][sidx] - coord_off
    x = ref["x"][sidx] - coord_off
    off_s = ref["off_s"][sidx]
    off_y = ref["off_y"][sidx]
    off_x = ref["off_x"][sidx]
    resp = response[sidx]

    kp_scale = ori_ops.kp_scale_of(s, off_s, cfg)

    if use_pallas:
        from ..ops.pallas.orientation_kernel import orientation_histograms_bucketed

        hist = orientation_histograms_bucketed(
            gauss_padded, s - slot_off, s, y, x, kp_scale, n_surv, h, w, P,
            cfg, interpret)
    else:
        hist = ori_ops.orientation_histograms_blocked(
            gauss_padded, h, w, s, y, x, kp_scale, svalid, cfg,
            pad=desc_ops.PAD_DESC, count=n_surv)
    angles, emit = ori_ops.orientation_peaks(hist, cfg)
    emit &= svalid[:, None]

    # (survivor, bin) emission compaction -> keypoint batch
    eidx, evalid, n_emit = compact_indices(emit.ravel(), M)
    ci = eidx // cfg.n_orientation_bins
    bi = eidx % cfg.n_orientation_bins
    kp_angle = angles[ci, bi]
    kp_angle = jnp.where(evalid, kp_angle, F32(0.0))

    x_oct = x.astype(F32)[ci] + off_x[ci]
    y_oct = y.astype(F32)[ci] + off_y[ci]
    kp_sc = kp_scale[ci]
    kp_resp = resp[ci]
    kp_s = s[ci]

    osf = F32(2.0 ** octave)
    dm = F32(cfg.delta_min)
    kps = jnp.stack([
        (x_oct * osf) * dm,
        (y_oct * osf) * dm,
        (kp_sc * osf) * dm,
        kp_angle,
        kp_resp,
    ], axis=-1)
    res = {
        "kps": kps, "valid": evalid,
        "n_candidates": n_cand, "n_survivors": n_surv, "n_emitted": n_emit,
        "caps": (K, K2, M),
    }
    if not describe:
        # budgeted spatial path (C15, lib.rs:156-161): description is
        # deferred until the per-frame response top-K resolves across space
        # members; hand back the descriptor-kernel inputs + window context
        # so only selected keypoints are described (_describe_octave_subset).
        res["desc_in"] = {"kp_s": kp_s, "x_oct": x_oct, "y_oct": y_oct,
                          "kp_sc": kp_sc, "kp_angle": kp_angle}
        res["win_ctx"] = (gauss_padded, slot_off, use_pallas)
        return res

    if use_pallas:
        from ..ops.extrema import rust_round
        from ..ops.pallas.descriptor_kernel import descriptor_hist_bucketed

        xi = rust_round(x_oct).astype(jnp.int32)
        yi = rust_round(y_oct).astype(jnp.int32)
        hist128 = descriptor_hist_bucketed(
            gauss_padded, kp_s - slot_off, kp_s, xi, yi, kp_sc, kp_angle,
            n_emit, h, w, P, cfg, interpret)
        descs = desc_ops.finalize_descriptor(hist128, cfg)
    else:
        descs = desc_ops.descriptor_batch_blocked(
            gauss_padded, h, w, kp_s, x_oct, y_oct, kp_sc, kp_angle, evalid,
            cfg, count=n_emit)
    res["desc"] = descs
    return res


def _describe_octave_subset(win_ctx, fields, live, cfg: SiftConfig, h: int,
                            w: int, interpret: bool = False):
    """Describe a compacted single-frame keypoint subset from
    _detect_octave(describe=False) output: fields are (C,) vectors of the
    desc_in pytree gathered at the selected rows, live the (C,) validity
    mask. Same kernels + finalization as the full path (reference: describe
    runs after the feature-limit truncation, lib.rs:156-161)."""
    gauss_padded, slot_off, use_pallas = win_ctx
    n_live = jnp.sum(live)
    if use_pallas:
        from ..ops.extrema import rust_round
        from ..ops.pallas.descriptor_kernel import descriptor_hist_bucketed

        xi = rust_round(fields["x_oct"]).astype(jnp.int32)
        yi = rust_round(fields["y_oct"]).astype(jnp.int32)
        hist128 = descriptor_hist_bucketed(
            gauss_padded, fields["kp_s"] - slot_off, fields["kp_s"], xi, yi,
            fields["kp_sc"], fields["kp_angle"], n_live, h, w,
            desc_ops.PAD_DESC, cfg, interpret, live=live)
        return desc_ops.finalize_descriptor(hist128, cfg)
    return desc_ops.descriptor_batch_blocked(
        gauss_padded, h, w, fields["kp_s"], fields["x_oct"],
        fields["y_oct"], fields["kp_sc"], fields["kp_angle"], live, cfg,
        count=n_live)


def _detect_octave_batched(gauss_p, dog_p, octave: int, cfg: SiftConfig, hw,
                           stages: str = "full", gauss_win=None,
                           describe: bool = True, interpret: bool = False):
    """Frame-batched single-octave detection on fused-pyramid padded stacks.

    gauss_p/dog_p: (B, 5, H_pad, W_pad) (gauss slot k = level k+1). All
    per-keypoint math is identical to _detect_octave — frames are batched
    into ONE launch per Pallas kernel by concatenating per-frame candidate
    buffers and indexing planes as frame*n_planes + scale, so kernel-launch
    overhead is paid once per octave instead of once per frame.

    gauss_win: optional (B, 3, H_pad, W_pad) window-gather copy of Gaussian
    levels 1-3 (possibly bf16, cfg.gather_dtype) consumed by the
    orientation/descriptor kernels instead of gauss_p."""
    from ..ops.extrema import rust_round
    from ..ops.pallas.descriptor_kernel import descriptor_hist_masked
    from ..ops.pallas.extrema_kernel import extrema_words_batched
    from ..ops.pallas.orientation_kernel import orientation_histograms_masked

    B, n_dog = dog_p.shape[0], dog_p.shape[1]
    h, w = hw
    hp, wp = dog_p.shape[-2], dog_p.shape[-1]
    K, K2, M = _octave_capacities(h, w, cfg)
    P = desc_ops.PAD_DESC
    b = cfg.image_border
    nb_ = cfg.n_orientation_bins

    def dummy(n_cand=None):
        """Early-exit result for stage ablation (tools/ablate_stages.py).
        kps is tied to the stacks so XLA cannot dead-code the ablated
        prefix."""
        z = jnp.zeros((B,), jnp.int32) if n_cand is None else n_cand[1]
        tie = (gauss_p[:, 0, 0, 0] * 0 + dog_p[:, 0, 0, 0] * 0)[:, None, None]
        return {
            "kps": jnp.zeros((B, M, 5), F32) + tie,
            "desc": jnp.zeros((B, M, cfg.descriptor_size), jnp.uint8),
            "valid": jnp.zeros((B, M), bool),
            "n_candidates": z, "n_survivors": z, "n_emitted": z,
        }

    if stages == "pyramid":
        return dummy()

    bounds = (P + b, P + h - b, P + b, P + w - b)
    words = extrema_words_batched(dog_p, bounds, cfg.scales_per_octave,
                                  interpret)
    s0, y0, x0, valid, n_cand = jax.vmap(
        lambda ww: ext_ops.find_candidates_words(ww, K))(words)      # (B, K)
    if stages == "extrema":
        return dummy((None, n_cand))

    dog_flat = dog_p.reshape(B * n_dog, hp, wp)
    poff_k = jnp.repeat(jnp.arange(B, dtype=jnp.int32) * n_dog, K)
    ref = ext_ops.refine_tpu_auto(
        dog_flat, s0.reshape(-1), y0.reshape(-1), x0.reshape(-1),
        valid.reshape(-1), P, h, w, cfg, plane_off=poff_k,
        interpret=interpret)
    keep = (ref["keep"] & valid.reshape(-1)).reshape(B, K)

    # per-frame survivor compaction
    sidx, svalid, n_surv = jax.vmap(
        lambda m: compact_indices(m, K2))(keep)                      # (B, K2)

    def g2(a):
        return jnp.take_along_axis(a.reshape(B, K), sidx, axis=1)

    s = g2(ref["s"])
    y = g2(ref["y"]) - P
    x = g2(ref["x"]) - P
    off_s = g2(ref["off_s"])
    off_y = g2(ref["off_y"])
    off_x = g2(ref["off_x"])
    resp = g2(ref["response"])
    kp_scale = ori_ops.kp_scale_of(s, off_s, cfg)                    # (B, K2)
    if stages == "refine":
        r = dummy((None, n_cand))
        r["n_survivors"] = n_surv
        r["kps"] = r["kps"] + kp_scale[:, :1, None] * 0
        return r

    win_src = gauss_p if gauss_win is None else gauss_win
    win_planes = win_src.shape[1]
    gauss_flat = win_src.reshape(B * win_planes, hp, wp)
    poff_k2 = jnp.repeat(jnp.arange(B, dtype=jnp.int32) * win_planes, K2)
    live2 = svalid.reshape(-1)
    # mask-dispatched bucket kernels (round 5): no per-bucket compaction or
    # restore machinery — measured ~32 ms/batch of pure XLA overhead at
    # bench density (tools/window_breakdown.py); byte-equal outputs
    hist, angles_p, n_pk = orientation_histograms_masked(
        gauss_flat, (s - 1).reshape(-1) + poff_k2, s.reshape(-1),
        y.reshape(-1), x.reshape(-1), kp_scale.reshape(-1),
        h, w, P, cfg, interpret, live=live2,
        count=jnp.sum(n_surv), with_peaks=True)

    def emit_slow(_):
        # XLA peaks over the full (B*K2, 36) histograms — the reference
        # semantics with no per-survivor slot cap (lib.rs:394-431)
        angles, emit = ori_ops.orientation_peaks(hist, cfg)         # (B*K2,nb)
        angles = angles.reshape(B, K2 * nb_)
        emit = (emit.reshape(B, K2, nb_)
                & svalid[:, :, None]).reshape(B, K2 * nb_)
        eidx, evalid, n_emit = jax.vmap(
            lambda m: compact_indices(m, M))(emit)                   # (B, M)
        ci = eidx // nb_
        kp_angle = jnp.where(
            evalid, jnp.take_along_axis(angles, eidx, axis=1), F32(0.0))
        return ci, kp_angle, evalid, n_emit

    if angles_p is None:
        ci, kp_angle, evalid, n_emit = emit_slow(None)
    else:
        # fast path: the packed orientation kernel already extracted each
        # survivor's peak angles (ascending-bin order == reference emission
        # order) — compaction runs over (K2, PK) slots instead of (K2, 36)
        # bins and every (B*K2, 36) XLA pass disappears. The (never yet
        # observed) >PK-peaks case falls back to the exact XLA path.
        PK = angles_p.shape[1]

        def emit_fast(_):
            a2 = angles_p.reshape(B, K2 * PK)
            npk2 = jnp.minimum(n_pk, PK).reshape(B, K2)
            emit2 = ((jnp.arange(PK, dtype=jnp.int32)[None, None, :]
                      < npk2[:, :, None])
                     & svalid[:, :, None]).reshape(B, K2 * PK)
            eidx2, evalid, n_emit = jax.vmap(
                lambda m: compact_indices(m, M))(emit2)              # (B, M)
            ci = eidx2 // PK
            kp_angle = jnp.where(
                evalid, jnp.take_along_axis(a2, eidx2, axis=1), F32(0.0))
            return ci, kp_angle, evalid, n_emit

        overflow = jnp.any((n_pk > PK) & live2)
        ci, kp_angle, evalid, n_emit = jax.lax.cond(
            overflow, emit_slow, emit_fast, None)

    def gc(a):
        return jnp.take_along_axis(a, ci, axis=1)

    x_oct = gc(x.astype(F32)) + gc(off_x)
    y_oct = gc(y.astype(F32)) + gc(off_y)
    kp_sc = gc(kp_scale)
    kp_resp = gc(resp)
    kp_s = gc(s)
    if stages == "orient":
        r = dummy((None, n_cand))
        r["n_survivors"] = n_surv
        r["n_emitted"] = n_emit
        r["kps"] = r["kps"] + (kp_angle + x_oct + y_oct)[:, :1, None] * 0
        return r

    xi = rust_round(x_oct).astype(jnp.int32)
    yi = rust_round(y_oct).astype(jnp.int32)

    osf = F32(2.0 ** octave)
    dm = F32(cfg.delta_min)
    kps = jnp.stack([
        (x_oct * osf) * dm,
        (y_oct * osf) * dm,
        (kp_sc * osf) * dm,
        kp_angle,
        kp_resp,
    ], axis=-1)
    res = {
        "kps": kps, "valid": evalid,
        "n_candidates": n_cand, "n_survivors": n_surv, "n_emitted": n_emit,
    }
    if not describe:
        # budgeted path (C15, lib.rs:156-161): the global response top-K is
        # taken BEFORE descriptors; return the descriptor-kernel inputs so
        # only selected keypoints are described later.
        # MEMORY tradeoff: deferring description keeps EVERY octave's window
        # stack (win_ctx) alive until the global top-K resolves, so peak HBM
        # grows from ~one octave's stack to the sum over octaves (~4/3 of
        # octave 0's) — the same retention the reference's PrecomputedImages
        # has (lib.rs:124-145, all octaves held until describe). Callers
        # whose batch barely fits unbudgeted should lower the batch size or
        # use gather_dtype="bfloat16" (halves win_ctx) when setting a budget.
        res["desc_in"] = {"kp_s": kp_s, "xi": xi, "yi": yi, "kp_sc": kp_sc,
                          "kp_angle": kp_angle}
        res["win_ctx"] = (gauss_flat, win_planes)
        return res

    poff_m = jnp.repeat(jnp.arange(B, dtype=jnp.int32) * win_planes, M)
    hist128 = descriptor_hist_masked(
        gauss_flat, (kp_s - 1).reshape(-1) + poff_m, kp_s.reshape(-1),
        xi.reshape(-1), yi.reshape(-1), kp_sc.reshape(-1),
        kp_angle.reshape(-1), h, w, P, cfg, interpret,
        live=evalid.reshape(-1), count=jnp.sum(n_emit))
    res["desc"] = desc_ops.finalize_descriptor(hist128, cfg).reshape(B, M, -1)
    return res


def _describe_subset(gauss_flat, win_planes: int, fields, live, cfg, h, w,
                     interpret: bool = False):
    """Describe a compacted keypoint subset: fields are (B, C) arrays (the
    desc_in pytree gathered at selected rows), live the (B, C) validity
    mask. Same kernel + finalization as the full path."""
    from ..ops.pallas.descriptor_kernel import descriptor_hist_bucketed

    B, C = fields["kp_s"].shape
    P = desc_ops.PAD_DESC
    poff = jnp.repeat(jnp.arange(B, dtype=jnp.int32) * win_planes, C)
    hist128 = descriptor_hist_bucketed(
        gauss_flat, (fields["kp_s"] - 1).reshape(-1) + poff,
        fields["kp_s"].reshape(-1), fields["xi"].reshape(-1),
        fields["yi"].reshape(-1), fields["kp_sc"].reshape(-1),
        fields["kp_angle"].reshape(-1), jnp.sum(live), h, w, P, cfg,
        interpret, live=live.reshape(-1))
    return desc_ops.finalize_descriptor(hist128, cfg).reshape(B, C, -1)


def _extract_batch_fused(imgs_u8: jnp.ndarray, n_octaves: int,
                         cfg: SiftConfig, stages: str = "full",
                         budget: int | None = None,
                         interpret: bool = False):
    """Frame-batched TPU pipeline: every Pallas stage launches ONCE per
    octave for the whole batch (vs. once per frame per octave under
    lax.map) — grid-step and launch overhead dominate the small octaves on
    this backend. Per-frame outputs are byte-identical to _extract_single's
    (same kernels, same per-frame compaction order)."""
    import dataclasses

    B = imgs_u8.shape[0]
    seeds = pyr_ops.create_seed_image(imgs_u8, cfg)                  # (B,h,w)
    sigmas = cfg.octave_sigmas()
    P = desc_ops.PAD_DESC
    initial = seeds
    if cfg.storage_dtype == "bfloat16":
        # bf16 pyramid storage (arithmetic stays f32 inside the kernels)
        initial = seeds.astype(jnp.bfloat16)
    out = []
    hw_list = []
    for o in range(n_octaves):
        h, w = initial.shape[-2], initial.shape[-1]
        h_pad = -(-(h + 2 * P) // 128) * 128
        w_pad = -(-(w + 2 * P) // 128) * 128
        if w_pad > 1536:  # lane-blocked kernels need 1024-multiples
            w_pad = -(-w_pad // 1024) * 1024
        if h_pad >= 256 and w_pad >= 256:
            from ..ops.pallas.pyramid_kernel import (build_octave_fused,
                                                     reflect_pad_image)

            base = jax.vmap(lambda im: reflect_pad_image(
                im, P, w_pad - w - 2 * P, h_pad - h - 2 * P))(initial)
            # whole-octave fused kernel: the blur chain lives in VMEM, only
            # Gaussian levels 1-3 + the DoG reach HBM (bit-equal to the
            # per-level builder at f32; detection-safe bf16 windows in
            # "split" mode — the f32 chain never rounds)
            g, d, g16, l3 = build_octave_fused(
                base, cfg, interpret,
                gather16=(cfg.gather_dtype == "bfloat16"
                          and cfg.storage_dtype == "float32"),
                split=cfg.storage_dtype == "split")
            out.append(_detect_octave_batched(g, d, o, cfg, (h, w), stages,
                                              gauss_win=g16,
                                              describe=budget is None,
                                              interpret=interpret))
            sp = cfg.scales_per_octave
            nxt = l3 if l3 is not None else g[:, sp - 1]
            # ½-downsample as TWO single-axis strided slices: the fused
            # rows+lanes stride-2 slice lowers to an index-vector gather
            # that costs 35+ ms/batch at octave 0 on this chip; slicing
            # sublanes then lanes lowers to strided copies (7x faster,
            # byte-equal — tools/slice_experiment.py)
            initial = nxt[:, P:P + (h // 2) * 2:2, :][:, :, P:P + (w // 2) * 2:2]
        else:
            # tiny top octaves: per-frame XLA fallback (Pallas kernels must
            # not run under lax.map's batching here anyway)
            cfg_x = dataclasses.replace(cfg, use_pallas=False)

            def one(im):
                from ..ops.gaussian import gaussian_blur
                from ..ops.resize import resize_nearest_half

                levels = [im.astype(F32)]   # XLA fallback computes in f32
                for sig in sigmas[1:]:
                    levels.append(gaussian_blur(levels[-1], sig))
                gauss = jnp.stack(levels, axis=0)
                r = _detect_octave(gauss, None, o, cfg_x)
                nxt = resize_nearest_half(levels[len(levels) - 3])
                return r, nxt.astype(im.dtype)

            res_o, initial = jax.lax.map(one, initial)
            out.append(res_o)
        hw_list.append((h, w))
    counters = {
        "n_candidates": jnp.stack([r["n_candidates"] for r in out], axis=1),
        "n_survivors": jnp.stack([r["n_survivors"] for r in out], axis=1),
        "n_emitted": jnp.stack([r["n_emitted"] for r in out], axis=1),
    }
    if budget is None:
        return {
            "kps": jnp.concatenate([r["kps"] for r in out], axis=1),
            "desc": jnp.concatenate([r["desc"] for r in out], axis=1),
            "valid": jnp.concatenate([r["valid"] for r in out], axis=1),
            **counters,
        }
    return _assemble_budget(out, hw_list, budget, cfg, counters, interpret)


def _assemble_budget(out, hw_list, budget: int, cfg: SiftConfig, counters,
                     interpret: bool = False):
    """Global per-frame response top-K across octaves, then describe ONLY
    the selected keypoints (reference order: truncate BEFORE descriptors,
    lib.rs:156-161). Octaves that already carry full descriptors (tiny-
    octave XLA fallback) are gathered directly; fused octaves run the
    descriptor kernel on the compacted selected subset. Output keypoints
    are response-sorted (ties broken by emission index, like the host-side
    stable sort); src_idx maps rows back to emission order."""
    B = out[0]["valid"].shape[0]
    resp = jnp.concatenate(
        [jnp.where(r["valid"], r["kps"][..., 4], -jnp.inf) for r in out],
        axis=1)
    budget = min(budget, resp.shape[1])
    kps_all = jnp.concatenate([r["kps"] for r in out], axis=1)
    top_val, top_idx = jax.lax.top_k(resp, budget)         # (B, budget)
    tvalid = top_val > -jnp.inf
    out_kps = jnp.take_along_axis(kps_all, top_idx[..., None], axis=1)
    out_kps = jnp.where(tvalid[..., None], out_kps, F32(0.0))

    out_desc = jnp.zeros((B, budget, cfg.descriptor_size), jnp.uint8)
    off = 0
    for r, (h, w) in zip(out, hw_list):
        M_o = r["valid"].shape[1]
        member = tvalid & (top_idx >= off) & (top_idx < off + M_o)
        local = jnp.clip(top_idx - off, 0, M_o - 1)        # (B, budget)
        if "desc" in r:
            d_rows = jnp.take_along_axis(r["desc"], local[..., None], axis=1)
        else:
            C = min(budget, M_o)
            midx, mvalid, _ = jax.vmap(
                lambda m: compact_indices(m, C))(member)   # (B, C)
            sel = jnp.take_along_axis(local, midx, axis=1)
            fields = {k: jnp.take_along_axis(v, sel, axis=1)
                      for k, v in r["desc_in"].items()}
            gauss_flat, win_planes = r["win_ctx"]
            desc_c = _describe_subset(gauss_flat, win_planes, fields,
                                      mvalid, cfg, h, w,
                                      interpret)           # (B, C, D)
            rank = jnp.cumsum(member, axis=1) - 1
            d_rows = jnp.take_along_axis(
                desc_c, jnp.clip(rank, 0, C - 1)[..., None], axis=1)
        out_desc = jnp.where(member[..., None], d_rows, out_desc)
        off += M_o
    return {
        "kps": out_kps, "desc": out_desc, "valid": tvalid,
        "src_idx": jnp.where(tvalid, top_idx, -1),
        **counters,
    }


def _truncate_result(res, budget: int):
    """Post-hoc device top-K truncation of a full (unbudgeted) result — the
    budget contract for paths that already computed every descriptor (the
    XLA/CPU lax.map path). Same output semantics as _assemble_budget."""
    resp = jnp.where(res["valid"], res["kps"][..., 4], -jnp.inf)
    budget = min(budget, resp.shape[1])
    top_val, top_idx = jax.lax.top_k(resp, budget)
    tvalid = top_val > -jnp.inf
    out = {
        "kps": jnp.where(
            tvalid[..., None],
            jnp.take_along_axis(res["kps"], top_idx[..., None], axis=1),
            F32(0.0)),
        "desc": jnp.where(
            tvalid[..., None],
            jnp.take_along_axis(res["desc"], top_idx[..., None], axis=1),
            jnp.uint8(0)),
        "valid": tvalid,
        "src_idx": jnp.where(tvalid, top_idx, -1),
    }
    for k in ("n_candidates", "n_survivors", "n_emitted"):
        out[k] = res[k]
    return out


def _extract_single(img_u8: jnp.ndarray, n_octaves: int, cfg: SiftConfig):
    """Full single-image pipeline (traced once per (H, W))."""
    seed = pyr_ops.create_seed_image(img_u8[None], cfg)[0]
    initial = seed
    sigmas = cfg.octave_sigmas()
    on_tpu = cfg.use_pallas and jax.devices()[0].platform == "tpu"
    P = desc_ops.PAD_DESC
    out = []
    for o in range(n_octaves):
        h, w = initial.shape
        h_pad = -(-(h + 2 * P) // 128) * 128
        w_pad = -(-(w + 2 * P) // 128) * 128
        if w_pad > 1536:  # lane-blocked pyramid kernel needs 1024-multiples
            w_pad = -(-w_pad // 1024) * 1024
        # fused pyramid kernel needs room for a 128-row strip grid and
        # 256-lane window DMAs
        use_pyr_kernel = on_tpu and h_pad >= 256 and w_pad >= 256
        if use_pyr_kernel:
            from ..ops.pallas.pyramid_kernel import (build_octave_padded,
                                                     reflect_pad_image)

            base_padded = reflect_pad_image(
                initial, P, w_pad - w - 2 * P, h_pad - h - 2 * P)
            g_slots, dog_p = build_octave_padded(base_padded, cfg)
            out.append(_detect_octave(None, None, o, cfg,
                                      padded=(g_slots, dog_p, 1), hw=(h, w)))
            # next octave base: NN 1/2 downsample of Gaussian level S
            # (slot S-1), interior only (lib.rs:245-248)
            s_img = g_slots[cfg.scales_per_octave - 1]
            # two single-axis strided slices (see the batched path's note)
            initial = s_img[P:P + (h // 2) * 2:2, :][:, P:P + (w // 2) * 2:2]
        else:
            imgs = [initial]
            for sig in sigmas[1:]:
                from ..ops.gaussian import gaussian_blur

                imgs.append(gaussian_blur(imgs[-1], sig))
            gauss = jnp.stack(imgs, axis=0)
            out.append(_detect_octave(gauss, None, o, cfg))
            from ..ops.resize import resize_nearest_half

            initial = resize_nearest_half(imgs[len(imgs) - 3])
    res = {
        "kps": jnp.concatenate([r["kps"] for r in out], axis=0),
        "desc": jnp.concatenate([r["desc"] for r in out], axis=0),
        "valid": jnp.concatenate([r["valid"] for r in out], axis=0),
        "n_candidates": jnp.stack([r["n_candidates"] for r in out]),
        "n_survivors": jnp.stack([r["n_survivors"] for r in out]),
        "n_emitted": jnp.stack([r["n_emitted"] for r in out]),
    }
    return res


def _extract_batch_core(imgs_u8: jnp.ndarray, n_octaves: int,
                        cfg: SiftConfig, budget: int | None = None):
    """Trace-level batched pipeline dispatch — shared by the single-chip jit
    wrapper AND the sharded step bodies (parallel.pipeline/extract run this
    inside shard_map so every chip gets the fast fused program)."""
    if cfg.use_pallas and jax.devices()[0].platform == "tpu":
        # frame-batched fused path: one kernel launch per stage per octave
        return _extract_batch_fused(imgs_u8, n_octaves, cfg, budget=budget)
    # lax.map (not vmap): each frame's ops are full-size dense kernels that
    # saturate the chip alone, and the Pallas kernels use manual DMA that
    # must not be batch-transformed.
    res = jax.lax.map(lambda im: _extract_single(im, n_octaves, cfg),
                      imgs_u8)
    return res if budget is None else _truncate_result(res, budget)


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def _extract_batch_jit(imgs_u8: jnp.ndarray, n_octaves: int, cfg: SiftConfig,
                       budget: int | None = None):
    return _extract_batch_core(imgs_u8, n_octaves, cfg, budget)


def extract_batch(imgs_u8, config: SiftConfig = DEFAULT_CONFIG,
                  features_limit: int | None = None):
    """Device-side batched extraction: (B, H, W) u8 -> padded result pytree
    (kps (B,N,5) f32, desc (B,N,128) u8, valid (B,N) bool, stage counters).

    features_limit: per-frame response top-K budget (C15, lib.rs:156-161).
    On the fused TPU path the truncation happens BEFORE descriptor
    computation, like the reference — only selected keypoints are described.
    Budgeted results are response-sorted and carry src_idx (emission-order
    index, -1 on invalid lanes)."""
    imgs_u8 = jnp.asarray(imgs_u8, jnp.uint8)
    h, w = imgs_u8.shape[-2], imgs_u8.shape[-1]
    n_oct = config.n_octaves(h * config.inv_delta_min, w * config.inv_delta_min)
    return _extract_batch_jit(imgs_u8, n_oct, config, features_limit)


@functools.partial(jax.jit, static_argnums=(1, 2))
def _precompute_jit(imgs_u8: jnp.ndarray, n_octaves: int, cfg: SiftConfig):
    seed = pyr_ops.create_seed_image(imgs_u8, cfg)
    octaves = pyr_ops.build_scale_space(seed, n_octaves, cfg)
    dogs = pyr_ops.build_dog(octaves)
    return octaves, dogs


def precompute(imgs_u8, config: SiftConfig = DEFAULT_CONFIG):
    """Pyramid-only stage (reference precompute_images, lib.rs:131-146):
    (B, H, W) u8 -> (gaussian octaves, DoG octaves), each a list of
    (B, S+3/S+2, H_o, W_o) f32 arrays. Separately jitted so pyramid cost can
    be benchmarked apart from detection (benches/sift.rs:115-121 analog)."""
    imgs_u8 = jnp.asarray(imgs_u8, jnp.uint8)
    h, w = imgs_u8.shape[-2], imgs_u8.shape[-1]
    n_oct = config.n_octaves(h * config.inv_delta_min, w * config.inv_delta_min)
    return _precompute_jit(imgs_u8, n_oct, config)


@functools.partial(jax.jit, static_argnums=(2,))
def _detect_describe_jit(octaves, dogs, cfg: SiftConfig):
    def one_frame(args):
        octs, ds = args
        out = [_detect_octave(g, d, o, cfg)
               for o, (g, d) in enumerate(zip(octs, ds))]
        return {
            "kps": jnp.concatenate([r["kps"] for r in out], axis=0),
            "desc": jnp.concatenate([r["desc"] for r in out], axis=0),
            "valid": jnp.concatenate([r["valid"] for r in out], axis=0),
            "n_candidates": jnp.stack([r["n_candidates"] for r in out]),
            "n_survivors": jnp.stack([r["n_survivors"] for r in out]),
            "n_emitted": jnp.stack([r["n_emitted"] for r in out]),
        }

    # lax.map, NOT vmap: on TPU _detect_octave dispatches to manual-DMA
    # Pallas kernels that must not be batch-transformed (same constraint as
    # _extract_batch_jit).
    return jax.lax.map(one_frame, (octaves, dogs))


def extract_with_precomputed(octaves, dogs, config: SiftConfig = DEFAULT_CONFIG):
    """Detection + description on a precomputed pyramid (reference
    sift_with_precomputed, lib.rs:147-177). Same padded result pytree as
    extract_batch."""
    return _detect_describe_jit(octaves, dogs, config)


def extract(img_u8, features_limit: int | None = None,
            config: SiftConfig = DEFAULT_CONFIG):
    """Single-image extraction matching the reference's sift() (lib.rs:71-81).

    Returns (keypoints (N,5) f32 [x,y,size,angle,response] in original image
    coords, descriptors (N,128) u8), compacted on host, in the reference's
    emission order (octave-major scan order; response-sorted when limited).
    """
    img_u8 = np.asarray(img_u8)
    res = extract_batch(img_u8[None], config, features_limit)
    kps = np.asarray(res["kps"])[0]
    desc = np.asarray(res["desc"])[0]
    valid = np.asarray(res["valid"])[0]
    kps, desc = kps[valid], desc[valid]
    if features_limit is not None:
        # reference semantics: the response sort applies only when the
        # limit actually truncates (lib.rs:156-161); otherwise emission
        # order is preserved — restore it via src_idx
        n_total = int(np.asarray(res["n_emitted"])[0].sum())
        if n_total <= features_limit:
            src = np.asarray(res["src_idx"])[0][valid]
            order = np.argsort(src, kind="stable")
            kps, desc = kps[order], desc[order]
    return kps, desc
