"""DoG extrema detection + subpixel refinement (JAX, TPU-native).

Reference semantics: point_is_local_extremum (lib.rs:437-506),
interpolate_extremum (lib.rs:508-603), extremum_contrast (lib.rs:605-626),
extremum_is_on_edge (lib.rs:628-653).

TPU design (SURVEY.md §7): the scalar scan becomes a dense 26-neighbor
extremum test expressed as 3x3x3 max/min reduce_window equality (v is >= all
26 neighbors iff v == maxpool3x3x3(v), ties allowed — matching the
reference's >=/<= compares); the data-dependent candidate list becomes a
fixed-capacity index buffer via the scatter-free block compaction
(utils.compact, row-major order == the reference's scan order); the Newton
solve + contrast/edge tests run SPARSELY on gathered (K, 3, 3, 3)
neighborhood cubes per refinement step — at ~0.1% extrema density, dense
per-pixel field maps would write ~250x more HBM than the cubes read.
Quirks replicated: the prefilter threshold floors to 0.0 (lib.rs:460), ties
allowed in the neighbor compares, edge test at the refined integer coords,
round-half-away re-centering.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..config import DEFAULT_CONFIG, SiftConfig
from ..utils.compact import compact_indices

F32 = jnp.float32


def rust_round(x: jnp.ndarray) -> jnp.ndarray:
    """Rust f32::round — half away from zero (utils.rounding, jit-side)."""
    t = jnp.trunc(x)
    frac = x - t
    r = jnp.round(x)
    return jnp.where(jnp.abs(frac) == 0.5, t + jnp.sign(x), r)


def extrema_mask(dog: jnp.ndarray, cfg: SiftConfig = DEFAULT_CONFIG,
                 bounds=None) -> jnp.ndarray:
    """(..., S+2, H, W) f32 -> (..., S, H, W) bool discrete-extremum mask.

    bounds=(y0, y1, x0, x1) overrides the interior scan range (used when dog
    is a PADDED stack: the pad ring must never produce candidates)."""
    *lead, S, H, W = dog.shape
    n_s = cfg.scales_per_octave
    border = cfg.image_border
    if bounds is None and (H < 2 * border or W < 2 * border):
        return jnp.zeros((*lead, n_s, H, W), bool)
    static_bounds = bounds is not None and all(
        isinstance(b, (int, np.integer)) for b in bounds)
    if static_bounds and (bounds[1] <= bounds[0] or bounds[3] <= bounds[2]):
        return jnp.zeros((*lead, n_s, H, W), bool)

    ndim = dog.ndim
    window = (1,) * (ndim - 3) + (3, 3, 3)
    ones = (1,) * ndim
    pad = ((0, 0),) * (ndim - 3) + ((0, 0), (1, 1), (1, 1))
    neg_inf = np.float32(-np.inf)
    pos_inf = np.float32(np.inf)
    # max/min over the 3x3x3 cube (scale window VALID: slice s..s+2 of S+2
    # maps to mask scale s+1; spatial window SAME with +-inf fill)
    mx = jax.lax.reduce_window(dog, neg_inf, jax.lax.max, window, ones, pad)
    mn = jax.lax.reduce_window(dog, pos_inf, jax.lax.min, window, ones, pad)

    v = dog[..., 1:n_s + 1, :, :]
    m = ((v > 0.0) & (v >= mx)) | ((v < 0.0) & (v <= mn))
    # border mask (interior scan range, lib.rs:315-323)
    y0, y1, x0, x1 = bounds if bounds is not None else (
        border, H - border, border, W - border)
    ys = jnp.arange(H)
    xs = jnp.arange(W)
    m &= ((ys >= y0) & (ys < y1))[:, None]
    m &= ((xs >= x0) & (xs < x1))[None, :]
    return m


def find_candidates(mask: jnp.ndarray, k_max: int):
    """(S, H, W) bool -> fixed-capacity candidate buffer in scan order.

    Returns (s, y, x) int32 arrays of shape (k_max,), valid mask, and the true
    count (for overflow detection). Row-major nonzero == the reference's
    scale-major (y, x) scan order (lib.rs:287-332)."""
    from ..utils.compact import compact_indices_packed

    S, H, W = mask.shape
    if mask.size >= (1 << 20):   # image-scale masks: bit-packed compaction
        idx, valid, count = compact_indices_packed(mask.ravel(), k_max)
    else:
        idx, valid, count = compact_indices(mask.ravel(), k_max)
    s = idx // (H * W) + 1  # mask dim 0 is scale-1
    rem = idx % (H * W)
    y = rem // W
    x = rem % W
    return s, y, x, valid, count


def find_candidates_words(words: jnp.ndarray, k_max: int):
    """find_candidates from the BIT-PACKED extremum mask produced by
    ops.pallas.extrema_kernel.extrema_words: words (S, H, W//32) int32, bit
    (s, y, 32w+j) = mask at (s, y, 32w+j). Emission order identical to
    find_candidates on the equivalent bool mask (row-major)."""
    from ..utils.compact import compact_words

    S, H, W32 = words.shape
    W = W32 * 32
    idx, valid, count = compact_words(words.ravel(), k_max)
    s = idx // (H * W) + 1  # word dim 0 is scale-1
    rem = idx % (H * W)
    y = rem // W
    x = rem % W
    return s, y, x, valid, count


def _gather_cubes(dog: jnp.ndarray, s, y, x) -> jnp.ndarray:
    """(K,) int32 coords -> (K, 3, 3, 3) neighborhood cubes centered at
    (s, y, x), as ONE flat take (a vmapped dynamic_slice lowers to K serial
    slices on TPU). Callers guarantee interior coords for live lanes; dead
    lanes read clamped garbage that is masked downstream."""
    S, H, W = dog.shape
    off = np.asarray([(ds * H + dy) * W + dx
                      for ds in (-1, 0, 1) for dy in (-1, 0, 1)
                      for dx in (-1, 0, 1)], np.int32).reshape(1, 27)
    lin = ((s * H + y) * W + x)[:, None] + jnp.asarray(off)
    cube = jnp.take(dog.ravel(), lin.ravel(), mode="clip")
    return cube.reshape(-1, 3, 3, 3)


def _newton_from_cubes(cube: jnp.ndarray, cfg: SiftConfig):
    """Per-candidate Newton offsets + interval flag + interpolated contrast +
    edge-test keep, from (K, 3, 3, 3) cubes (lib.rs:525-653 math, identical
    op order to keep f32 parity). All (K,) VPU vectors."""
    two = F32(2.0)
    four = F32(4.0)
    c = cube
    v = c[:, 1, 1, 1]
    v2 = v * two

    g1 = (c[:, 2, 1, 1] - c[:, 0, 1, 1]) / two
    g2 = (c[:, 1, 2, 1] - c[:, 1, 0, 1]) / two
    g3 = (c[:, 1, 1, 2] - c[:, 1, 1, 0]) / two
    h11 = c[:, 2, 1, 1] + c[:, 0, 1, 1] - v2
    h12 = (c[:, 2, 2, 1] - c[:, 2, 0, 1] - c[:, 0, 2, 1] + c[:, 0, 0, 1]) / four
    h13 = (c[:, 2, 1, 2] - c[:, 2, 1, 0] - c[:, 0, 1, 2] + c[:, 0, 1, 0]) / four
    h22 = c[:, 1, 2, 1] + c[:, 1, 0, 1] - v2
    h33 = c[:, 1, 1, 2] + c[:, 1, 1, 0] - v2
    h23 = (c[:, 1, 2, 2] - c[:, 1, 2, 0] - c[:, 1, 0, 2] + c[:, 1, 0, 0]) / four

    det = (h11 * h22 * h33 - h11 * h23 * h23 - h12 * h12 * h33
           + two * h12 * h13 * h23 - h13 * h13 * h22)
    hinv11 = (h22 * h33 - h23 * h23) / det
    hinv12 = (h13 * h23 - h12 * h33) / det
    hinv13 = (h12 * h23 - h13 * h22) / det
    hinv22 = (h11 * h33 - h13 * h13) / det
    hinv23 = (h12 * h13 - h11 * h23) / det
    hinv33 = (h11 * h22 - h12 * h12) / det
    off_s = -(hinv11 * g1 + hinv12 * g2 + hinv13 * g3)
    off_x = -(hinv13 * g1 + hinv23 * g2 + hinv33 * g3)
    off_y = -(hinv12 * g1 + hinv22 * g2 + hinv23 * g3)
    ok = (jnp.abs(off_s) < 0.5) & (jnp.abs(off_x) < 0.5) & (jnp.abs(off_y) < 0.5)
    off_s = jnp.where(jnp.isnan(off_s), F32(0), off_s)
    off_y = jnp.where(jnp.isnan(off_y), F32(0), off_y)
    off_x = jnp.where(jnp.isnan(off_x), F32(0), off_x)

    # contrast at the converged pixel (lib.rs:605-626)
    interp = off_s * g1 + off_y * g2 + off_x * g3
    contrast = v + interp / two
    keep_contrast = (jnp.abs(contrast) * F32(cfg.scales_per_octave)
                     > F32(cfg.contrast_threshold))

    # edge test: 2x2 spatial Hessian at the integer pixel (lib.rs:628-653)
    tr = h33 + h22
    edet = h33 * h22 - h23 * h23
    thr = F32(cfg.edge_threshold)
    on_edge = (edet <= 0.0) | ((tr * tr * thr) > (thr + F32(1.0)) ** 2 * edet)

    # steps for non-converged lanes (round-half-away, int32)
    big = F32(1e9)
    step_x = jnp.clip(rust_round(off_x), -big, big).astype(jnp.int32)
    step_y = jnp.clip(rust_round(off_y), -big, big).astype(jnp.int32)
    step_s = jnp.clip(rust_round(off_s), -big, big).astype(jnp.int32)

    return {
        "off_s": off_s, "off_y": off_y, "off_x": off_x, "ok": ok,
        "response": jnp.abs(contrast),
        "keep": keep_contrast & ~on_edge,
        "step_s": step_s, "step_y": step_y, "step_x": step_x,
    }


def refine(dog: jnp.ndarray, s0, y0, x0, valid, cfg: SiftConfig = DEFAULT_CONFIG):
    """Batched Newton refinement, <=5 masked steps (lib.rs:525-603), plus the
    contrast/edge rejection (lib.rs:605-653). Each iteration gathers the
    (K, 3, 3, 3) cubes at the current integer positions and solves the 3x3
    system on the VPU — sparse, so cost scales with K, not the image.

    dog: (S+2, H, W). Returns dict of per-candidate arrays: ok, s, y, x
    (refined integer coords), off_s/off_y/off_x (converged offsets),
    response (|interpolated contrast|), keep (passed contrast+edge tests).
    """
    S, H, W = dog.shape
    border = cfg.image_border

    s, y, x = s0, y0, x0
    K = s.shape[0]
    converged = jnp.zeros(K, bool)
    dead = ~valid

    def clamp(s_, y_, x_):
        return (jnp.clip(s_, 1, S - 2), jnp.clip(y_, 1, H - 2),
                jnp.clip(x_, 1, W - 2))

    fields = None
    for _ in range(cfg.max_interpolation_steps):
        active = ~(converged | dead)
        cube = _gather_cubes(dog, *clamp(s, y, x))
        f = _newton_from_cubes(cube, cfg)
        ok_here = f["ok"]
        newly = active & ok_here
        converged |= newly
        if fields is None:
            fields = {k: f[k] for k in ("off_s", "off_y", "off_x",
                                        "response", "keep")}
        else:
            for k in fields:
                fields[k] = jnp.where(newly, f[k], fields[k])
        step = active & ~ok_here
        x = jnp.where(step, x + f["step_x"], x)
        y = jnp.where(step, y + f["step_y"], y)
        s = jnp.where(step, s + f["step_s"], s)
        bad = ((s < 1) | (s > cfg.scales_per_octave)
               | (x < border) | (x >= W - border)
               | (y < border) | (y >= H - border))
        dead |= step & bad

    return {
        "ok": converged, "s": s, "y": y, "x": x,
        "off_s": fields["off_s"], "off_y": fields["off_y"],
        "off_x": fields["off_x"], "response": fields["response"],
        "keep": fields["keep"] & converged,
    }


def refine_tpu_auto(dog_padded: jnp.ndarray, s0, y0, x0, valid, pad: int,
                    h: int, w: int, cfg: SiftConfig = DEFAULT_CONFIG,
                    plane_off=None, interpret: bool = False):
    """Dispatch on cfg.refine_mode: "tile" (whole loop, per-candidate window
    DMAs), "walk" (whole loop, region-shared window DMAs + vectorized walk),
    "region" (region-shared step kernels), "step" (per-candidate per-step
    kernel). Outputs are identical for all modes."""
    # tile windows DMA with 8-row/128-lane aligned offsets; the clamped
    # origins are only provably aligned when the stack dims are multiples
    # (true for the fused-pyramid padded layout; the precomputed-pyramid
    # pad_stack layout has arbitrary row counts and takes the step path)
    tile_ok = (dog_padded.dtype == jnp.float32
               and dog_padded.shape[-2] % 8 == 0
               and dog_padded.shape[-1] % 128 == 0)
    if cfg.refine_mode == "tile" and tile_ok:
        from .pallas.refine_tile_kernel import refine_tile_tpu

        return refine_tile_tpu(dog_padded, s0, y0, x0, valid, pad, h, w,
                               cfg, plane_off=plane_off, interpret=interpret)
    if cfg.refine_mode == "walk" and tile_ok:
        from .pallas.refine_walk_kernel import refine_walk_tpu

        return refine_walk_tpu(dog_padded, s0, y0, x0, valid, pad, h, w,
                               cfg, plane_off=plane_off, interpret=interpret)
    return refine_tpu(dog_padded, s0, y0, x0, valid, pad, h, w, cfg,
                      plane_off=plane_off, interpret=interpret,
                      region_steps=(cfg.region_steps
                                    if cfg.refine_mode == "region" and tile_ok
                                    else 0))


def refine_tpu(dog_padded: jnp.ndarray, s0, y0, x0, valid, pad: int,
               h: int, w: int, cfg: SiftConfig = DEFAULT_CONFIG,
               plane_off=None, interpret: bool = False,
               region_steps: int = 0):
    """TPU refinement loop driving the Pallas per-step kernel
    (ops.pallas.refine_kernel): same semantics as refine(), but positions are
    in PADDED stack coordinates and cube evaluation is a DMA'd vector kernel
    instead of an XLA gather. Blocks whose candidates have all converged or
    died are skipped per step. Returned y/x are padded coords.

    plane_off: optional (K,) int32 per-candidate plane offset added to the
    scale index when indexing dog_padded — used when several frames' DoG
    stacks are concatenated along dim 0 (offset = frame * planes_per_frame);
    s0 and the returned s stay frame-local."""
    from .pallas.refine_kernel import refine_step_pallas

    border = cfg.image_border
    w_pad = dog_padded.shape[2]

    s, y, x = s0, y0, x0
    K = s.shape[0]
    converged = jnp.zeros(K, bool)
    dead = ~valid

    # scalar-prefetch operands live in SMEM (1 MB): chunk huge batched
    # candidate sets into <=32k-lane kernel calls (5 i32 arrays x 32k = 640KB)
    CHUNK = 32768

    def _run_step(s_idx, y_, x_, act):
        if K <= CHUNK:
            return refine_step_pallas(dog_padded, s_idx, y_, x_, act,
                                      w_pad, cfg, interpret)
        return jnp.concatenate(
            [refine_step_pallas(dog_padded, s_idx[i:i + CHUNK],
                                y_[i:i + CHUNK], x_[i:i + CHUNK],
                                act[i:i + CHUNK], w_pad, cfg, interpret)
             for i in range(0, K, CHUNK)], axis=0)

    fields = None
    for step_i in range(cfg.max_interpolation_steps):
        active = ~(converged | dead)
        s_idx = s if plane_off is None else jnp.clip(
            s, 1, cfg.scales_per_octave) + plane_off
        if step_i < region_steps:
            # dense steps: the region-grouped kernel shares one window DMA
            # across co-located candidates and solves densely
            # (ops.pallas.refine_region_kernel); it sorts inactive lanes to
            # the end, so later sparse steps also compact into few blocks.
            # Measured active fractions at bench density: 100/28/8.5/2.6/1.3%
            # over steps 1-5 — cfg.region_steps picks the crossover vs the
            # per-candidate skip kernel.
            from .pallas.refine_region_kernel import refine_step_region

            out = refine_step_region(dog_padded, s_idx, y, x,
                                     active.astype(jnp.int32), w_pad, cfg,
                                     interpret)
        else:
            out = _run_step(s_idx, y, x, active.astype(jnp.int32))
        ok_here = out[:, 0] > 0
        newly = active & ok_here
        converged |= newly
        f = {"off_s": out[:, 4], "off_y": out[:, 5], "off_x": out[:, 6],
             "response": out[:, 7], "keep": out[:, 8] > 0}
        if fields is None:
            fields = f
        else:
            for kf in fields:
                fields[kf] = jnp.where(newly, f[kf], fields[kf])
        step = active & ~ok_here
        x = jnp.where(step, x + out[:, 3].astype(jnp.int32), x)
        y = jnp.where(step, y + out[:, 2].astype(jnp.int32), y)
        s = jnp.where(step, s + out[:, 1].astype(jnp.int32), s)
        bad = ((s < 1) | (s > cfg.scales_per_octave)
               | (x - pad < border) | (x - pad >= w - border)
               | (y - pad < border) | (y - pad >= h - border))
        dead |= step & bad

    return {
        "ok": converged, "s": s, "y": y, "x": x,
        "off_s": fields["off_s"], "off_y": fields["off_y"],
        "off_x": fields["off_x"], "response": fields["response"],
        "keep": fields["keep"] & converged,
    }
