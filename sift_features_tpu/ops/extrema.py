"""DoG extrema detection + subpixel refinement (JAX, TPU-native).

Reference semantics: point_is_local_extremum (lib.rs:437-506),
interpolate_extremum (lib.rs:508-603), extremum_contrast (lib.rs:605-626),
extremum_is_on_edge (lib.rs:628-653).

TPU design (SURVEY.md §7): the scalar scan becomes a dense 26-neighbor
compare over the whole DoG stack (VPU, embarrassingly parallel); the
data-dependent candidate list becomes a fixed-capacity index buffer via an
O(N) cumsum-scatter compaction (row-major order == the reference's scan
order); the Newton solve + contrast/edge tests are computed DENSELY at every
pixel on the VPU, so the 5-step refinement loop is just one (K,) gather per
iteration — no per-candidate neighborhood gathers at all. Quirks replicated: the prefilter threshold floors to 0.0
(lib.rs:460), ties allowed in the neighbor compares, edge test at the
refined integer coords, round-half-away re-centering.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..config import DEFAULT_CONFIG, SiftConfig

F32 = jnp.float32


def rust_round(x: jnp.ndarray) -> jnp.ndarray:
    """Rust f32::round — half away from zero (utils.rounding, jit-side)."""
    t = jnp.trunc(x)
    frac = x - t
    r = jnp.round(x)
    return jnp.where(jnp.abs(frac) == 0.5, t + jnp.sign(x), r)


def extrema_mask(dog: jnp.ndarray, cfg: SiftConfig = DEFAULT_CONFIG) -> jnp.ndarray:
    """(..., S+2, H, W) f32 -> (..., S, H, W) bool discrete-extremum mask."""
    *lead, S, H, W = dog.shape
    n_s = cfg.scales_per_octave
    border = cfg.image_border
    if H < 2 * border or W < 2 * border:
        return jnp.zeros((*lead, n_s, H, W), bool)

    neg_inf = jnp.asarray(-np.inf, F32)
    pos_inf = jnp.asarray(np.inf, F32)

    def shifted(a, dy, dx, fill):
        # value of neighbor (y+dy, x+dx), padded with fill at borders
        p = jnp.pad(a, [(0, 0)] * (a.ndim - 2) + [(1, 1), (1, 1)], constant_values=fill)
        return p[..., 1 + dy:1 + dy + H, 1 + dx:1 + dx + W]

    ring = [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1) if (dy, dx) != (0, 0)]
    rmax = None
    rmin = None
    for dy, dx in ring:
        sh = shifted(dog, dy, dx, neg_inf)
        rmax = sh if rmax is None else jnp.maximum(rmax, sh)
        sh = shifted(dog, dy, dx, pos_inf)
        rmin = sh if rmin is None else jnp.minimum(rmin, sh)

    v = dog[..., 1:n_s + 1, :, :]
    up = jnp.maximum(jnp.maximum(rmax[..., :n_s, :, :], rmax[..., 2:n_s + 2, :, :]),
                     rmax[..., 1:n_s + 1, :, :])
    up = jnp.maximum(up, jnp.maximum(dog[..., :n_s, :, :], dog[..., 2:n_s + 2, :, :]))
    lo = jnp.minimum(jnp.minimum(rmin[..., :n_s, :, :], rmin[..., 2:n_s + 2, :, :]),
                     rmin[..., 1:n_s + 1, :, :])
    lo = jnp.minimum(lo, jnp.minimum(dog[..., :n_s, :, :], dog[..., 2:n_s + 2, :, :]))

    m = ((v > 0.0) & (v >= up)) | ((v < 0.0) & (v <= lo))
    # border mask (interior scan range, lib.rs:315-323)
    ys = jnp.arange(H)
    xs = jnp.arange(W)
    m &= ((ys >= border) & (ys < H - border))[:, None]
    m &= ((xs >= border) & (xs < W - border))[None, :]
    return m


def find_candidates(mask: jnp.ndarray, k_max: int):
    """(S, H, W) bool -> fixed-capacity candidate buffer in scan order.

    Returns (s, y, x) int32 arrays of shape (k_max,), valid mask, and the true
    count (for overflow detection). Row-major nonzero == the reference's
    scale-major (y, x) scan order (lib.rs:287-332).
    """
    S, H, W = mask.shape
    flat = mask.ravel()
    n = flat.shape[0]
    # cumsum-scatter compaction: O(N), vmap-friendly (jnp.nonzero is not)
    pos = jnp.cumsum(flat, dtype=jnp.int32) - 1
    count = jnp.sum(flat, dtype=jnp.int32)
    scatter_to = jnp.where(flat & (pos < k_max), pos, k_max)
    idx = jnp.zeros(k_max, jnp.int32).at[scatter_to].set(
        jnp.arange(n, dtype=jnp.int32), mode="drop")
    valid = jnp.arange(k_max, dtype=jnp.int32) < count
    s = idx // (H * W) + 1  # mask dim 0 is scale-1
    rem = idx % (H * W)
    y = rem // W
    x = rem % W
    return s, y, x, valid, count


def _dense_cube_fields(dog: jnp.ndarray, cfg: SiftConfig = DEFAULT_CONFIG):
    """Dense per-pixel equivalents of the cube reads: returns a dict of
    (S_in, H, W) arrays (S_in = scales_per_octave slices 1..S-2) holding the
    Newton offsets, interval-ok flag, interpolated contrast, and edge-test
    keep flag AT EVERY PIXEL. All elementwise (VPU) — this replaces per-
    candidate cube gathers entirely: the refinement loop then only gathers
    from these dense maps at its current integer position.

    Border pixels (outermost ring, and s slices 0/S-1) produce garbage; the
    candidate scan range (IMAGE_BORDER=5) never reads them.
    """
    S, H, W = dog.shape
    two = F32(2.0)
    four = F32(4.0)

    def sh(a, dy, dx):
        # neighbor value at (y+dy, x+dx), edge-padded (never read at borders)
        p = jnp.pad(a, [(0, 0), (1, 1), (1, 1)], mode="edge")
        return p[:, 1 + dy:1 + dy + H, 1 + dx:1 + dx + W]

    c = dog[1:S - 1]   # current scale s, for s in 1..S-2
    p = dog[0:S - 2]   # s-1
    n = dog[2:S]       # s+1

    g1 = (n - p) / two
    g2 = (sh(c, 1, 0) - sh(c, -1, 0)) / two
    g3 = (sh(c, 0, 1) - sh(c, 0, -1)) / two
    v2 = c * two
    h11 = n + p - v2
    h12 = (sh(n, 1, 0) - sh(n, -1, 0) - sh(p, 1, 0) + sh(p, -1, 0)) / four
    h13 = (sh(n, 0, 1) - sh(n, 0, -1) - sh(p, 0, 1) + sh(p, 0, -1)) / four
    h22 = sh(c, 1, 0) + sh(c, -1, 0) - v2
    h33 = sh(c, 0, 1) + sh(c, 0, -1) - v2
    h23 = (sh(c, 1, 1) - sh(c, 1, -1) - sh(c, -1, 1) + sh(c, -1, -1)) / four

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
    contrast = c + interp / two
    keep_contrast = (jnp.abs(contrast) * F32(cfg.scales_per_octave)
                     > F32(cfg.contrast_threshold))

    # edge test at the integer pixel (lib.rs:628-653)
    eh11 = sh(c, 1, 0) + sh(c, -1, 0) - v2
    ed22 = sh(c, 0, 1) + sh(c, 0, -1) - v2
    eh12 = (sh(c, 1, 1) - sh(c, 1, -1) - sh(c, -1, 1) + sh(c, -1, -1)) / four
    tr = ed22 + eh11
    edet = ed22 * eh11 - eh12 * eh12
    thr = F32(cfg.edge_threshold)
    on_edge = (edet <= 0.0) | ((tr * tr * thr) > (thr + F32(1.0)) ** 2 * edet)

    # steps for non-converged pixels (round-half-away, int32)
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
    contrast/edge rejection (lib.rs:605-653) — all reads come from the dense
    per-pixel field maps (_dense_cube_fields), so each iteration is a single
    (K,) gather instead of per-candidate cube gathers.

    dog: (S+2, H, W). Returns dict of per-candidate arrays: ok, s, y, x
    (refined integer coords), off_s/off_y/off_x (converged offsets),
    response (|interpolated contrast|), keep (passed contrast+edge tests).
    """
    S, H, W = dog.shape
    HW = H * W
    border = cfg.image_border
    dense = _dense_cube_fields(dog, cfg)
    ok_f = dense["ok"].ravel()
    sts_f = dense["step_s"].ravel()
    sty_f = dense["step_y"].ravel()
    stx_f = dense["step_x"].ravel()

    s, y, x = s0, y0, x0
    K = s.shape[0]
    converged = jnp.zeros(K, bool)
    dead = ~valid
    nmax = cfg.scales_per_octave * HW - 1

    def lin_of(s_, y_, x_):
        return jnp.clip((s_ - 1) * HW + y_ * W + x_, 0, nmax)

    for _ in range(cfg.max_interpolation_steps):
        active = ~(converged | dead)
        lin = lin_of(s, y, x)
        ok_here = ok_f[lin]
        converged |= active & ok_here
        step = active & ~ok_here
        x = jnp.where(step, x + stx_f[lin], x)
        y = jnp.where(step, y + sty_f[lin], y)
        s = jnp.where(step, s + sts_f[lin], s)
        bad = ((s < 1) | (s > cfg.scales_per_octave)
               | (x < border) | (x >= W - border)
               | (y < border) | (y >= H - border))
        dead |= step & bad

    lin = lin_of(s, y, x)
    return {
        "ok": converged, "s": s, "y": y, "x": x,
        "off_s": dense["off_s"].ravel()[lin],
        "off_y": dense["off_y"].ravel()[lin],
        "off_x": dense["off_x"].ravel()[lin],
        "response": dense["response"].ravel()[lin],
        "keep": dense["keep"].ravel()[lin] & converged,
    }
