"""DoG extrema detection + subpixel refinement (JAX, TPU-native).

Reference semantics: point_is_local_extremum (lib.rs:437-506),
interpolate_extremum (lib.rs:508-603), extremum_contrast (lib.rs:605-626),
extremum_is_on_edge (lib.rs:628-653).

TPU design (SURVEY.md §7): the scalar scan becomes a dense 26-neighbor
compare over the whole DoG stack (VPU, embarrassingly parallel); the
data-dependent candidate list becomes a fixed-capacity index buffer from
`jnp.nonzero(size=K)` (row-major order == the reference's scan order); the
Newton loop becomes 5 unrolled masked vector steps over the candidate batch
with cube gathers. Quirks replicated: the prefilter threshold floors to 0.0
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


def _gather_cube(dog: jnp.ndarray, s, y, x) -> jnp.ndarray:
    """Gather the 3x3x3 neighborhood for each candidate: (K, 3, 3, 3)."""
    S, H, W = dog.shape
    flat = dog.ravel()
    ds = jnp.arange(-1, 2)
    base = (s[:, None, None, None] + ds[None, :, None, None]) * (H * W) \
        + (y[:, None, None, None] + ds[None, None, :, None]) * W \
        + (x[:, None, None, None] + ds[None, None, None, :])
    return flat[base]


def _offsets_from_cube(c: jnp.ndarray):
    """Gradient/Hessian solve on a (K,3,3,3) cube (lib.rs:540-569).
    Returns (off_s, off_y, off_x) f32 per candidate; NaN where det == 0."""
    two = F32(2.0)
    four = F32(4.0)
    g1 = (c[:, 2, 1, 1] - c[:, 0, 1, 1]) / two
    g2 = (c[:, 1, 2, 1] - c[:, 1, 0, 1]) / two
    g3 = (c[:, 1, 1, 2] - c[:, 1, 1, 0]) / two
    v2 = c[:, 1, 1, 1] * two
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
    return off_s, off_y, off_x, (g1, g2, g3)


def refine(dog: jnp.ndarray, s0, y0, x0, valid, cfg: SiftConfig = DEFAULT_CONFIG):
    """Batched Newton refinement, <=5 masked steps (lib.rs:525-603).

    dog: (S+2, H, W). Returns dict of per-candidate arrays: ok, s, y, x
    (refined integer coords), off_s/off_y/off_x (converged offsets).
    """
    S, H, W = dog.shape
    border = cfg.image_border
    s, y, x = s0, y0, x0
    K = s.shape[0]
    off_s = jnp.zeros(K, F32)
    off_y = jnp.zeros(K, F32)
    off_x = jnp.zeros(K, F32)
    converged = jnp.zeros(K, bool)
    dead = ~valid

    for _ in range(cfg.max_interpolation_steps):
        active = ~(converged | dead)
        # clamp coords for safe gathers; dead/converged lanes ignore results
        sc = jnp.clip(s, 1, S - 2)
        yc = jnp.clip(y, 1, H - 2)
        xc = jnp.clip(x, 1, W - 2)
        cube = _gather_cube(dog, sc, yc, xc)
        osc, oy, ox, _ = _offsets_from_cube(cube)
        ok = (jnp.abs(osc) < 0.5) & (jnp.abs(ox) < 0.5) & (jnp.abs(oy) < 0.5)
        # NaN offsets (singular Hessian): not ok; step 0 (matches Rust's
        # NaN as-cast -> 0), burns iterations in place.
        osc0 = jnp.where(jnp.isnan(osc), F32(0), osc)
        oy0 = jnp.where(jnp.isnan(oy), F32(0), oy)
        ox0 = jnp.where(jnp.isnan(ox), F32(0), ox)

        newly = active & ok
        converged |= newly
        off_s = jnp.where(newly, osc0, off_s)
        off_y = jnp.where(newly, oy0, off_y)
        off_x = jnp.where(newly, ox0, off_x)

        step = active & ~ok
        # inf offsets -> huge step -> dead via bounds check (int32-safe clip)
        big = F32(1e9)
        nx = x + jnp.clip(rust_round(ox0), -big, big).astype(jnp.int32)
        ny = y + jnp.clip(rust_round(oy0), -big, big).astype(jnp.int32)
        ns = s + jnp.clip(rust_round(osc0), -big, big).astype(jnp.int32)
        x = jnp.where(step, nx, x)
        y = jnp.where(step, ny, y)
        s = jnp.where(step, ns, s)
        bad = ((s < 1) | (s > cfg.scales_per_octave)
               | (x < border) | (x >= W - border)
               | (y < border) | (y >= H - border))
        dead |= step & bad

    return {"ok": converged, "s": s, "y": y, "x": x,
            "off_s": off_s, "off_y": off_y, "off_x": off_x}


def contrast_and_edge(dog: jnp.ndarray, s, y, x, off_s, off_y, off_x,
                      cfg: SiftConfig = DEFAULT_CONFIG):
    """Interpolated response + edge rejection at the refined integer point
    (lib.rs:605-653). Returns (response=|contrast|, keep mask)."""
    S, H, W = dog.shape
    sc = jnp.clip(s, 1, S - 2)
    yc = jnp.clip(y, 1, H - 2)
    xc = jnp.clip(x, 1, W - 2)
    cube = _gather_cube(dog, sc, yc, xc)
    two = F32(2.0)
    four = F32(4.0)
    g1 = (cube[:, 2, 1, 1] - cube[:, 0, 1, 1]) / two
    g2 = (cube[:, 1, 2, 1] - cube[:, 1, 0, 1]) / two
    g3 = (cube[:, 1, 1, 2] - cube[:, 1, 1, 0]) / two
    interp = off_s * g1 + off_y * g2 + off_x * g3
    contrast = cube[:, 1, 1, 1] + interp / two
    keep = jnp.abs(contrast) * F32(cfg.scales_per_octave) > F32(cfg.contrast_threshold)

    v2 = cube[:, 1, 1, 1] * two
    h11 = cube[:, 1, 2, 1] + cube[:, 1, 0, 1] - v2
    d22 = cube[:, 1, 1, 2] + cube[:, 1, 1, 0] - v2
    h12 = (cube[:, 1, 2, 2] - cube[:, 1, 2, 0] - cube[:, 1, 0, 2] + cube[:, 1, 0, 0]) / four
    tr = d22 + h11
    det = d22 * h11 - h12 * h12
    thr = F32(cfg.edge_threshold)
    on_edge = (det <= 0.0) | ((tr * tr * thr) > (thr + F32(1.0)) ** 2 * det)
    keep &= ~on_edge
    return jnp.abs(contrast), keep
