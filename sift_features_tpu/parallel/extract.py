"""Data-parallel (frames) sharded extraction.

The primary throughput axis (SURVEY.md §2.3): a batch of frames is sharded
over the mesh's `data` axis and each device runs the full single-frame
pipeline on its shard. Extraction is embarrassingly parallel per frame — no
collectives — so this is a `shard_map` around the same vmapped pipeline the
single-chip path uses (models.extractor), guaranteeing XLA partitions it with
zero cross-device traffic.

Optionally the rows of every frame are ALSO sharded over the `space` axis
(latency mode for large frames): the pyramid's vertical blurs then use
halo-exchange (parallel.halo) and detection runs on the row-gathered stacks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..config import DEFAULT_CONFIG, SiftConfig
from ..models.extractor import _extract_batch_core, _extract_single
from ..ops import pyramid as pyr_ops
from ..ops.gaussian import cv_ksize
from ..ops.resize import resize_nearest_half
from .halo import gaussian_blur_sharded


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def _extract_dp_jit(imgs: jnp.ndarray, n_octaves: int, cfg: SiftConfig,
                    mesh: Mesh):
    def shard_body(im_shard):
        # each data member runs the full batched pipeline on its frame shard
        # (fused Pallas program on TPU; dense XLA under the CPU test mesh)
        return _extract_batch_core(im_shard, n_octaves, cfg)

    return jax.shard_map(
        shard_body, mesh=mesh,
        in_specs=P("data", None, None),
        out_specs=P("data"))(imgs)


def extract_batch_dp(imgs_u8, mesh: Mesh, config: SiftConfig = DEFAULT_CONFIG):
    """(B, H, W) u8, B divisible by mesh 'data' size -> padded result pytree,
    identical to models.extractor.extract_batch but sharded over frames."""
    imgs_u8 = jnp.asarray(imgs_u8, jnp.uint8)
    h, w = imgs_u8.shape[-2], imgs_u8.shape[-1]
    n_d = mesh.shape["data"]
    if imgs_u8.shape[0] % n_d:
        raise ValueError(f"batch {imgs_u8.shape[0]} not divisible by data={n_d}")
    n_oct = config.n_octaves(h * config.inv_delta_min, w * config.inv_delta_min)
    return _extract_dp_jit(imgs_u8, n_oct, config, mesh)


# ---------------------------------------------------------------------------
# Spatially-sharded pyramid (data x space): vertical blurs halo-exchange over
# the space axis; detection runs on row-gathered octaves.
# ---------------------------------------------------------------------------

def _build_octaves_spatial(seed_rows: jnp.ndarray, n_octaves: int,
                           cfg: SiftConfig, n_space: int, h_seed: int):
    """seed_rows: (h_seed/n_space, W) local row shard of one frame's seed.
    Returns list of FULL (S+3, H_o, W_o) Gaussian stacks (row-gathered), built
    with halo-exchange blurs while shard heights stay >= kernel radius."""
    sigmas = cfg.octave_sigmas()
    octaves = []
    cur = seed_rows
    h = h_seed
    for _ in range(n_octaves):
        h_loc = h // n_space
        # h % (2*n_space): h_loc must be EVEN, else the local ::2 downsample
        # rows of odd-offset shards are not the globally even rows
        sharded = (h % (2 * n_space) == 0
                   and all(h_loc >= cv_ksize(s) // 2 for s in sigmas[1:])
                   and h_loc >= 2)
        if sharded:
            if cur.shape[-2] == h:  # previous octave computed replicated
                idx = jax.lax.axis_index("space")
                cur = jax.lax.dynamic_slice(cur, (idx * h_loc, jnp.int32(0)),
                                            (h_loc, cur.shape[-1]))
            imgs = [cur]
            for sig in sigmas[1:]:
                imgs.append(gaussian_blur_sharded(imgs[-1], sig, "space", n_space))
            stack_loc = jnp.stack(imgs, axis=0)          # (S+3, h_loc, W)
            full = jax.lax.all_gather(stack_loc, "space", axis=1, tiled=True)
            cur = resize_nearest_half(imgs[len(imgs) - 3])
        else:
            # tiny top octaves: replicated compute (cur is full rows already
            # or gathered below)
            if cur.shape[-2] != h:
                cur = jax.lax.all_gather(cur, "space", axis=0, tiled=True)
            from ..ops.gaussian import gaussian_blur

            imgs = [cur]
            for sig in sigmas[1:]:
                imgs.append(gaussian_blur(imgs[-1], sig))
            full = jnp.stack(imgs, axis=0)
            cur = resize_nearest_half(imgs[len(imgs) - 3])
        octaves.append(full)
        h = h // 2
    return octaves


def _extract_single_spatial(img_u8: jnp.ndarray, n_octaves: int,
                            cfg: SiftConfig, n_space: int,
                            budget: int | None = None):
    """Single-frame pipeline with the pyramid row-sharded over 'space' AND
    detection work sharded by row band: each space member scans, refines,
    orients and describes ONLY the candidates whose discrete extremum lies
    in its own rows (the gathered stack provides the window context), so
    the per-candidate stages run at 1/n_space cost per member. Runs inside
    shard_map; returns this MEMBER's keypoint buffers (space-variant —
    concatenating members' valid rows gives the n_space=1 keypoint SET;
    order is member-major per octave instead of global scan order).

    budget (C15, lib.rs:156-161): when set, members stop after orientation,
    all_gather their emission responses over 'space' (4 B/lane — KB-scale),
    take the per-frame global response top-K, and describe ONLY their own
    selected keypoints. Same selection semantics as the fused budgeted path
    (top_k over the member-major concatenated buffer — exactly the layout
    the previous post-hoc truncation saw); the descriptor stage now runs at
    budget cost instead of full-emission cost. Member output buffers are
    (budget,)-sized; concatenating members' valid rows gives the selected
    set.

    On TPU the per-candidate stages (refinement, orientation, description)
    run the Pallas kernels; only the extrema scan takes the XLA
    reduce-window path (the member's row band is a traced axis_index
    function, which the fused extrema kernel's static grid cannot take)."""
    from ..models.extractor import (_describe_octave_subset, _detect_octave,
                                    compact_indices)

    seed = pyr_ops.create_seed_image(img_u8[None], cfg)[0]   # replicated
    h_seed, w_seed = seed.shape
    h_loc = h_seed // n_space
    idx = jax.lax.axis_index("space")
    seed_rows = jax.lax.dynamic_slice(seed, (idx * h_loc, jnp.int32(0)),
                                      (h_loc, w_seed))
    octs = _build_octaves_spatial(seed_rows, n_octaves, cfg, n_space, h_seed)
    out = []
    hw_list = []
    for o, gauss in enumerate(octs):
        h = gauss.shape[-2]
        hb = -(-h // n_space)                 # member band = ceil split
        y0 = idx * hb
        r = _detect_octave(gauss, gauss[1:] - gauss[:-1], o, cfg,
                           row_range=(y0, jnp.minimum(y0 + hb, h)),
                           describe=budget is None)
        out.append(r)
        hw_list.append((h, gauss.shape[-1]))
    res = {
        "kps": jnp.concatenate([r["kps"] for r in out], axis=0),
        "valid": jnp.concatenate([r["valid"] for r in out], axis=0),
        "n_candidates": jnp.stack([r["n_candidates"] for r in out]),
        "n_survivors": jnp.stack([r["n_survivors"] for r in out]),
        "n_emitted": jnp.stack([r["n_emitted"] for r in out]),
    }
    if budget is None:
        res["desc"] = jnp.concatenate([r["desc"] for r in out], axis=0)
        return res

    # ---- global per-frame top-K across space members, describe selected ---
    m_tot = res["valid"].shape[0]
    resp_loc = jnp.where(res["valid"], res["kps"][:, 4], -jnp.inf)
    # member-major concatenation == the layout extract_match_step's previous
    # post-hoc truncation saw, so tie-breaking is unchanged
    resp_all = jax.lax.all_gather(resp_loc, "space", tiled=True)
    kb = min(budget, n_space * m_tot)
    top_val, top_idx = jax.lax.top_k(resp_all, kb)           # (kb,)
    tvalid = top_val > -jnp.inf
    mine = tvalid & (top_idx >= idx * m_tot) & (top_idx < (idx + 1) * m_tot)
    loc = jnp.clip(top_idx - idx * m_tot, 0, m_tot - 1)      # (kb,) local row

    out_kps = jnp.where(mine[:, None], res["kps"][loc], jnp.float32(0.0))
    out_desc = jnp.zeros((kb, cfg.descriptor_size), jnp.uint8)
    off = 0
    for r, (h, w) in zip(out, hw_list):
        m_o = r["valid"].shape[0]
        in_o = mine & (loc >= off) & (loc < off + m_o)       # (kb,)
        c_cap = min(kb, m_o)
        midx, mvalid, _ = compact_indices(in_o, c_cap)       # rows of kb axis
        sel = jnp.take(loc, midx) - off                      # octave-local
        sel = jnp.clip(sel, 0, m_o - 1)
        fields = {k: v[sel] for k, v in r["desc_in"].items()}
        desc_c = _describe_octave_subset(r["win_ctx"], fields, mvalid, cfg,
                                         h, w)               # (c_cap, D)
        rank = jnp.cumsum(in_o) - 1
        d_rows = desc_c[jnp.clip(rank, 0, c_cap - 1)]
        out_desc = jnp.where(in_o[:, None], d_rows, out_desc)
        off += m_o
    res["kps"] = out_kps
    res["desc"] = out_desc
    res["valid"] = mine
    return res
