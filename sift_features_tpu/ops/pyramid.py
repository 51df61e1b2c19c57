"""Gaussian scale space + DoG pyramid (JAX, TPU-native).

Reference semantics: create_seed_image (lib.rs:196-210),
build_gaussian_scale_space (lib.rs:213-267), build_dog (lib.rs:271-279).

TPU design notes:
- Everything is batched over a leading frames axis (B, H, W); the reference
  is single-image (SURVEY.md §2.3 — parallelism is new, not ported).
- Octave shapes shrink by exact halving (floor) per octave; shapes are static
  under jit so the pyramid is a Python list of (B, S+3, H_o, W_o) arrays.
- The octave chain is inherently serial (octave o+1 seeds from octave o's
  image [S], lib.rs:241-249); throughput comes from the batch axis.
- Incremental blurs use the VPU tap-sum in ops.gaussian (exact f32).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..config import DEFAULT_CONFIG, SiftConfig
from .gaussian import gaussian_blur
from .resize import resize_linear, resize_nearest_half


def create_seed_image(img_u8: jnp.ndarray, cfg: SiftConfig = DEFAULT_CONFIG) -> jnp.ndarray:
    """(B, H, W) u8 -> (B, 2H, 2W) f32 seed image: /255, 2x linear upsample,
    pre-blur with sigma = sqrt(sigma_min^2 - sigma_in^2) * 2 (lib.rs:196-210)."""
    img = img_u8.astype(jnp.float32) / np.float32(255.0)
    h, w = img.shape[-2], img.shape[-1]
    up = resize_linear(img, h * cfg.inv_delta_min, w * cfg.inv_delta_min)
    return gaussian_blur(up, cfg.seed_sigma)


def build_scale_space(seed: jnp.ndarray, n_octaves: int,
                      cfg: SiftConfig = DEFAULT_CONFIG) -> list[jnp.ndarray]:
    """Seed (B, H, W) -> list of n_octaves arrays (B, S+3, H_o, W_o)."""
    sigmas = cfg.octave_sigmas()
    octaves = []
    initial = seed
    for _ in range(n_octaves):
        imgs = [initial]
        for sigma in sigmas[1:]:
            imgs.append(gaussian_blur(imgs[-1], sigma))
        octaves.append(jnp.stack(imgs, axis=-3))
        # next octave seed: nearest-neighbor 1/2 downsample of image [S]
        # (lib.rs:245-248) == stride-2 slice
        initial = resize_nearest_half(imgs[len(imgs) - 3])
    return octaves


def build_dog(scale_space: list[jnp.ndarray]) -> list[jnp.ndarray]:
    """Adjacent-slice subtraction per octave (lib.rs:271-279)."""
    return [o[..., 1:, :, :] - o[..., :-1, :, :] for o in scale_space]


def n_octaves_for(h_seed: int, w_seed: int, cfg: SiftConfig = DEFAULT_CONFIG) -> int:
    return cfg.n_octaves(h_seed, w_seed)
