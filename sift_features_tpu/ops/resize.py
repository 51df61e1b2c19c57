"""OpenCV-semantics resize ops (JAX).

The reference delegates resizing to its Processing backend (lib.rs:88-89);
the OpenCV test backend uses cv2.resize INTER_LINEAR / INTER_NEAREST
(opencv_processing.rs:8-35). Shapes are static under jit, so the index/weight
tables are computed with NumPy at trace time and baked into the program —
the resize itself becomes two gathers + an FMA (VPU-exact f32, no MXU).

OpenCV coordinate mapping (resize.cpp): src_x = (dst_x + 0.5) * scale - 0.5
for INTER_LINEAR with edge clamping; src_x = floor(dst_x * scale) for
INTER_NEAREST. For the pyramid's exact 1/2 nearest downsample this reduces to
`x[..., ::2, ::2]` (verified bit-equal to cv2).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def _linear_coeffs(src: int, dst: int):
    scale = src / dst
    fx = (np.arange(dst, dtype=np.float64) + 0.5) * scale - 0.5
    sx = np.floor(fx).astype(np.int64)
    fx = fx - sx
    fx[sx < 0] = 0.0
    sx[sx < 0] = 0
    fx[sx >= src - 1] = 1.0
    sx[sx >= src - 1] = src - 2
    return sx, fx.astype(np.float32)


def resize_linear(img: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Bilinear resize of (..., H, W) f32, OpenCV INTER_LINEAR semantics
    (horizontal pass then vertical, f32 weights)."""
    h, w = img.shape[-2], img.shape[-1]
    sx, fx = _linear_coeffs(w, out_w)
    sy, fy = _linear_coeffs(h, out_h)
    fx = jnp.asarray(fx)
    fy = jnp.asarray(fy)
    # horizontal: out[..., :, j] = src[..., sx]*(1-fx) + src[..., sx+1]*fx
    hor = img[..., sx] * (1 - fx) + img[..., sx + 1] * fx
    out = (hor[..., sy, :] * (1 - fy)[..., :, None]
           + hor[..., sy + 1, :] * fy[..., :, None])
    return out.astype(jnp.float32)


def resize_nearest_half(img: jnp.ndarray) -> jnp.ndarray:
    """Exact-1/2 INTER_NEAREST downsample == stride-2 slice (lib.rs:247's
    resize_nearest(w/2, h/2); verified bit-equal to cv2.INTER_NEAREST).
    Written as TWO single-axis strided slices: the fused rows+lanes slice
    lowers to an index-vector gather on TPU (35+ ms/batch at octave 0,
    tools/slice_experiment.py); per-axis slices lower to strided copies."""
    h, w = img.shape[-2], img.shape[-1]
    return img[..., : (h // 2) * 2 : 2, :][..., :, : (w // 2) * 2 : 2]


def resize_nearest(img: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """General INTER_NEAREST: sx = floor(dst_x * scale)."""
    h, w = img.shape[-2], img.shape[-1]
    sx = np.minimum(np.floor(np.arange(out_w) * (w / out_w)), w - 1).astype(np.int64)
    sy = np.minimum(np.floor(np.arange(out_h) * (h / out_h)), h - 1).astype(np.int64)
    return img[..., sy[:, None], sx[None, :]]
