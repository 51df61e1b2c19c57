"""OpenCV-semantics Gaussian blur (JAX, TPU-native).

Matches cv2.GaussianBlur(img, (0,0), sigma) on CV_32F as used by the
reference's oracle backend (opencv_processing.rs:51-57): auto kernel size
cvRound(sigma*4*2+1)|1, kernel from getGaussianKernel (computed in f64,
cast f32, normalized in f64), BORDER_REFLECT_101.

TPU design: the separable convolution is an unrolled tap-sum on the VPU
(sequential f32 multiply-adds), NOT an MXU conv — XLA's TPU conv/dot default
to bf16 operand truncation which would destroy parity, while elementwise f32
ops are IEEE-exact and the blur is HBM-bandwidth-bound anyway (the tap chain
fuses into a single pass). Accumulation order matches the framework's NumPy
twin (`NumpyProcessing`) so CPU tests are bit-level.

Border handling: reflect-101 indices are precomputed with NumPy per static
(size, radius) and applied as a gather before the valid-mode tap sum; this
reproduces OpenCV's iterated borderInterpolate for radii exceeding the image
(tiny top octaves of the pyramid).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def cv_ksize(sigma: float) -> int:
    """OpenCV createGaussianFilter's auto kernel size for float images:
    cvRound(sigma*4*2+1) | 1 (cvRound = round-half-to-even)."""
    v = sigma * 4 * 2 + 1
    # cvRound: round half to even
    r = int(np.rint(v))
    return r | 1


def gaussian_kernel(sigma: float, ksize: int | None = None) -> np.ndarray:
    """getGaussianKernel(ksize, sigma, CV_32F) reproduction (f32 result):
    t = exp(-x^2/(2 sigma^2)) in f64, cast f32, sum of the f32 values in f64,
    normalize in f64, cast f32. Verified within 1 ULP of cv2."""
    if ksize is None:
        ksize = cv_ksize(sigma)
    xs = np.arange(ksize, dtype=np.float64) - (ksize - 1) * 0.5
    t = np.exp(-0.5 / (sigma * sigma) * xs * xs)
    cf = t.astype(np.float32)
    s = 1.0 / np.sum(cf.astype(np.float64))
    return (cf.astype(np.float64) * s).astype(np.float32)


def reflect101_indices(n: int, r: int) -> np.ndarray:
    """Index map of length n + 2r implementing OpenCV BORDER_REFLECT_101
    (iterated for r >= n)."""
    idx = np.arange(-r, n + r)
    if n == 1:
        return np.zeros(n + 2 * r, np.int64)
    period = 2 * (n - 1)
    idx = np.mod(idx, period)
    idx = np.where(idx >= n, period - idx, idx)
    return idx


def _reflect101_pad(x: jnp.ndarray, r: int, axis: int) -> jnp.ndarray:
    """Reflect-101 pad by r along axis. For r < n this is two reversed
    slices + concatenate (fuses on TPU; a jnp.take gather does not); the
    iterated-reflection case (r >= n, tiny top-octave images) falls back to
    the precomputed index gather."""
    n = x.shape[axis]
    if r == 0:
        return x
    if r < n - 1:  # tail slice stop must stay >= 0
        def sl(a, b, step=1):
            s = [slice(None)] * x.ndim
            s[axis] = slice(a, b, step)
            return x[tuple(s)]

        head = sl(r, 0, -1)          # rows r..1
        tail = sl(n - 2, n - 2 - r, -1)  # rows n-2..n-1-r
        return jnp.concatenate([head, x, tail], axis=axis)
    idx = reflect101_indices(n, r)
    return jnp.take(x, jnp.asarray(idx), axis=axis)


def blur_1d(x: jnp.ndarray, kernel: np.ndarray, axis: int) -> jnp.ndarray:
    """Separable blur pass along `axis` with reflect-101 border.

    Unrolled tap sum in ascending tap order (matches NumpyProcessing)."""
    k = len(kernel)
    r = k // 2
    n = x.shape[axis]
    xp = _reflect101_pad(x, r, axis)
    out = None
    for i in range(k):
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(i, i + n)
        term = jnp.float32(kernel[i]) * xp[tuple(sl)]
        out = term if out is None else out + term
    return out


def gaussian_blur(img: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """Gaussian blur of (..., H, W) f32: horizontal pass then vertical
    (OpenCV applies row filter first)."""
    kern = gaussian_kernel(sigma)
    out = blur_1d(img, kern, axis=img.ndim - 1)
    out = blur_1d(out, kern, axis=img.ndim - 2)
    return out
