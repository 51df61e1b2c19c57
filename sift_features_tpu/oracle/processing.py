"""NumPy twin of the JAX pixel-op backend.

Bit-identical semantics to sift_features_tpu.ops.{gaussian,resize} (same tap
order, same index/weight tables) so oracle-vs-JAX pipeline tests on CPU can
assert bit-level equality of the scale space. This mirrors the reference's
`Processing` trait seam (lib.rs:86-90): CvProcessing is the cross-library
oracle, NumpyProcessing is the in-framework reference semantics.
"""

from __future__ import annotations

import numpy as np

from ..ops.gaussian import gaussian_kernel, reflect101_indices

F32 = np.float32


class NumpyProcessing:
    @staticmethod
    def gaussian_blur(img: np.ndarray, sigma: float) -> np.ndarray:
        kern = gaussian_kernel(sigma)
        k = len(kern)
        r = k // 2

        def pass_along(x, axis):
            n = x.shape[axis]
            idx = reflect101_indices(n, r)
            xp = np.take(x, idx, axis=axis)
            out = None
            for i in range(k):
                sl = [slice(None)] * x.ndim
                sl[axis] = slice(i, i + n)
                term = F32(kern[i]) * xp[tuple(sl)]
                out = term if out is None else out + term
            return out

        out = pass_along(img.astype(F32), img.ndim - 1)
        return pass_along(out, img.ndim - 2)

    @staticmethod
    def resize_linear(img: np.ndarray, width: int, height: int) -> np.ndarray:
        from ..ops.resize import _linear_coeffs

        h, w = img.shape
        sx, fx = _linear_coeffs(w, width)
        sy, fy = _linear_coeffs(h, height)
        img = img.astype(F32)
        hor = img[:, sx] * (1 - fx) + img[:, sx + 1] * fx
        out = hor[sy, :] * (1 - fy)[:, None] + hor[sy + 1, :] * fy[:, None]
        return out.astype(F32)

    @staticmethod
    def resize_nearest(img: np.ndarray, width: int, height: int) -> np.ndarray:
        h, w = img.shape
        sx = np.minimum(np.floor(np.arange(width) * (w / width)), w - 1).astype(np.int64)
        sy = np.minimum(np.floor(np.arange(height) * (h / height)), h - 1).astype(np.int64)
        return img[sy[:, None], sx[None, :]]
