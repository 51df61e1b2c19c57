"""Math helpers for Mosaic TPU kernels.

Mosaic lacks lowerings for atan/atan2/trunc (checked against
jax/_src/pallas/mosaic/lowering.py); these are implemented from supported
primitives. atan2 uses the Cephes atanf minimax polynomial with the
tan(pi/8)/tan(3pi/8) range reduction — max error ~2 ULP f32, comparable to
XLA's own f32 atan2 lowering on TPU.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

F32 = jnp.float32

_TAN_PI_8 = np.float32(0.4142135623730950)
_TAN_3PI_8 = np.float32(2.414213562373095)
_PI = np.float32(np.pi)
_PI_2 = np.float32(np.pi / 2)
_PI_4 = np.float32(np.pi / 4)


def round_half_away(x):
    """Rust f32::round without trunc: floor(x+0.5), fixed where x+0.5 is
    integral and x < 0 (negative exact halves must round away)."""
    r = jnp.floor(x + F32(0.5))
    return jnp.where((x + F32(0.5) == r) & (x < 0), r - F32(1.0), r)


def atan_f32(x):
    """Cephes atanf: range-reduce |x| to [0, tan(pi/8)], degree-7 odd
    minimax polynomial."""
    ax = jnp.abs(x)
    big = ax > _TAN_3PI_8
    mid = (ax > _TAN_PI_8) & ~big
    x1 = jnp.where(big, F32(-1.0) / jnp.maximum(ax, F32(1e-30)),
                   jnp.where(mid, (ax - F32(1.0)) / (ax + F32(1.0)), ax))
    z = x1 * x1
    p = (((F32(8.05374449538e-2) * z - F32(1.38776856032e-1)) * z
          + F32(1.99777106478e-1)) * z - F32(3.33329491539e-1)) * z * x1 + x1
    r = jnp.where(big, _PI_2 + p, jnp.where(mid, _PI_4 + p, p))
    return jnp.where(x < 0, -r, r)


def atan2_f32(y, x):
    """f32 atan2 with standard quadrant conventions (atan2(0, -a) = +pi)."""
    safe_x = jnp.where(x == 0, F32(1.0), x)
    a = atan_f32(y / safe_x)
    r = jnp.where(x > 0, a, jnp.where(y >= 0, a + _PI, a - _PI))
    r = jnp.where(x == 0,
                  jnp.where(y > 0, _PI_2, jnp.where(y < 0, -_PI_2, F32(0.0))),
                  r)
    return r
