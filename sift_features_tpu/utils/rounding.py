"""Float rounding helpers matching Rust/OpenCV semantics.

Rust's `f32::round` rounds half AWAY from zero, while numpy/jax `round` rounds
half to even. The reference uses Rust rounding at: interpolation re-centering
(lib.rs:588-590), orientation radius (lib.rs:380), orientation bin (lib.rs:726),
descriptor center (lib.rs:796-797), descriptor radius (lib.rs:800), and u8
quantization (lib.rs:983). All of these are replicated via `rust_round`.
"""

from __future__ import annotations


def rust_round(x):
    """Round half away from zero, exactly (no +0.5 trick, which is wrong for
    values one ULP below 0.5). Works for numpy and jax arrays."""
    import numpy as _np

    xp = _np  # jax arrays dispatch through __array_ufunc__? No — use jnp when traced.
    try:
        import jax

        if isinstance(x, jax.Array) or isinstance(x, jax.core.Tracer):
            import jax.numpy as xp  # type: ignore
    except Exception:
        pass
    t = xp.trunc(x)
    frac = x - t  # exact for |x| < 2^23 in f32
    r = xp.round(x)  # half-to-even
    is_half = xp.abs(frac) == 0.5
    away = t + xp.sign(x)
    return xp.where(is_half, away, r)
