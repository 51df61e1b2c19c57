"""Float rounding matching Rust/OpenCV semantics — re-export.

Rust's `f32::round` rounds half AWAY from zero, while numpy/jax `round`
rounds half to even. The reference uses Rust rounding at: interpolation
re-centering (lib.rs:588-590), orientation radius (lib.rs:380), orientation
bin (lib.rs:726), descriptor center (lib.rs:796-797), descriptor radius
(lib.rs:800), and u8 quantization (lib.rs:983).

The single jit-side implementation lives in ops.extrema.rust_round (this
module re-exports it). Two deliberate siblings exist and are NOT duplicates:
  - oracle.rust_round_f32: NumPy-f32 scalar-semantics twin for the
    exact-order CPU oracle;
  - ops.pallas.util.round_half_away: in-kernel variant written without
    jnp.trunc, which has no Mosaic TPU lowering.
"""

from __future__ import annotations

from ..ops.extrema import rust_round  # noqa: F401

__all__ = ["rust_round"]
