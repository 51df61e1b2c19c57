"""Persistent XLA compile cache, keyed safely for this environment.

Repeat bench/driver runs skip the multi-minute remote TPU compiles. The
cache directory is keyed by backend platform — and, on CPU, by a hash of
the host's cpuinfo flags — because the cache key itself does not include
machine features: this host's shared cache accumulated XLA:CPU AOT
artifacts compiled on machines with different CPU feature sets, which
cpu_aot_loader loads with a "could lead to execution errors such as
SIGILL" warning.
"""

from __future__ import annotations

import os

BASE = "/root/.cache/jax_comp_cache"


def enable_compile_cache() -> str:
    """Configure jax's persistent compile cache (platform-keyed dir).

    Initializes the backend (jax.default_backend()); call before the first
    compile, after any jax.config platform overrides. Returns the dir."""
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
    import jax

    base = os.environ.get("JAX_COMPILATION_CACHE_DIR", BASE)
    suffix = jax.default_backend()
    if suffix == "cpu":
        import hashlib

        try:
            with open("/proc/cpuinfo") as f:
                flags = next((ln for ln in f if ln.startswith("flags")), "")
            suffix += "_" + hashlib.sha1(flags.encode()).hexdigest()[:8]
        except OSError:
            pass
    path = base.rstrip("/") + "_" + suffix
    jax.config.update("jax_compilation_cache_dir", path)
    return path
