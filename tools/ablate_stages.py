"""True per-stage cost of the fused 1080p pipeline by in-graph ablation.

Separate per-op jits mis-measure on this backend (per-execution dispatch
overhead through the axon tunnel dwarfs small ops), so each stage's cost is
the DELTA between full-pipeline programs truncated at successive stages
(models.extractor._detect_octave_batched `stages` knob).
Run alone on the chip: python tools/ablate_stages.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np  # noqa: E402


def main():
    import jax

    from sift_features_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    import jax.numpy as jnp

    from bench import make_frames
    from sift_features_tpu.config import DEFAULT_CONFIG
    from sift_features_tpu.models.extractor import _extract_batch_fused

    b = int(os.environ.get("BENCH_BATCH", "4"))
    frames = jnp.asarray(make_frames(b))
    cfg = DEFAULT_CONFIG
    # mode knobs for A/B ablation of the round-3 kernels
    import dataclasses

    if os.environ.get("BENCH_REFINE_MODE"):
        cfg = dataclasses.replace(cfg,
                                  refine_mode=os.environ["BENCH_REFINE_MODE"])
    if os.environ.get("BENCH_WINDOW_KERNEL"):
        cfg = dataclasses.replace(
            cfg, window_kernel=os.environ["BENCH_WINDOW_KERNEL"])
    if os.environ.get("BENCH_STORAGE_BF16") == "1":
        cfg = dataclasses.replace(cfg, storage_dtype="bfloat16")
    if os.environ.get("BENCH_STORAGE"):
        cfg = dataclasses.replace(cfg,
                                  storage_dtype=os.environ["BENCH_STORAGE"])
    budget = int(os.environ.get("BENCH_BUDGET", "0")) or None
    n_oct = cfg.n_octaves(frames.shape[1] * 2, frames.shape[2] * 2)

    @functools.partial(jax.jit, static_argnums=(1,))
    def run(imgs, stages):
        return _extract_batch_fused(imgs, n_oct, cfg, stages, budget=budget)

    def timed(stages, iters=6):
        out = run(frames, stages)
        float(np.asarray(out["kps"].ravel()[0]))
        t0 = time.perf_counter()
        s = None
        for _ in range(iters):
            out = run(frames, stages)
            s = out["kps"].ravel()[0] + out["n_candidates"].sum()
        float(np.asarray(s))
        dt = (time.perf_counter() - t0) / iters / b * 1e3
        return dt

    # two passes: the first execution of each program through the tunnel
    # carries a warm-up penalty (round-4: pyramid measured 58 ms on pass 1,
    # 12 ms on pass 2) — report both, trust pass 2
    stage_list = ("pyramid", "extrema", "refine", "orient", "full")
    for pass_i in range(2):
        prev = 0.0
        for stages in stage_list:
            ms = timed(stages)
            print(f"[pass {pass_i + 1}] {stages:>8s}: {ms:8.2f} ms/frame  "
                  f"(delta {ms - prev:+7.2f})", flush=True)
            prev = ms


if __name__ == "__main__":
    main()
