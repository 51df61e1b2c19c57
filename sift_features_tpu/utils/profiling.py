"""Tracing / profiling / metrics (SURVEY.md §5.1, §5.5).

The reference has no in-library observability (only offline divan benches);
here per-stage wall times, keypoint/rejection counters, and jax.profiler
traces are first-class. The rejection counters are the primary
parity-debugging tool: a divergence vs the oracle localizes to the first
stage whose count differs.
"""

from __future__ import annotations

import contextlib
import time

import numpy as np
import jax


@contextlib.contextmanager
def device_trace(log_dir: str):
    """jax.profiler trace (view with tensorboard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    """Wall-clock stage timer with device synchronization at stage edges."""

    def __init__(self):
        self.times: dict[str, float] = {}

    @contextlib.contextmanager
    def stage(self, name: str, result_holder: list | None = None):
        t0 = time.perf_counter()
        yield
        if result_holder:
            jax.block_until_ready(result_holder[-1])
        self.times[name] = self.times.get(name, 0.0) + time.perf_counter() - t0

    def report(self) -> str:
        total = sum(self.times.values())
        lines = [f"{k:>12s}: {v * 1e3:8.2f} ms ({v / total:5.1%})"
                 for k, v in self.times.items()]
        lines.append(f"{'total':>12s}: {total * 1e3:8.2f} ms")
        return "\n".join(lines)


def extraction_metrics(res, image_hw=None, cfg=None) -> dict:
    """Structured per-batch metrics from an extract_batch result pytree:
    keypoints/frame, per-octave stage counts, refinement-rejection totals,
    and capacity-overflow flags when (image_hw, cfg) are given (n_candidates
    is the TRUE discrete-extrema count; exceeding the octave's static buffer
    means the survivor set was truncated)."""
    valid = np.asarray(res["valid"])
    n_cand = np.asarray(res["n_candidates"])
    n_surv = np.asarray(res["n_survivors"])
    n_emit = np.asarray(res["n_emitted"])
    out = {
        "frames": int(valid.shape[0]),
        "keypoints_per_frame": valid.sum(axis=1).tolist(),
        "candidates_per_octave": n_cand.tolist(),
        "survivors_per_octave": n_surv.tolist(),
        "emitted_per_octave": n_emit.tolist(),
        "rejected_refine": (n_cand - n_surv).sum(axis=-1).tolist(),
    }
    if image_hw is not None and cfg is not None:
        from ..models.extractor import _octave_capacities

        h = image_hw[0] * cfg.inv_delta_min
        w = image_hw[1] * cfg.inv_delta_min
        overflow = []
        for o in range(n_cand.shape[-1]):
            k, k2, m = _octave_capacities(h, w, cfg)
            overflow.append(bool((n_cand[..., o] > k).any()
                                 or (n_surv[..., o] > k2).any()
                                 or (n_emit[..., o] > m).any()))
            h, w = h // 2, w // 2
        out["capacity_overflow_per_octave"] = overflow
    return out
