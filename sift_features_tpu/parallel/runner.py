"""Multi-host serving runner (SURVEY.md §5.3, §5.8).

The pipeline is stateless per frame batch, so elasticity is trivial by
design: work is partitioned into frame batches; a lost host only loses its
in-flight batch, which is re-enqueued. `jax.distributed.initialize` sets up
the process group; health checking is a collective barrier with a timeout
(a hung/lost peer surfaces as a timeout error from the collective, at the
batch boundary rather than mid-kernel).

On a single-process deployment every call degrades gracefully to local
behavior, so the same driver script runs on a laptop and on a pod slice.
"""

from __future__ import annotations

import logging
import time

import numpy as np
import jax

log = logging.getLogger("sift_features_tpu.runner")


def init_distributed(coordinator: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> int:
    """Initialize the multi-host process group (no-op single-process when no
    coordinator is given). Returns this host's process index."""
    if coordinator is not None:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)
    return jax.process_index()


def barrier(tag: str = "health", timeout_s: float = 60.0) -> float:
    """Cross-host health check: a tiny psum over all devices. A dead or
    wedged host makes this raise/timeout instead of corrupting results.
    Returns the barrier latency in seconds."""
    t0 = time.perf_counter()
    x = jnp_ones()
    y = jax.pmap(lambda v: jax.lax.psum(v, "i"), axis_name="i")(x)
    np.asarray(y)  # block
    dt = time.perf_counter() - t0
    if dt > timeout_s:
        raise TimeoutError(f"barrier '{tag}' took {dt:.1f}s > {timeout_s}s")
    return dt


def jnp_ones():
    import jax.numpy as jnp

    n = jax.local_device_count()
    return jnp.ones((n,), jnp.float32)


class BatchRunner:
    """At-least-once frame-batch executor with re-enqueue on failure.

    `step_fn(batch) -> result` is the jitted pipeline step; `batches` is any
    iterator of (batch_id, frames). Failed batches (device errors, timeouts)
    are retried up to `max_retries`, matching the 'restartable per
    frame-batch' recovery model.
    """

    def __init__(self, step_fn, max_retries: int = 2,
                 health_check_every: int = 0):
        self.step_fn = step_fn
        self.max_retries = max_retries
        self.health_check_every = health_check_every
        self.completed = 0
        self.retried = 0

    def run(self, batches):
        pending = list(batches)
        attempts: dict = {}
        while pending:
            batch_id, frames = pending.pop(0)
            try:
                out = self.step_fn(frames)
                jax.block_until_ready(out)
            except Exception as e:  # noqa: BLE001 — device loss is generic
                n = attempts.get(batch_id, 0) + 1
                attempts[batch_id] = n
                if n > self.max_retries:
                    raise RuntimeError(
                        f"batch {batch_id} failed {n} times") from e
                log.warning("batch %s failed (%s); re-enqueueing (%d/%d)",
                            batch_id, e, n, self.max_retries)
                self.retried += 1
                pending.append((batch_id, frames))
                continue
            self.completed += 1
            if (self.health_check_every
                    and self.completed % self.health_check_every == 0):
                barrier()
            yield batch_id, out
