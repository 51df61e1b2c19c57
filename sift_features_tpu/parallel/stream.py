"""Streaming pipelined executor: decode -> H2D -> extract -> readback.

TPU-appropriate pipeline parallelism. A single TPU core executes one
instruction stream, so octave-stage pipelining *inside* a program cannot
overlap (ROADMAP round 3 — investigated, rejected); what does overlap is
the host pipeline *around* the device program:

    C++ decode pool   ──► pinned host batch t+1      (native/sift_loader.cpp
    jax.device_put    ──► H2B transfer of t+1          threads, prefetching)
    device program    ──► extract_batch on t / t+1   (async XLA dispatch)
    host readback     ──► np.asarray of batch t-1

JAX dispatch is asynchronous: enqueueing batch t+1 before fetching batch t
keeps the chip busy while the host blocks on t's readback, and the decode
threads run ahead the whole time. `depth` bounds the number of in-flight
device batches (2 is enough to hide readback; more only grows HBM use).

This is the serving-loop counterpart of the reference's per-image
`sift()` call (lib.rs:71-81): same per-frame outputs, produced by a
continuously-fed device.
"""

from __future__ import annotations

from collections import deque

import numpy as np

from ..config import DEFAULT_CONFIG, SiftConfig


def _fetch(res, n_frames: int, compact: bool):
    """Device pytree -> host results for one batch (blocks on the device).

    compact=True: per-frame (kps (n,5) f32, desc (n,128) u8) pairs, like
    models.extractor.extract; compact=False: the raw padded pytree as
    numpy arrays (cheaper when the caller batches downstream work).
    Compaction runs in the native threaded output tier when available
    (native/sift_output.cpp), numpy otherwise — identical results."""
    host = {k: np.asarray(v) for k, v in res.items()}
    for k in host:
        host[k] = host[k][:n_frames]
    if not compact:
        return host
    try:
        from ..io.native_output import NativeOutputUnavailable, compact_batch

        return compact_batch(host["kps"], host["desc"], host["valid"])
    except (NativeOutputUnavailable, OSError):
        out = []
        for i in range(n_frames):
            v = host["valid"][i]
            out.append((host["kps"][i][v], host["desc"][i][v]))
        return out


def stream_extract(batches, config: SiftConfig = DEFAULT_CONFIG,
                   features_limit: int | None = None, depth: int = 2,
                   compact: bool = True, producer_rotates: bool = False):
    """Iterate host (b, H, W) u8 batches through the device with `depth`
    batches in flight; yields per-batch host results (see _fetch).

    Every batch is padded to the first batch's frame count before dispatch
    so one compiled program serves the whole stream (a ragged tail batch
    otherwise recompiles the full pipeline); padded frames are dropped from
    the yielded results.

    producer_rotates=True declares that the producer yields ROTATING batch
    buffers (each array untouched for >= depth + 1 further batches, e.g.
    io.native_loader.BatchLoader with n_buffers >= depth + 2): the per-batch
    snapshot copy before the async device_put is then skipped. Safety: at
    loop iteration t this generator has already BLOCKED on batch
    t - depth - 1's device results, so that batch's H2D transfer is
    complete before its buffer's rotation slot comes up again.
    """
    import jax

    from ..models.extractor import extract_batch

    inflight: deque = deque()
    batch_size = None
    for frames in batches:
        frames = np.asarray(frames, np.uint8)
        n = frames.shape[0]
        if batch_size is None:
            batch_size = n
        if n < batch_size:
            frames = np.concatenate(
                [frames, np.zeros((batch_size - n,) + frames.shape[1:],
                                  np.uint8)])
        elif n > batch_size:
            raise ValueError(
                f"batch grew from {batch_size} to {n}; streams must start "
                "with the largest batch (pad upstream)")
        elif not producer_rotates:
            # non-rotating producers may reuse the batch buffer as soon as
            # we return; device_put's copy is async, so snapshot
            frames = frames.copy()
        dev = jax.device_put(frames)  # async H2D, overlaps device compute
        res = extract_batch(dev, config, features_limit)
        inflight.append((res, n))
        if len(inflight) > depth:
            res0, n0 = inflight.popleft()
            yield _fetch(res0, n0, compact)
    while inflight:
        res0, n0 = inflight.popleft()
        yield _fetch(res0, n0, compact)


def stream_extract_paths(paths, batch: int, hw: tuple[int, int],
                         config: SiftConfig = DEFAULT_CONFIG,
                         features_limit: int | None = None, depth: int = 2,
                         compact: bool = True, luma: str = "jpeg-gray",
                         n_threads: int = 4):
    """JPEG files -> streamed features, end to end: the native threaded
    decode pool feeds the device pipeline directly. Yields per-batch
    results (see stream_extract); frames are cropped/zero-padded to `hw`
    by the loader."""
    from ..io.native_loader import BatchLoader

    loader = BatchLoader(paths, batch, hw, luma, n_threads,
                         n_buffers=depth + 2)
    try:
        yield from stream_extract(iter(loader), config, features_limit,
                                  depth, compact, producer_rotates=True)
    finally:
        loader.close()
