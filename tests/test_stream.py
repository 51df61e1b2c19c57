"""Streaming pipelined executor: overlap semantics must not change results.

The stream keeps `depth` batches in flight (decode / H2D / compute /
readback overlapped); outputs must equal direct extract_batch calls
byte-for-byte, including the zero-padded ragged tail batch.
"""

import numpy as np
import pytest

from sift_features_tpu.config import DEFAULT_CONFIG
from sift_features_tpu.models.extractor import extract_batch
from sift_features_tpu.parallel.stream import stream_extract


def _frames(n, h=96, w=128, seed=0):
    rng = np.random.RandomState(seed)
    base = (rng.rand(h, w) * 255).astype(np.uint8)
    return np.stack([np.roll(base, 3 * i, axis=1) for i in range(n)])


# The three full-pipeline stream tests each compile the whole extractor in
# XLA:CPU interpret mode (~3 min apiece cold) — they carry the mid tier;
# the smoke tier keeps the cheap producer-contract case below.
@pytest.mark.mid
def test_stream_matches_direct():
    frames = _frames(5)
    batches = [frames[0:2], frames[2:4], frames[4:5]]  # ragged tail

    streamed = list(stream_extract(iter(batches), DEFAULT_CONFIG,
                                   depth=2, compact=False))
    assert len(streamed) == 3
    for got, batch in zip(streamed, batches):
        want = extract_batch(batch, DEFAULT_CONFIG)
        assert got["valid"].shape[0] == batch.shape[0]
        wv = np.asarray(want["valid"])
        np.testing.assert_array_equal(got["valid"], wv)
        # valid lanes are the contract; invalid lanes hold unspecified
        # (masked-out) values that legitimately differ between the padded
        # tail-batch program and a direct B=1 program
        np.testing.assert_array_equal(got["kps"][wv],
                                      np.asarray(want["kps"])[wv])
        np.testing.assert_array_equal(got["desc"][wv],
                                      np.asarray(want["desc"])[wv])


@pytest.mark.mid
def test_stream_compact_and_buffer_reuse():
    """compact=True yields per-frame (kps, desc); a producer that reuses
    its buffer (like the native BatchLoader) must not corrupt in-flight
    batches."""
    frames = _frames(4, seed=1)
    buf = np.empty_like(frames[0:2])

    def producer():
        for i in range(2):
            buf[:] = frames[2 * i:2 * i + 2]
            yield buf  # same object every time

    got = [r for batch in stream_extract(producer(), DEFAULT_CONFIG,
                                         depth=2) for r in batch]
    assert len(got) == 4
    want = extract_batch(frames, DEFAULT_CONFIG)
    wk, wd, wv = (np.asarray(want["kps"]), np.asarray(want["desc"]),
                  np.asarray(want["valid"]))
    for i, (kps, desc) in enumerate(got):
        np.testing.assert_array_equal(kps, wk[i][wv[i]])
        np.testing.assert_array_equal(desc, wd[i][wv[i]])


@pytest.mark.mid
def test_stream_growth_error_cheap():
    """Producer-contract check: a growing batch must be rejected (still
    compiles the first batch's program — too slow for smoke)."""
    frames = _frames(3, seed=2)
    with pytest.raises(ValueError, match="batch grew"):
        list(stream_extract(iter([frames[0:1], frames[1:3]]),
                            DEFAULT_CONFIG))


@pytest.mark.mid
def test_stream_budget_and_growth_error():
    frames = _frames(3, seed=2)
    with pytest.raises(ValueError, match="batch grew"):
        list(stream_extract(iter([frames[0:1], frames[1:3]]),
                            DEFAULT_CONFIG))

    res = list(stream_extract(iter([frames[0:2], frames[2:3]]),
                              DEFAULT_CONFIG, features_limit=8))
    flat = [r for batch in res for r in batch]
    assert len(flat) == 3
    for kps, desc in flat:
        assert kps.shape[0] <= 8 and desc.shape == (kps.shape[0], 128)


@pytest.mark.mid
def test_stream_paths_end_to_end(reference_root, tmp_path):
    """JPEG files -> native decode pool -> streamed device features equals
    decode-then-extract, byte-for-byte."""
    pytest.importorskip("cv2")
    from sift_features_tpu.io import native_loader
    from sift_features_tpu.parallel.stream import stream_extract_paths

    try:
        native_loader._get_lib()
    except native_loader.NativeLoaderUnavailable as e:
        pytest.skip(f"native loader unavailable: {e}")

    src = f"{reference_root}/images/bird_small.jpg"
    paths = [src] * 3
    hw = (213, 320)
    got = [r for batch in stream_extract_paths(paths, batch=2, hw=hw)
           for r in batch]
    assert len(got) == 3

    img = native_loader.decode_gray(src, luma="jpeg-gray")[:hw[0], :hw[1]]
    pad = np.zeros(hw, np.uint8)
    pad[:img.shape[0], :img.shape[1]] = img
    want = extract_batch(pad[None], DEFAULT_CONFIG)
    wk = np.asarray(want["kps"])[0][np.asarray(want["valid"])[0]]
    wd = np.asarray(want["desc"])[0][np.asarray(want["valid"])[0]]
    for kps, desc in got:
        np.testing.assert_array_equal(kps, wk)
        np.testing.assert_array_equal(desc, wd)
