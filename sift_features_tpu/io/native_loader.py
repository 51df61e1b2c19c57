"""ctypes binding for the native (C++) data loader.

The reference's decode tier is native Rust (`image` crate); ours is
native/sift_loader.cpp: libjpeg decode, three grayscale semantics, and a
multi-threaded prefetching batch pool producing fixed-shape (B, H, W) u8
batches for the device feed. Auto-builds the .so on first use (g++ +
system libjpeg); falls back to the cv2 decoder if the toolchain or libjpeg
is unavailable.

Luma modes:
  "jpeg-gray" — libjpeg JCS_GRAYSCALE (cv2.imread(IMREAD_GRAYSCALE) path)
  "bt601"     — OpenCV cvtColor fixed-point RGB->GRAY
  "bt709"     — Rust image 0.25 grayscale() (truncating integer BT.709)
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_LUMA = {"jpeg-gray": 0, "bt601": 1, "bt709": 2}

_lib = None
_lib_lock = threading.Lock()

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")


class NativeLoaderUnavailable(RuntimeError):
    pass


def _build_lib(native_dir: str) -> str:
    so = os.path.join(native_dir, "build", "libsift_loader.so")
    src = os.path.join(native_dir, "sift_loader.cpp")
    if os.path.exists(so) and os.path.getmtime(so) >= os.path.getmtime(src):
        return so
    os.makedirs(os.path.dirname(so), exist_ok=True)
    cmd = ["g++", "-O2", "-fPIC", "-std=c++17", "-shared", "-o", so, src,
           "-ljpeg", "-lpthread"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
    except (OSError, subprocess.CalledProcessError) as e:
        detail = getattr(e, "stderr", str(e))
        raise NativeLoaderUnavailable(f"build failed: {detail}") from e
    return so


def _get_lib():
    global _lib
    with _lib_lock:
        if _lib is None:
            so = _build_lib(os.path.abspath(_NATIVE_DIR))
            lib = ctypes.CDLL(so)
            lib.sl_decode_gray.restype = ctypes.c_int
            lib.sl_decode_gray.argtypes = [
                ctypes.c_char_p, ctypes.c_void_p,
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
                ctypes.c_int, ctypes.c_int, ctypes.c_int]
            lib.sl_pool_create.restype = ctypes.c_void_p
            lib.sl_pool_create.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int]
            lib.sl_pool_next.restype = ctypes.c_int
            lib.sl_pool_next.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                         ctypes.c_void_p]
            lib.sl_pool_destroy.argtypes = [ctypes.c_void_p]
            _lib = lib
        return _lib


_DCT = {"islow": 0, "ifast": 1, "float": 2}


def decode_gray(path: str, max_hw: tuple[int, int] = (8192, 8192),
                luma: str = "jpeg-gray", dct: str = "islow",
                fancy_upsampling: bool = True) -> np.ndarray:
    """Decode a JPEG to (h, w) u8 grayscale with the native decoder.

    dct / fancy_upsampling select libjpeg decode variants (sift_loader.cpp
    option bits); tools/decoder_sweep.py measures their golden-correspondence
    impact. dct="float" + fancy is the pinned golden-test variant."""
    lib = _get_lib()
    mh, mw = max_hw
    buf = np.zeros((mh, mw), np.uint8)
    h = ctypes.c_int()
    w = ctypes.c_int()
    opts = (_DCT[dct] | (0 if fancy_upsampling else 4)) << 8
    rc = lib.sl_decode_gray(path.encode(), buf.ctypes.data_as(ctypes.c_void_p),
                            ctypes.byref(h), ctypes.byref(w), mh, mw,
                            _LUMA[luma] | opts)
    if rc != 0:
        raise IOError(f"decode failed ({rc}): {path}")
    return buf[:h.value, :w.value].copy()


class BatchLoader:
    """Threaded prefetching loader: iterates fixed-shape (B, H, W) u8
    batches (frames cropped / zero-padded to (H, W)). Decoding of the whole
    file list starts immediately on background threads."""

    def __init__(self, paths: list[str], batch: int, hw: tuple[int, int],
                 luma: str = "jpeg-gray", n_threads: int = 4,
                 n_buffers: int = 1):
        """n_buffers > 1 ROTATES the yielded batch arrays: the array yielded
        for batch t is not rewritten until batch t + n_buffers, so an async
        consumer (jax.device_put with <= n_buffers - 2 batches in flight)
        may hand it off without a snapshot copy (parallel.stream sets
        n_buffers = depth + 2 and skips its copy)."""
        self._lib = _get_lib()
        self.paths = list(paths)
        self.batch = batch
        self.h, self.w = hw
        self.n_buffers = max(1, n_buffers)
        arr = (ctypes.c_char_p * len(self.paths))(
            *[p.encode() for p in self.paths])
        self._pool = self._lib.sl_pool_create(
            arr, len(self.paths), batch, self.h, self.w, _LUMA[luma],
            n_threads)
        if not self._pool:
            raise NativeLoaderUnavailable("pool creation failed")

    def __len__(self):
        return -(-len(self.paths) // self.batch)

    def __iter__(self):
        bufs = [np.zeros((self.batch, self.h, self.w), np.uint8)
                for _ in range(self.n_buffers)]
        for b in range(len(self)):
            out = bufs[b % self.n_buffers]
            n = self._lib.sl_pool_next(
                self._pool, b, out.ctypes.data_as(ctypes.c_void_p))
            if n == -2:
                raise RuntimeError(
                    f"batch {b} already consumed: BatchLoader frees frame "
                    "buffers after the first pass; create a new loader to "
                    "iterate again")
            if n < 0:
                raise IOError(f"decode failed in batch {b}")
            if n == 0:
                return
            yield out[:n] if n < self.batch else out

    def close(self):
        if getattr(self, "_pool", None):
            self._lib.sl_pool_destroy(self._pool)
            self._pool = None

    def __del__(self):
        self.close()
