"""ctypes bindings to the native IO library (``native/src/svtpu_io.cpp``).

First-party replacement for the decord/PyAV native tier the reference
depends on (SURVEY.md §2.9): a libav video reader and a multi-threaded
libjpeg batch decoder that fills contiguous uint8 NHWC buffers — the
host-side producer for device batches.

The library is built by ``make -C native`` (plain g++, links system libav +
libjpeg). If the .so is missing, these APIs raise with build instructions;
the cv2/PIL fallbacks elsewhere keep everything functional without it.
"""
from __future__ import annotations

import ctypes
import os
from pathlib import Path
from typing import Iterator, Optional, Sequence

import numpy as np

_LIB_PATHS = [
    Path(__file__).resolve().parents[2] / "native" / "libsvtpu_io.so",
    Path(__file__).resolve().parent / "libsvtpu_io.so",
]

_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    for p in _LIB_PATHS:
        if p.exists():
            lib = ctypes.CDLL(str(p))
            lib.svtpu_vr_open.restype = ctypes.c_void_p
            lib.svtpu_vr_open.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_double)]
            lib.svtpu_vr_next.restype = ctypes.c_int
            lib.svtpu_vr_next.argtypes = [ctypes.c_void_p,
                                          ctypes.POINTER(ctypes.c_uint8)]
            lib.svtpu_vr_read_batch.restype = ctypes.c_int
            lib.svtpu_vr_read_batch.argtypes = [
                ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int]
            lib.svtpu_vr_close.argtypes = [ctypes.c_void_p]
            lib.svtpu_jpeg_decode_batch.restype = ctypes.c_int
            lib.svtpu_jpeg_decode_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
                ctypes.c_int]
            _lib = lib
            return lib
    raise FileNotFoundError(
        "libsvtpu_io.so not found — build it with `make -C native` "
        f"(searched {[str(p) for p in _LIB_PATHS]})")


def available() -> bool:
    try:
        _load()
        return True
    except (FileNotFoundError, OSError):
        return False


class VideoReader:
    """Sequential RGB24 frame reader over the native libav decoder."""

    def __init__(self, path: str):
        lib = _load()
        w = ctypes.c_int()
        h = ctypes.c_int()
        n = ctypes.c_int()
        fps = ctypes.c_double()
        self._h = lib.svtpu_vr_open(path.encode(), ctypes.byref(w),
                                    ctypes.byref(h), ctypes.byref(n),
                                    ctypes.byref(fps))
        if not self._h:
            raise IOError(f"native reader cannot open {path}")
        self._lib = lib
        self.width, self.height = w.value, h.value
        self.num_frames = n.value
        self.fps = fps.value

    def __iter__(self) -> Iterator[np.ndarray]:
        buf = np.empty((self.height, self.width, 3), np.uint8)
        ptr = buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
        while True:
            r = self._lib.svtpu_vr_next(self._h, ptr)
            if r == 0:
                return
            if r < 0:
                raise IOError(f"native decode error {r}")
            yield buf.copy()

    def read_batch(self, max_frames: int,
                   out: Optional[np.ndarray] = None) -> np.ndarray:
        """Read up to ``max_frames`` frames in one FFI call →
        ``[n, H, W, 3]`` (n may be short at EOF)."""
        if out is None:
            out = np.empty((max_frames, self.height, self.width, 3),
                           np.uint8)
        n = self._lib.svtpu_vr_read_batch(
            self._h, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            max_frames)
        if n < 0:
            raise IOError(f"native decode error {n}")
        return out[:n]

    def close(self):
        if self._h:
            self._lib.svtpu_vr_close(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def decode_jpeg_batch(paths: Sequence[str | Path], resolution,
                      out: Optional[np.ndarray] = None,
                      threads: int = 0) -> np.ndarray:
    """Decode JPEGs into ``[N, H, W, 3]`` uint8 with a C++ thread pool.

    ``resolution``: target (H, W); DCT-domain prescale + bilinear resize
    happen inside the library.
    """
    lib = _load()
    h, w = resolution
    n = len(paths)
    if out is None:
        out = np.empty((n, h, w, 3), np.uint8)
    assert out.shape == (n, h, w, 3) and out.dtype == np.uint8
    arr = (ctypes.c_char_p * n)(*[str(p).encode() for p in paths])
    ok = lib.svtpu_jpeg_decode_batch(
        arr, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        h, w, threads)
    if ok != n:
        raise IOError(f"decoded {ok}/{n} JPEGs")
    return out
