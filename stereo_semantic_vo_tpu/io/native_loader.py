"""ctypes bindings for the native C++ prefetching frame loader.

Builds native/libssvo_loader.so on demand (g++ + libpng/libjpeg) and exposes:

* :func:`decode_gray` — one image -> (H, W) float32 grayscale.
* :class:`NativeFrameLoader` — multithreaded in-order stereo-pair prefetcher;
  the runtime replacement for the reference's per-frame cv::imread stall
  (main.cpp:160-162).

Falls back cleanly (``available() == False``) when no compiler/libs exist —
io/kitti.py's PIL path is the portable fallback.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libssvo_loader.so")
_lib = None


def _load() -> ctypes.CDLL | None:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO_PATH):
        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR, "-s"], check=True, capture_output=True
            )
        except (subprocess.CalledProcessError, FileNotFoundError):
            return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
    except OSError:
        return None
    lib.ssvo_decode_gray.restype = ctypes.c_int
    lib.ssvo_decode_gray.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int,
        ctypes.c_int,
    ]
    lib.ssvo_loader_create.restype = ctypes.c_void_p
    lib.ssvo_loader_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
    ]
    lib.ssvo_loader_next.restype = ctypes.c_int
    lib.ssvo_loader_next.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.ssvo_loader_destroy.restype = None
    lib.ssvo_loader_destroy.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def decode_gray(path: str, H: int, W: int) -> np.ndarray:
    lib = _load()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    out = np.zeros((H, W), np.float32)
    rc = lib.ssvo_decode_gray(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), H, W
    )
    if rc != 0:
        raise IOError(f"decode failed ({rc}): {path}")
    return out


class NativeFrameLoader:
    """In-order prefetching iterator over stereo pairs."""

    def __init__(
        self,
        left_paths: list[str],
        right_paths: list[str],
        H: int,
        W: int,
        depth: int = 4,
        workers: int = 2,
    ):
        lib = _load()
        if lib is None:
            raise RuntimeError("native loader unavailable")
        self._lib = lib
        self.H, self.W = H, W
        self.n = len(left_paths)
        self._lp = (ctypes.c_char_p * self.n)(*[p.encode() for p in left_paths])
        self._rp = (ctypes.c_char_p * self.n)(*[p.encode() for p in right_paths])
        self._h = lib.ssvo_loader_create(self._lp, self._rp, self.n, depth, H, W, workers)
        if not self._h:
            raise RuntimeError("loader create failed")

    def __iter__(self):
        try:
            while True:
                left = np.empty((self.H, self.W), np.float32)
                right = np.empty((self.H, self.W), np.float32)
                rc = self._lib.ssvo_loader_next(
                    self._h,
                    left.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                    right.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                )
                if rc == -1:
                    return
                if rc != 0:
                    raise IOError(f"frame decode failed (status {rc})")
                yield left, right
        finally:
            self.close()

    def close(self):
        if self._h:
            self._lib.ssvo_loader_destroy(self._h)
            self._h = None
