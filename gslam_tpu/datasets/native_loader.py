"""ctypes binding for the native C++ decode/prefetch library.

The reference's data path is native C++ (dataset plugins + OpenCV
imdecode, SURVEY 3.2 "HOT (IO/decode)"); this binds our equivalent
(native/gslam_native.cpp): self-contained PNG/PNM/BMP decoders and a
multi-threaded readahead loader that keeps decode off the Python hot
loop.  Falls back gracefully when the library isn't built — consumers
check ``available()``.  Built on demand with make (g++ + zlib, both in
the base image).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Tuple

import numpy as np

_ROOT = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_SO = os.path.join(_ROOT, "libgslam_native.so")
_lib = None
_lock = threading.Lock()


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _ROOT], check=True,
                       capture_output=True, timeout=120)
        return os.path.isfile(_SO)
    except Exception:
        return False


def _load():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.isfile(_SO) and not _build():
            return None
        lib = ctypes.CDLL(_SO)
        lib.gslam_decode_gray_f32.restype = ctypes.c_int
        lib.gslam_decode_gray_f32.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64, ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int)]
        lib.gslam_decode_rgb_u8.restype = ctypes.c_int
        lib.gslam_decode_rgb_u8.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int64, ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
        lib.gslam_loader_create.restype = ctypes.c_void_p
        lib.gslam_loader_create.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int64,
            ctypes.c_int, ctypes.c_int]
        lib.gslam_loader_next.restype = ctypes.c_int
        lib.gslam_loader_next.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64, ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int)]
        lib.gslam_loader_destroy.restype = None
        lib.gslam_loader_destroy.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def decode_gray_f32(path: str) -> Optional[np.ndarray]:
    """Decode any supported image to (H, W) float32 gray, or None."""
    lib = _load()
    if lib is None:
        return None
    w = ctypes.c_int()
    h = ctypes.c_int()
    if not lib.gslam_decode_gray_f32(path.encode(), None, 0,
                                     ctypes.byref(w), ctypes.byref(h)):
        return None
    out = np.empty((h.value, w.value), np.float32)
    ok = lib.gslam_decode_gray_f32(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.size, ctypes.byref(w), ctypes.byref(h))
    return out if ok else None


class NativeLoader:
    """Ordered readahead over a file list (gray f32 frames)."""

    def __init__(self, paths: List[str], n_threads: int = 2,
                 ring: int = 8, max_hw: Tuple[int, int] = (2048, 2048)):
        lib = _load()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        arr = (ctypes.c_char_p * len(paths))(
            *[p.encode() for p in paths])
        self._paths_keepalive = arr
        self._h = lib.gslam_loader_create(arr, len(paths), n_threads,
                                          ring)
        self._cap = max_hw[0] * max_hw[1]
        self._buf = np.empty(self._cap, np.float32)

    def next(self) -> Optional[np.ndarray]:
        """Next frame in order; None at end; raises on decode failure."""
        w = ctypes.c_int()
        h = ctypes.c_int()
        r = self._lib.gslam_loader_next(
            self._h,
            self._buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            self._cap, ctypes.byref(w), ctypes.byref(h))
        if r == -1:
            return None
        if r == 0:
            raise IOError("native decode failed")
        return self._buf[:w.value * h.value].reshape(
            h.value, w.value).copy()

    def close(self) -> None:
        if self._h:
            self._lib.gslam_loader_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
