"""ctypes wrapper for the native C++ ingest runtime (threaded PNG decode +
undistort; see orbslam3_tpu/native/ingest.cpp).  Falls back to the PIL
path in io/euroc.py when the shared library is unavailable."""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                           "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libingest.so")


def _ensure_built() -> str | None:
    if os.path.exists(_SO_PATH):
        return _SO_PATH
    try:
        subprocess.run(["bash", os.path.join(_NATIVE_DIR, "build.sh")],
                       check=True, capture_output=True, timeout=120)
        return _SO_PATH if os.path.exists(_SO_PATH) else None
    except Exception:
        return None


_LIB = None


def _lib():
    global _LIB
    if _LIB is None:
        path = _ensure_built()
        if path is None:
            raise RuntimeError("native ingest library unavailable")
        lib = ctypes.CDLL(path)
        lib.ingest_create.restype = ctypes.c_void_p
        lib.ingest_create.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int]
        lib.ingest_create2.restype = ctypes.c_void_p
        lib.ingest_create2.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_float, ctypes.c_int, ctypes.c_int, ctypes.c_int]
        lib.ingest_next.restype = ctypes.c_int
        lib.ingest_next.argtypes = [ctypes.c_void_p,
                                    ctypes.POINTER(ctypes.c_float),
                                    ctypes.POINTER(ctypes.c_int)]
        lib.ingest_destroy.argtypes = [ctypes.c_void_p]
        lib.ingest_failed_count.restype = ctypes.c_int
        lib.ingest_failed_count.argtypes = [ctypes.c_void_p]
        _LIB = lib
    return _LIB


def available() -> bool:
    try:
        _lib()
        return True
    except RuntimeError:
        return False


class NativeIngest:
    """Ordered, prefetching frame stream."""

    def __init__(self, paths: list[str], out_hw: tuple[int, int],
                 remap: np.ndarray | None = None,
                 src_hw: tuple[int, int] | None = None,
                 resize_hw: tuple[int, int] | None = None,
                 clahe_clip: float = 0.0, clahe_grid: int = 8,
                 n_threads: int = 4, queue_cap: int = 8):
        """Pipeline per frame: PNG decode -> bilinear `remap` (undistort /
        rectify, shape (rh, rw, 2) source coords) -> resize to `resize_hw`
        -> CLAHE (if clahe_clip > 0).  `out_hw` is the remap output size;
        the emitted frame size is resize_hw or out_hw.  Mirrors the
        reference grabber (image_grabber.hpp:96-110)."""
        lib = _lib()
        self._lib = lib
        rh, rw = out_hw
        self.h, self.w = resize_hw if resize_hw is not None else out_hw
        sh, sw = src_hw if src_hw is not None else out_hw
        arr = (ctypes.c_char_p * len(paths))(
            *[p.encode() for p in paths])
        if remap is not None:
            remap_f = np.ascontiguousarray(remap, np.float32)
            assert remap_f.shape == (rh, rw, 2)
            rptr = remap_f.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
            self._remap_keepalive = remap_f
        else:
            rptr = None
        self._h = lib.ingest_create2(
            arr, len(paths), rptr, rh, rw, self.h, self.w, sh, sw,
            float(clahe_clip), int(clahe_grid), n_threads, queue_cap)
        self.n = len(paths)
        self._emitted = 0

    def __iter__(self):
        return self

    def __next__(self) -> np.ndarray:
        if self._emitted >= self.n:
            raise StopIteration
        out = np.empty((self.h, self.w), np.float32)
        idx = ctypes.c_int(-1)
        ok = self._lib.ingest_next(
            self._h, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ctypes.byref(idx))
        if not ok:
            raise StopIteration
        self._emitted += 1
        return out

    @property
    def failed(self) -> int:
        return self._lib.ingest_failed_count(self._h)

    def close(self):
        if self._h:
            self._lib.ingest_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
