"""ctypes bindings for the native host I/O runtime (native/f2fio.cpp):
fast .flo/PNG/PGM codecs and a multi-threaded frame+flow prefetch ring that
keeps the streaming pipeline's host side ahead of device compute.

Falls back gracefully: ``available()`` is False when the shared library hasn't
been built (``make -C native``); callers then use the pure-Python readers.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_LIB = None
_LIB_PATH = Path(__file__).resolve().parents[2] / "native" / "libf2fio.so"


def _load(build=True):
    global _LIB
    if _LIB is not None:
        return _LIB
    if not _LIB_PATH.exists() and build:
        try:
            subprocess.run(["make", "-C", str(_LIB_PATH.parent)], check=True,
                           capture_output=True)
        except Exception:
            return None
    if not _LIB_PATH.exists():
        return None
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.f2f_read_flo.restype = ctypes.c_int
    lib.f2f_write_flo.restype = ctypes.c_int
    lib.f2f_read_gray.restype = ctypes.c_int
    lib.f2f_prefetch_open.restype = ctypes.c_void_p
    lib.f2f_prefetch_open.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    lib.f2f_prefetch_get.restype = ctypes.c_int
    lib.f2f_prefetch_get.argtypes = [
        ctypes.c_void_p, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.f2f_prefetch_close.argtypes = [ctypes.c_void_p]
    _LIB = lib
    return lib


def available():
    return _load() is not None


def read_flo(path):
    lib = _load()
    w = ctypes.c_int()
    h = ctypes.c_int()
    buf = np.empty(64 * 1024 * 1024, np.float32)
    n = lib.f2f_read_flo(str(path).encode(), buf.ctypes.data_as(
        ctypes.POINTER(ctypes.c_float)), buf.size, ctypes.byref(w),
        ctypes.byref(h))
    if n < 0:
        raise IOError(f"f2f_read_flo failed ({n}) for {path}")
    return buf[:n].reshape(h.value, w.value, 2).copy()


def write_flo(path, flow):
    lib = _load()
    flow = np.ascontiguousarray(flow, np.float32)
    h, w = flow.shape[:2]
    rc = lib.f2f_write_flo(str(path).encode(), flow.ctypes.data_as(
        ctypes.POINTER(ctypes.c_float)), w, h)
    if rc != 0:
        raise IOError(f"f2f_write_flo failed for {path}")


def read_gray(path):
    """Grayscale float32 in [0, 255] (png/pgm)."""
    lib = _load()
    w = ctypes.c_int()
    h = ctypes.c_int()
    buf = np.empty(64 * 1024 * 1024, np.float32)
    n = lib.f2f_read_gray(str(path).encode(), buf.ctypes.data_as(
        ctypes.POINTER(ctypes.c_float)), buf.size, ctypes.byref(w),
        ctypes.byref(h))
    if n < 0:
        raise IOError(f"f2f_read_gray failed ({n}) for {path}")
    return buf[:n].reshape(h.value, w.value).copy()


class NativePrefetcher:
    """Multi-threaded decode-ahead over a frame (+optional .flo) sequence.

    Usage:
        pf = NativePrefetcher(frame_paths, flow_paths, capacity=4)
        for i in range(len(frame_paths)):
            frame, flow = pf.get(i)   # frame (H,W) f32 [0,255]; flow or None
        pf.close()
    """

    def __init__(self, frame_paths, flow_paths=None, capacity=4, nthreads=2):
        lib = _load()
        if lib is None:
            raise RuntimeError("native f2fio library unavailable")
        self._lib = lib
        self.n = len(frame_paths)
        fp = (ctypes.c_char_p * self.n)(
            *[str(p).encode() for p in frame_paths])
        if flow_paths is None:
            flow_paths = [None] * self.n
        lp = (ctypes.c_char_p * self.n)(
            *[str(p).encode() if p else None for p in flow_paths])
        self._handle = lib.f2f_prefetch_open(fp, lp, self.n, capacity, nthreads)
        if not self._handle:
            raise RuntimeError("f2f_prefetch_open failed")

    def get(self, idx):
        w = ctypes.c_int()
        h = ctypes.c_int()
        hf = ctypes.c_int()
        pix = np.empty(32 * 1024 * 1024, np.float32)
        flo = np.empty(64 * 1024 * 1024, np.float32)
        rc = self._lib.f2f_prefetch_get(
            self._handle, idx,
            pix.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), pix.size,
            flo.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), flo.size,
            ctypes.byref(w), ctypes.byref(h), ctypes.byref(hf),
        )
        if rc != 0:
            raise IOError(f"f2f_prefetch_get failed ({rc}) at frame {idx}")
        frame = pix[: w.value * h.value].reshape(h.value, w.value).copy()
        flow = None
        if hf.value:
            flow = flo[: 2 * w.value * h.value].reshape(h.value, w.value, 2).copy()
        return frame, flow

    def close(self):
        if self._handle:
            self._lib.f2f_prefetch_close(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
