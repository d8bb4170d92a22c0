"""ctypes bindings for the native (C++) acceleration builder.

The shared library is compiled lazily with g++ on first use and cached next
to the source.  Every entry point has a NumPy fallback in
``c_raytracer_tpu.accel.build`` with identical semantics, so the framework
works without a toolchain; ``available()`` reports which path is active.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "native")
_SRC = os.path.join(_DIR, "crt_native.cpp")
_LIB = os.path.join(_DIR, "libcrt_native.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        try:
            if (not os.path.exists(_LIB)
                    or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
                subprocess.run(
                    ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
                     "-o", _LIB + ".tmp", _SRC],
                    check=True, capture_output=True, timeout=120)
                os.replace(_LIB + ".tmp", _LIB)
            lib = ctypes.CDLL(_LIB)
            lib.crt_morton_sort.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_uint32),
                ctypes.POINTER(ctypes.c_uint32)]
            lib.crt_morton_sort.restype = None
            lib.crt_lbvh_ranges.argtypes = [
                ctypes.POINTER(ctypes.c_uint32), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int64)]
            lib.crt_lbvh_ranges.restype = ctypes.c_int64
            lib.crt_stl_read.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
                ctypes.c_int64]
            lib.crt_stl_read.restype = ctypes.c_int64
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def available() -> bool:
    return _load() is not None


def morton_sort(centroids: np.ndarray):
    """Native Morton argsort; returns (perm (n,), codes (n,)) or None."""
    lib = _load()
    if lib is None:
        return None
    c = np.ascontiguousarray(centroids, np.float32)
    n = c.shape[0]
    perm = np.empty(n, np.uint32)
    codes = np.empty(n, np.uint32)
    lib.crt_morton_sort(
        c.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n,
        perm.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        codes.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)))
    return perm.astype(np.int64), codes


def lbvh_ranges(sorted_codes: np.ndarray):
    """Native LBVH preorder (first,last,split) ranges, or None."""
    lib = _load()
    if lib is None:
        return None
    c = np.ascontiguousarray(sorted_codes, np.uint32)
    n = c.shape[0]
    if n <= 1:
        return np.zeros((0, 3), np.int64)
    out = np.empty((n - 1, 3), np.int64)
    cnt = lib.crt_lbvh_ranges(
        c.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    return out[:cnt]


def stl_read(path: str):
    """Native binary-STL triangle read; returns (n, 3, 3) float32 or None
    (None also for ASCII/invalid files so callers can fall back and raise
    the reference's error message)."""
    lib = _load()
    if lib is None:
        return None
    n = lib.crt_stl_read(path.encode(), None, 0)
    if n < 0:
        return None
    buf = np.empty((n, 9), np.float32)
    got = lib.crt_stl_read(
        path.encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n)
    if got != n:
        return None
    return buf.reshape(n, 3, 3)
