"""Native (C++) host-side kernels, built with g++ on first use.

The reference keeps its serial graph hot loop native (Cython→C++,
``/root/reference/pydem/cyfuncs/cyutils.pyx`` + ``setup.py:37-48``).  In this
framework the device hot path is Pallas/XLA; what remains serial and
data-dependent is ingest-side conditioning — pit drain-path carving — which
is O(pits × growth area) pointer chasing.  That lives here as a small C
library called through ctypes (no pybind11 in this environment).

Build strategy: compile ``conditioning.cpp`` into the package directory (or
``~/.cache/pydem_tpu`` when the package is read-only) the first time it is
needed; load with ctypes.  Failures (no compiler, sandboxed fs) degrade
gracefully: callers fall back to the numpy implementation, which is the
semantics reference.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

_HERE = os.path.dirname(os.path.abspath(__file__))
_lib = None
_tried = False


def _so_path(src):
    """Place the binary next to the source if writable, else in the cache."""
    cand = os.path.join(_HERE, "_conditioning.so")
    if os.access(_HERE, os.W_OK):
        return cand
    cache = os.path.join(os.path.expanduser("~"), ".cache", "pydem_tpu")
    os.makedirs(cache, exist_ok=True)
    return os.path.join(cache, "_conditioning.so")


def get_lib():
    """The loaded native library, or None when unavailable."""
    global _lib, _tried
    if _tried:
        return _lib or None
    _tried = True
    src = os.path.join(_HERE, "conditioning.cpp")
    so = _so_path(src)
    try:
        if (not os.path.exists(so)
                or os.path.getmtime(so) < os.path.getmtime(src)):
            subprocess.check_call(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-o", so, src],
                stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
        lib = ctypes.CDLL(so)
        lib.drain_pit_paths.restype = ctypes.c_int64
        lib.drain_pit_paths.argtypes = [
            ctypes.POINTER(ctypes.c_double),   # e (mutated)
            ctypes.c_int64, ctypes.c_int64,    # n, m
            ctypes.POINTER(ctypes.c_double),   # dX
            ctypes.POINTER(ctypes.c_double),   # dY
            ctypes.POINTER(ctypes.c_int64),    # pits (sorted)
            ctypes.c_int64,                    # n_pits
            ctypes.c_int64,                    # max_iter
            ctypes.c_double, ctypes.c_double,  # max_dist, max_dist_XY
        ]
        _lib = lib
    except Exception:
        _lib = False
        return None
    return _lib


def drain_pit_paths_native(elev, dX, dY, pits, max_iter, max_dist,
                           max_dist_XY):
    """Run the native carving kernel in place on ``elev`` (float64, C-order).

    Returns the warn count, or None when the native library is unavailable.
    """
    import numpy as np

    lib = get_lib()
    if lib is None:
        return None
    e = np.ascontiguousarray(elev, "float64")
    if e is not elev:
        raise ValueError("elev must be a contiguous float64 array")
    dX = np.ascontiguousarray(dX, "float64")
    dY = np.ascontiguousarray(dY, "float64")
    pits = np.ascontiguousarray(pits, "int64")
    n, m = e.shape
    c_dbl = ctypes.POINTER(ctypes.c_double)
    warn = lib.drain_pit_paths(
        e.ctypes.data_as(c_dbl), n, m,
        dX.ctypes.data_as(c_dbl), dY.ctypes.data_as(c_dbl),
        pits.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), pits.size,
        int(max_iter), float(max_dist or 0), float(max_dist_XY or 0))
    return int(warn)
