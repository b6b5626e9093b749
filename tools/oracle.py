"""Test oracle: run the *reference* pyDEM implementation from
/root/reference against in-memory arrays.

Used only by tests/golden generation — nothing here ships in the framework.
The reference's third-party deps (traittypes, rasterio, zarr, geopy) are not
installed in this environment and its prebuilt Cython kernel targets Python 2,
so this module:

- installs minimal import stubs for the missing packages (the code paths we
  exercise never call into them for array-based processing), and
- provides a pure-python implementation of the two Cython kernel entry points
  (``drain_area`` / ``drain_connections``) with the exact semantics of
  ``/root/reference/pydem/cyfuncs/cyutils.pyx:35-226``, registered as the
  ``pydem.cyfuncs.cyutils`` module so the reference's own UCA driver runs
  unmodified.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import types

import numpy as np

_REFERENCE_PATH = "/root/reference"
_installed = False
_HERE = os.path.dirname(os.path.abspath(__file__))
_native = None


def _load_native():
    """Compile/load the C++ oracle kernel (reference-speed wavefront)."""
    global _native
    if _native is not None:
        return _native or None
    so = os.path.join(_HERE, "ref_kernel.so")
    src = os.path.join(_HERE, "ref_kernel.cpp")
    try:
        if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
            subprocess.check_call(
                ["g++", "-O3", "-shared", "-fPIC", "-o", so, src])
        lib = ctypes.CDLL(so)
        lib.drain_area.restype = None
        lib.drain_connections.restype = None
        _native = lib
    except Exception:
        _native = False
        return None
    return _native


def _install_stubs():
    global _installed
    if _installed:
        return
    import traitlets as tl

    tt = types.ModuleType("traittypes")

    class Array(tl.TraitType):
        def __init__(self, default_value=None, allow_none=False, **kw):
            super().__init__(**kw)
            if default_value is not None:
                default_value = np.asarray(default_value)
            self.default_value = default_value
            self.allow_none = allow_none

        def validate(self, obj, value):
            if value is None:
                return value
            return np.asarray(value) if not isinstance(value, np.ndarray) else value

    tt.Array = Array
    sys.modules.setdefault("traittypes", tt)

    for name in ("rasterio", "zarr"):
        sys.modules.setdefault(name, types.ModuleType(name))

    geopy = types.ModuleType("geopy")
    gdist = types.ModuleType("geopy.distance")

    class _Distance:
        def __init__(self, *a, **kw):
            from pydem_tpu.geometry import ELLIPSOIDS

            name = kw.get("ellipsoid", "WGS-84")
            self._ellipsoid = name if name in ELLIPSOIDS else "WGS-84"

        def measure(self, p1, p2):
            from pydem_tpu.geometry import vincenty_inverse

            return float(
                vincenty_inverse(p1[0], p1[1], p2[0], p2[1], self._ellipsoid)
            ) / 1000.0  # geopy returns km

    gdist.distance = _Distance
    gdist.geodesic = _Distance
    geopy.distance = gdist
    sys.modules.setdefault("geopy", geopy)
    sys.modules.setdefault("geopy.distance", gdist)

    # pure-python cyutils with the .pyx semantics
    cyutils = types.ModuleType("pydem.cyfuncs.cyutils")
    cyutils.drain_area = drain_area
    cyutils.drain_connections = drain_connections
    cyfuncs = types.ModuleType("pydem.cyfuncs")
    cyfuncs.cyutils = cyutils
    sys.modules["pydem.cyfuncs"] = cyfuncs
    sys.modules["pydem.cyfuncs.cyutils"] = cyutils

    if _REFERENCE_PATH not in sys.path:
        sys.path.insert(0, _REFERENCE_PATH)
    _installed = True


def _on_edge(idx, n_rows, n_cols):
    return (
        idx < n_cols
        or idx >= n_cols * n_rows - n_cols
        or idx % n_cols == 0
        or idx % n_cols == n_cols - 1
    )


def drain_area(area, done, ids, col_indptr, col_indices, col_data,
               row_indptr, row_indices, n_rows, n_cols,
               edge_todo=None, edge_todo_no_mask=None, skip_edge=0):
    """cyutils.pyx:78-187 semantics (wavefront area propagation); C++ fast
    path with a pure-python fallback."""
    lib = _load_native()
    if lib is not None:
        done_u8 = np.ascontiguousarray(done, np.uint8)
        ids_u8 = np.ascontiguousarray(ids, np.uint8)
        scratch = np.zeros_like(ids_u8)
        area = np.ascontiguousarray(area, np.float64)
        et = edge_todo
        etnm = edge_todo_no_mask
        c_d = ctypes.POINTER(ctypes.c_double)
        c_b = ctypes.POINTER(ctypes.c_uint8)
        c_i = ctypes.POINTER(ctypes.c_int32)
        dummy = np.zeros(1, np.float64)
        lib.drain_area(
            area.ctypes.data_as(c_d),
            done_u8.ctypes.data_as(c_b),
            ids_u8.ctypes.data_as(c_b),
            scratch.ctypes.data_as(c_b),
            np.ascontiguousarray(col_indptr, np.int32).ctypes.data_as(c_i),
            np.ascontiguousarray(col_indices, np.int32).ctypes.data_as(c_i),
            np.ascontiguousarray(col_data, np.float64).ctypes.data_as(c_d),
            np.ascontiguousarray(row_indptr, np.int32).ctypes.data_as(c_i),
            np.ascontiguousarray(row_indices, np.int32).ctypes.data_as(c_i),
            ctypes.c_int64(n_rows), ctypes.c_int64(n_cols),
            ctypes.c_int64(ids_u8.size),
            (et if et is not None else dummy).ctypes.data_as(c_d),
            ctypes.c_int(et is not None),
            (etnm if etnm is not None else dummy).ctypes.data_as(c_d),
            ctypes.c_int(etnm is not None),
            ctypes.c_int(int(bool(skip_edge))))
        return area, done_u8.astype(bool), et, etnm
    done = done.astype(bool)
    ids = ids.astype(bool)
    do_et = edge_todo is not None
    do_etnm = edge_todo_no_mask is not None
    while True:
        done[ids] = True
        ids_old = ids
        ids = np.zeros_like(ids_old)
        for i in np.nonzero(ids_old)[0]:
            for p in range(col_indptr[i], col_indptr[i + 1]):
                j = col_indices[p]
                w = col_data[p]
                if (skip_edge or done[j]) and _on_edge(j, n_rows, n_cols):
                    continue
                area[j] += area[i] * w
                if do_et:
                    edge_todo[j] += edge_todo[i] * w
                if do_etnm:
                    edge_todo_no_mask[j] += edge_todo_no_mask[i] * w
                if done[row_indices[row_indptr[j]: row_indptr[j + 1]]].all():
                    ids[j] = True
                if do_et:
                    done[i] = True
        if np.array_equal(ids, ids_old):
            break
    return area, done, edge_todo, edge_todo_no_mask


def drain_connections(arr, ids, indptr, indices, set_to=0):
    """Pure-python port of cyutils.pyx:35-72 (boolean reachability flood)."""
    arr = arr.astype(bool) if set_to in (True, 1) else arr.astype(bool)
    ids = ids.astype(bool)
    set_to = bool(set_to)
    while True:
        ids_old = ids
        ids = np.zeros_like(ids_old)
        for i in np.nonzero(ids_old)[0]:
            for p in range(indptr[i], indptr[i + 1]):
                j = indices[p]
                ids[j] |= arr[j] != set_to
                arr[j] = set_to
        if np.array_equal(ids, ids_old):
            break
    return arr


def reference_processor(elev, dX=None, dY=None, **kwargs):
    """Construct a reference DEMProcessor on an in-memory array."""
    _install_stubs()
    from pydem.dem_processing import DEMProcessor as RefDP

    kw = dict(elev=np.asarray(elev))
    if dX is not None:
        kw["dX"] = dX
    if dY is not None:
        kw["dY"] = dY
    kw.update(kwargs)
    return RefDP(**kw)
