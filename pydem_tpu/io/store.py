"""Minimal zarr-v2-compatible chunked array store (directory layout).

Plays the role of the reference's zarr intermediate store
(``/root/reference/pydem/process_manager.py:362-390, 993-1059``) without the
zarr dependency: each array is a directory holding a ``.zarray`` JSON plus
row-major chunk files (``"i.j"``), raw or zlib-compressed.  Arrays written
here are readable by real zarr (v2) and vice versa for the subset we emit
(C-order, no filters, zlib or raw).
"""
from __future__ import annotations

import json
import os
import zlib

import numpy as np

_DTYPE_MAP = {
    "float64": "<f8", "float32": "<f4", "int64": "<i8", "int32": "<i4",
    "uint8": "|u1", "bool": "|b1", "int8": "|i1",
}


class ArrayStore:
    """Directory of named chunked arrays (zarr-v2 layout)."""

    def __init__(self, root):
        self.root = root
        os.makedirs(root, exist_ok=True)
        zgroup = os.path.join(root, ".zgroup")
        if not os.path.exists(zgroup):
            with open(zgroup, "w") as f:
                json.dump({"zarr_format": 2}, f)

    def _adir(self, name):
        return os.path.join(self.root, name)

    def names(self):
        return sorted(
            d for d in os.listdir(self.root)
            if os.path.isdir(self._adir(d))
            and os.path.exists(os.path.join(self._adir(d), ".zarray")))

    def __contains__(self, name):
        return os.path.exists(os.path.join(self._adir(name), ".zarray"))

    def create(self, name, shape, dtype="float64", chunks=None, fill=0,
               compress=True, overwrite=False):
        d = self._adir(name)
        meta_fn = os.path.join(d, ".zarray")
        if os.path.exists(meta_fn) and not overwrite:
            return
        os.makedirs(d, exist_ok=True)
        dtype = np.dtype(dtype)
        chunks = list(chunks or shape)
        meta = {
            "zarr_format": 2,
            "shape": list(shape),
            "chunks": chunks,
            "dtype": _DTYPE_MAP[dtype.name],
            "compressor": ({"id": "zlib", "level": 4} if compress else None),
            "fill_value": (bool(fill) if dtype.kind == "b" else
                           (None if (isinstance(fill, float) and np.isnan(fill))
                            else fill)),
            "filters": None,
            "order": "C",
        }
        with open(meta_fn, "w") as f:
            json.dump(meta, f)

    def _meta(self, name):
        with open(os.path.join(self._adir(name), ".zarray")) as f:
            return json.load(f)

    def write(self, name, data, offset=(0, 0)):
        """Write a 2-D block at ``offset`` (must align with chunk grid or be
        a full-array write)."""
        meta = self._meta(name)
        shape, chunks = meta["shape"], meta["chunks"]
        dtype = np.dtype(meta["dtype"])
        data = np.asarray(data)
        full = np.full(shape, np.nan if dtype.kind == "f" else 0, dtype)
        if tuple(offset) == (0, 0) and list(data.shape) == shape:
            full = data.astype(dtype)
        else:
            full = self.read(name)
            full[offset[0]: offset[0] + data.shape[0],
                 offset[1]: offset[1] + data.shape[1]] = data
        self._write_full(name, full, meta)

    def _write_full(self, name, data, meta):
        d = self._adir(name)
        shape, chunks = meta["shape"], meta["chunks"]
        dtype = np.dtype(meta["dtype"])
        nci = (shape[0] + chunks[0] - 1) // chunks[0]
        ncj = (shape[1] + chunks[1] - 1) // chunks[1] if len(shape) > 1 else 1
        for ci in range(nci):
            for cj in range(ncj):
                block = np.zeros(chunks, dtype)
                i0, j0 = ci * chunks[0], cj * chunks[1]
                si = min(chunks[0], shape[0] - i0)
                sj = min(chunks[1], shape[1] - j0) if len(shape) > 1 else 1
                block[:si, :sj] = data[i0: i0 + si, j0: j0 + sj]
                raw = block.astype(dtype).tobytes()
                if meta["compressor"]:
                    raw = zlib.compress(raw, meta["compressor"].get("level", 4))
                with open(os.path.join(d, "%d.%d" % (ci, cj)), "wb") as f:
                    f.write(raw)

    def read(self, name):
        meta = self._meta(name)
        shape, chunks = meta["shape"], meta["chunks"]
        dtype = np.dtype(meta["dtype"])
        fill = meta.get("fill_value")
        if fill is None and dtype.kind == "f":
            fill = np.nan
        out = np.full(shape, fill if fill is not None else 0, dtype)
        d = self._adir(name)
        nci = (shape[0] + chunks[0] - 1) // chunks[0]
        ncj = (shape[1] + chunks[1] - 1) // chunks[1] if len(shape) > 1 else 1
        for ci in range(nci):
            for cj in range(ncj):
                fn = os.path.join(d, "%d.%d" % (ci, cj))
                if not os.path.exists(fn):
                    continue
                with open(fn, "rb") as f:
                    raw = f.read()
                if meta["compressor"]:
                    raw = zlib.decompress(raw)
                block = np.frombuffer(raw, dtype).reshape(chunks)
                i0, j0 = ci * chunks[0], cj * chunks[1]
                si = min(chunks[0], shape[0] - i0)
                sj = min(chunks[1], shape[1] - j0)
                out[i0: i0 + si, j0: j0 + sj] = block[:si, :sj]
        return out.astype(dtype.newbyteorder("="))

    def __getitem__(self, name):
        return self.read(name)

    def __setitem__(self, name, data):
        data = np.asarray(data)
        self.create(name, data.shape, data.dtype, overwrite=True)
        self.write(name, data)
