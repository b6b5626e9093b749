"""Run the *reference* ProcessManager end-to-end as a test oracle.

Extends ``tools/oracle.py``'s import stubs with FUNCTIONAL zarr and rasterio
replacements — enough surface for the reference's multi-tile pipeline
(``/root/reference/pydem/process_manager.py:393-1318``) to run serially
(n_workers=1) against a directory of GeoTIFF tiles written by
``pydem_tpu.fixtures.mk_test_multifile``:

- ``zarr.open`` → ``.npy``-memmap-backed arrays (array at path P lives in
  ``P/__arr__.npy``; a path without one behaves as a group);
- ``rasterio.open`` → a read-only dataset over ``pydem_tpu.io.read_geotiff``
  with the ``bounds/transform/shape/read/crs`` attributes compute_grid and
  ``dem_processor_from_raster_kwargs`` touch (utils.py:46-51, 127-174).

Test-only; nothing here ships in the framework.
"""
from __future__ import annotations

import os
import sys

import numpy as np

import oracle


class _Affine(tuple):
    """rasterio/affine-compatible 6-coefficient transform
    (x = a·col + b·row + c; y = d·col + e·row + f).  A tuple subclass like
    the real ``affine.Affine`` — the reference's ``transform`` traitlets
    List accepts it by sequence coercion."""

    def __new__(cls, a, b, c, d, e, f):
        return super().__new__(cls, (a, b, c, d, e, f))

    a = property(lambda s: s[0])
    b = property(lambda s: s[1])
    c = property(lambda s: s[2])
    d = property(lambda s: s[3])
    e = property(lambda s: s[4])
    f = property(lambda s: s[5])

    @classmethod
    def translation(cls, x, y):
        return cls(1.0, 0.0, x, 0.0, 1.0, y)

    @classmethod
    def scale(cls, sx, sy):
        return cls(sx, 0.0, 0.0, 0.0, sy, 0.0)

    def __mul__(self, o):
        return _Affine(
            self.a * o.a + self.b * o.d, self.a * o.b + self.b * o.e,
            self.a * o.c + self.b * o.f + self.c,
            self.d * o.a + self.e * o.d, self.d * o.b + self.e * o.e,
            self.d * o.c + self.e * o.f + self.f)


_WGS84_WKT = ('GEOGCS["WGS 84",DATUM["WGS_1984",SPHEROID["WGS 84",'
              '6378137,298.257223563]],PRIMEM["Greenwich",0],'
              'UNIT["degree",0.0174532925199433]]')


class _CRS:
    is_projected = False

    def to_wkt(self):
        return _WGS84_WKT


class _Dataset:
    def __init__(self, fn):
        from pydem_tpu.io import read_geotiff

        self._g = read_geotiff(fn)
        self.crs = _CRS()

    @property
    def bounds(self):
        return self._g.bounds

    @property
    def transform(self):
        return _Affine(*self._g.transform)

    @property
    def shape(self):
        return self._g.shape

    def read(self, band=1, masked=False):
        data = self._g.data
        if masked:
            nd = self._g.nodata
            mask = np.zeros(data.shape, bool) if nd is None else (data == nd)
            return np.ma.masked_array(data, mask)
        return data


_ARR = "__arr__.npy"


class _ZArray:
    def __init__(self, path):
        self._path = path
        self._mm = np.lib.format.open_memmap(os.path.join(path, _ARR),
                                             mode="r+")

    @property
    def shape(self):
        return self._mm.shape

    @property
    def dtype(self):
        return self._mm.dtype

    def __getitem__(self, k):
        return np.array(self._mm[k])

    def __setitem__(self, k, v):
        self._mm[k] = v
        self._mm.flush()


class _ZGroup:
    def __init__(self, path):
        self._path = path

    def __getitem__(self, key):
        return _z_open(os.path.join(self._path, key), "a")

    def __contains__(self, key):
        return os.path.exists(os.path.join(self._path, key, _ARR))


def _z_open(path, mode="a", shape=None, chunks=None, dtype=None, **kw):
    path = str(path)
    arr = os.path.join(path, _ARR)
    if shape is not None and not os.path.exists(arr):
        os.makedirs(path, exist_ok=True)
        np.lib.format.open_memmap(arr, mode="w+",
                                  dtype=np.dtype(dtype or "float64"),
                                  shape=tuple(int(s) for s in shape))
    if os.path.exists(arr):
        return _ZArray(path)
    return _ZGroup(path)


def install():
    """Populate the bare rasterio/zarr stub modules with the functional
    surface above.  Idempotent."""
    oracle._install_stubs()
    rio = sys.modules["rasterio"]
    rio.open = lambda fn, mode="r", **kw: _Dataset(fn)
    tr = getattr(rio, "transform", None)
    if tr is None:
        import types

        tr = types.ModuleType("rasterio.transform")
        rio.transform = tr
        sys.modules["rasterio.transform"] = tr
    tr.Affine = _Affine
    z = sys.modules["zarr"]
    z.open = _z_open


def reference_manager(tile_dir, out_path, n_workers=1, debug=True, **kw):
    """Construct the reference ProcessManager over ``tile_dir`` with the
    functional stubs installed.  ``debug=True`` sets the reference's DEBUG
    flag (forces dX=dY=1 in workers — its own multi-tile test discipline,
    test_end_to_end.py:55-63) so tiling is the only variable."""
    install()
    from pydem import process_manager as ref_pm

    ref_pm.DEBUG = debug
    pm = ref_pm.ProcessManager(in_path=str(tile_dir), out_path=str(out_path),
                               n_workers=n_workers, **kw)
    return pm
