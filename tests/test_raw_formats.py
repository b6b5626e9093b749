"""Raw-format ingest (SRTM .hgt, ESRI .flt), ellipsoid selection from
geokeys, and projected-CRS round-trip — the reference reads these through
rasterio/GDAL (utils.py:43-51, 127-174)."""
import os

import numpy as np
import pytest

from pydem_tpu.geometry import ELLIPSOIDS, pixel_scales
from pydem_tpu.io import (read_geotiff, read_raster, read_raster_kwargs,
                          write_geotiff)


def _write_hgt(path, n=121, lat=40, lon=-105):
    rng = np.random.RandomState(0)
    data = (rng.rand(n, n) * 1000).astype(">i2")
    data[0, 0] = -32768  # SRTM void
    fn = os.path.join(path, "N%02dW%03d.hgt" % (lat, -lon))
    data.tofile(fn)
    return fn, data.astype("=i2")


def test_read_hgt(tmp_path):
    fn, data = _write_hgt(str(tmp_path))
    g = read_raster(fn)
    np.testing.assert_array_equal(g.data, data)
    assert g.nodata == -32768
    assert not g.projected
    step = 1.0 / 120
    a, b, c, d, e, f = g.transform
    assert a == pytest.approx(step) and e == pytest.approx(-step)
    # NW corner half a pixel out from the (lat+1, lon) post
    assert c == pytest.approx(-105 - step / 2)
    assert f == pytest.approx(41 + step / 2)
    # header-only discovery
    gh = read_raster(fn, header_only=True)
    assert gh.data is None and gh.shape == (121, 121)
    # constructor kwargs: voids become NaN, per-row geodesic scales present
    kw = read_raster_kwargs(fn)
    assert np.isnan(kw["elev"][0, 0])
    assert kw["dX"].shape == (120,)
    assert 700 < kw["dX"][0] < 800  # ~0.7 km per 1/120 deg at 40N


def test_read_flt(tmp_path):
    data = np.arange(12, dtype="<f4").reshape(3, 4)
    fn = str(tmp_path / "grid.flt")
    data.tofile(fn)
    with open(str(tmp_path / "grid.hdr"), "w") as f:
        f.write("ncols 4\nnrows 3\nxllcorner 500000\nyllcorner 4400000\n"
                "cellsize 30\nNODATA_value -9999\nbyteorder LSBFIRST\n")
    g = read_raster(fn)
    np.testing.assert_array_equal(g.data, data)
    assert g.projected  # UTM-magnitude coordinates
    a, b, c, d, e, f = g.transform
    assert (a, e) == (30.0, -30.0)
    assert c == 500000 and f == 4400000 + 3 * 30
    # projected -> constant pixel scales
    dX, dY, dX2, dY2 = g.pixel_scales()
    assert np.allclose(dX, 30.0) and np.allclose(dY2, 30.0)


def test_manager_discovers_hgt(tmp_path):
    from pydem_tpu.manager import ProcessManager

    _write_hgt(str(tmp_path))
    pm = ProcessManager(in_path=str(tmp_path))
    assert len(pm.elev_source_files) == 1
    assert pm.compute_grid() == (121, 121)


def test_ellipsoid_from_geokeys(tmp_path):
    """A GRS-80 raster (NAD83, EPSG:4269) must produce GRS-80 distances,
    not silently WGS-84 (utils.py:139-151 semantics)."""
    fn = str(tmp_path / "nad83.tif")
    data = np.zeros((40, 40), "float32")
    transform = (0.01, 0.0, -105.0, 0.0, -0.01, 41.0)
    write_geotiff(fn, data, transform, crs_code=4269)
    g = read_geotiff(fn)
    assert g.ellipsoid == "GRS-80"
    got = g.pixel_scales()
    exp = pixel_scales(transform, 40, ellipsoid="GRS-80")
    for a, b in zip(got, exp):
        np.testing.assert_array_equal(a, b)
    # GRS-80 differs from WGS-84 (tiny but nonzero)
    wgs = pixel_scales(transform, 40, ellipsoid="WGS-84")
    assert ELLIPSOIDS["GRS-80"] != ELLIPSOIDS["WGS-84"]
    assert not all(np.array_equal(a, b) for a, b in zip(got, wgs))


def test_projected_roundtrip(tmp_path):
    """A projected input re-exports as projected with its CRS code —
    the reference preserves CRS via rasterio profiles (utils.py:61-79)."""
    fn = str(tmp_path / "utm.tif")
    data = np.random.RandomState(1).rand(16, 16).astype("float32")
    transform = (30.0, 0.0, 500000.0, 0.0, -30.0, 4400000.0)
    write_geotiff(fn, data, transform, crs_code=32613, projected=True)
    g = read_geotiff(fn)
    assert g.projected and g.crs_code == 32613
    np.testing.assert_array_equal(g.data, data)
    dX, _dY, _dX2, _dY2 = g.pixel_scales()
    assert np.allclose(dX, 30.0)

    # manager carries the CRS through export
    from pydem_tpu.manager import ProcessManager

    pm = ProcessManager(in_path=str(tmp_path))
    pm.compute_grid()
    assert pm._projected and pm._crs_code == 32613
