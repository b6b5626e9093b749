"""Tiled/BigTIFF streaming writer: roundtrips, embedded overviews, and the
>4 GB-logical windowed export (reference process_manager.py:786-931)."""
import numpy as np
import pytest

from pydem_tpu.io.bigtiff import TiledTiffWriter
from pydem_tpu.io.geotiff import read_geotiff


def _write(fn, data, tile=16, bigtiff=False, factors=(), nodata=-9999.0,
           transform=(0.01, 0.0, -73.0, 0.0, -0.01, 46.0)):
    with TiledTiffWriter(str(fn), data.shape, data.dtype,
                         transform=transform, nodata=nodata, tile=tile,
                         bigtiff=bigtiff) as w:
        for i0 in range(0, data.shape[0], tile):
            w.write_window(np.nan_to_num(data[i0: i0 + tile], nan=nodata),
                           (i0, 0))
        if factors:
            w.build_overviews(factors,
                              lambda r, c: data[r[0]: r[1], c[0]: c[1]])
    return str(fn)


@pytest.mark.parametrize("bigtiff", [False, True])
def test_tiled_roundtrip(tmp_path, bigtiff):
    rng = np.random.RandomState(0)
    data = rng.randn(45, 70).astype("float32")  # partial edge tiles
    fn = _write(tmp_path / "t.tif", data, bigtiff=bigtiff)
    with open(fn, "rb") as f:
        magic = f.read(4)
    assert magic == (b"II+\x00" if bigtiff else b"II*\x00")
    g = read_geotiff(fn)
    np.testing.assert_array_equal(g.data, data)
    assert g.transform[0] == 0.01 and g.transform[5] == 46.0
    assert g.nodata == -9999.0
    assert g.crs_code == 4326 and not g.projected


def test_embedded_overviews(tmp_path):
    rng = np.random.RandomState(1)
    data = rng.rand(96, 96).astype("float32") + 1.0
    fn = _write(tmp_path / "o.tif", data, factors=(3, 9))
    main = read_geotiff(fn)
    np.testing.assert_array_equal(main.data, data)
    ov3 = read_geotiff(fn, ifd_index=1)
    assert ov3.shape == (32, 32)
    expect = data.reshape(32, 3, 32, 3).mean(axis=(1, 3))
    np.testing.assert_allclose(ov3.data, expect, rtol=1e-6)
    ov9 = read_geotiff(fn, ifd_index=2)
    assert ov9.shape == (10, 10)
    with pytest.raises(IndexError):
        read_geotiff(fn, ifd_index=3)


def test_overview_nodata_fill(tmp_path):
    data = np.full((48, 48), 5.0, "float32")
    data[:24] = np.nan  # masked half
    fn = _write(tmp_path / "n.tif", data, factors=(3,))
    ov = read_geotiff(fn, ifd_index=1)
    assert (ov.data[:8] == -9999.0).all()  # all-NaN blocks -> nodata
    np.testing.assert_allclose(ov.data[8:], 5.0)


def test_manager_tiled_export(tmp_path):
    from pydem_tpu import fixtures, manager

    manager.DEBUG = True
    try:
        chunks = fixtures.mk_test_multifile(33, 32, str(tmp_path),
                                            nx_grid=2, ny_grid=2,
                                            nx_overlap=2, ny_overlap=2)
        pm = manager.ProcessManager(in_path=chunks)
        pm.process_twi()
        fn = pm.save_geotiff_tiled("uca", str(tmp_path / "uca.tif"),
                                   overview_factors=(3,), tile=16)
    finally:
        manager.DEBUG = False
    g = read_geotiff(fn)
    ref = pm.out_file["uca"].astype("float32")
    got = np.where(g.data == -9999.0, np.nan, g.data)
    assert (np.isnan(got) == np.isnan(ref)).all()
    np.testing.assert_allclose(np.nan_to_num(got), np.nan_to_num(ref))
    assert read_geotiff(fn, ifd_index=1).shape == (10, 10)


def test_big_logical_export_streams(tmp_path):
    """A >4 GB-logical raster (32768² float32) exports windowed: auto
    selects BigTIFF, memory stays O(band), offsets land past 4 GiB."""
    n = 32768
    tile = 256
    with TiledTiffWriter(str(tmp_path / "big.tif"), (n, n), "float32",
                         transform=(0.001, 0, 0, 0, -0.001, 10.0),
                         nodata=-9999.0, tile=tile, bigtiff="auto",
                         compress=False) as w:
        assert w.big  # auto picked BigTIFF for the 4.3 GB payload
        band = np.zeros((tile, n), "float32")
        for i0 in range(0, n, tile):
            band[:] = i0
            w.write_window(band, (i0, 0))
        # tile payload alone nearly saturates u32; the IFD (written after
        # it) must land beyond the classic-TIFF horizon
        assert int(w._levels[0]["offs"][-1]) + tile * tile * 4 > 2 ** 32
    g = read_geotiff(str(tmp_path / "big.tif"), header_only=True)
    assert g.shape == (n, n)
    import os

    assert os.path.getsize(tmp_path / "big.tif") > 2 ** 32
