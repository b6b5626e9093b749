"""Streaming export: the default GeoTIFF path must stay O(tile) memory —
no full-canvas materialization (VERDICT: reference path
process_manager.py:786-931 streams rasterio windows)."""
import os

import numpy as np
import pytest

from pydem_tpu.io import read_geotiff
from pydem_tpu.io.store import ArrayStore
from pydem_tpu.manager import ProcessManager


def test_export_streams_without_full_reads(tmp_path, monkeypatch):
    """An 8192²-logical store exports through windows only: any full-array
    read (ArrayStore.__getitem__) during export is a bug."""
    n = 8192
    store = ArrayStore(str(tmp_path / "results.zarr"))
    store.create("twi", (n, n), "float64", chunks=(256, 256), fill=1.25)
    # write one real chunk so the raster isn't all fill
    store.write_window("twi", np.full((256, 256), 7.5), (256, 512))

    pm = ProcessManager.__new__(ProcessManager)
    pm.out_file = store
    pm.transform = (0.001, 0.0, -105.0, 0.0, -0.001, 41.0)
    pm._projected = False

    def _no_full_read(self, key):
        raise AssertionError("full-canvas read of %r during export" % key)

    monkeypatch.setattr(ArrayStore, "__getitem__", _no_full_read)
    out = str(tmp_path / "twi.tif")
    pm.save_geotiff_tiled("twi", out, overview_factors=(32,))
    assert os.path.getsize(out) > 0

    g = read_geotiff(out)
    assert g.shape == (n, n)
    assert g.data[300, 600] == np.float32(7.5)
    assert g.data[0, 0] == np.float32(1.25)
    ov = read_geotiff(out, ifd_index=1)
    assert ov.shape == (n // 32, n // 32)


def test_default_export_is_streaming(tmp_path, monkeypatch):
    """save_non_overlap_data_geotiff routes through the tiled writer."""
    store = ArrayStore(str(tmp_path / "results.zarr"))
    store.create("uca", (64, 64), "float64", chunks=(32, 32), fill=2.0)

    pm = ProcessManager.__new__(ProcessManager)
    pm.out_file = store
    pm.in_path = str(tmp_path)
    pm.transform = (0.001, 0.0, -105.0, 0.0, -0.001, 41.0)
    pm._projected = False

    monkeypatch.setattr(
        ArrayStore, "__getitem__",
        lambda self, key: (_ for _ in ()).throw(
            AssertionError("full read of %r" % key)))
    written = pm.save_non_overlap_data_geotiff(
        out_path=str(tmp_path / "out"), overview_factors=())
    assert written and written[0].endswith("uca.tif")
    g = read_geotiff(written[0])
    assert g.shape == (64, 64) and g.data[5, 5] == np.float32(2.0)


def test_non_overlap_store_streams(tmp_path, monkeypatch):
    """save_non_overlap_data is a REAL windowed copy into a second store
    (reference process_manager.py:742-784): an 8192²-logical store exports
    in O(chunk) memory — full-array reads during the copy are a bug."""
    n = 8192
    store = ArrayStore(str(tmp_path / "results.zarr"))
    store.create("uca", (n, n), "float64", chunks=(256, 256), fill=np.nan)
    store.write_window("uca", np.full((256, 256), 3.5), (512, 256))
    store.create("twi", (n, n), "float32", chunks=(256, 256), fill=np.nan)

    pm = ProcessManager.__new__(ProcessManager)
    pm.out_file = store
    pm.in_path = str(tmp_path)

    def _no_full_read(self, key):
        raise AssertionError("full-canvas read of %r during compact copy"
                             % key)

    monkeypatch.setattr(ArrayStore, "__getitem__", _no_full_read)
    dst = pm.save_non_overlap_data(keys=["uca", "twi"], chunk=2048)
    monkeypatch.undo()

    assert dst is pm.out_file_noverlap
    assert dst._meta("uca")["shape"] == [n, n]
    assert dst._meta("twi")["dtype"] == "<f4"
    win = dst.read_window("uca", (512, 768), (256, 512))
    assert (win == 3.5).all()
    assert np.isnan(dst.read_window("uca", (0, 16), (0, 16))).all()
