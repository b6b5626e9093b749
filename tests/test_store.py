"""ArrayStore: windowed chunk-granular IO + byte-level zarr-v2 format pin.

The store plays the reference's zarr intermediate-store role
(process_manager.py:362-390); interop is asserted at the byte level against
the zarr-v2 spec (chunk = zlib(raw C-order buffer), ``.zarray`` JSON schema)
since the zarr package is not installed here.
"""
import json
import os
import zlib

import numpy as np
import pytest

from pydem_tpu.io.store import ArrayStore


@pytest.fixture()
def store(tmp_path):
    return ArrayStore(str(tmp_path / "s.zarr"))


def test_full_roundtrip(store):
    a = np.arange(20.0).reshape(4, 5)
    store["x"] = a
    np.testing.assert_array_equal(store["x"], a)


def test_chunked_window_roundtrip(store):
    a = np.random.RandomState(0).randn(37, 53)
    store.create("x", a.shape, "float64", chunks=(16, 16))
    store.write_window("x", a, (0, 0))
    np.testing.assert_array_equal(store["x"], a)
    np.testing.assert_array_equal(store.read_window("x", (3, 21), (10, 40)),
                                  a[3:21, 10:40])


def test_window_write_is_chunk_granular(store):
    """A small write must only touch the chunk files it intersects."""
    a = np.zeros((64, 64))
    store.create("x", a.shape, "float64", chunks=(16, 16))
    store.write_window("x", a, (0, 0))
    mtimes = {}
    d = os.path.join(store.root, "x")
    for fn in os.listdir(d):
        if fn != ".zarray":
            os.utime(os.path.join(d, fn), (0, 0))
            mtimes[fn] = 0
    store.write_window("x", np.ones((8, 8)), (20, 20))
    touched = [fn for fn in mtimes
               if os.path.getmtime(os.path.join(d, fn)) > 0]
    assert sorted(touched) == ["1.1"]
    got = store["x"]
    assert got[20:28, 20:28].sum() == 64 and got.sum() == 64


def test_out_of_bounds_window_fill(store):
    a = np.ones((8, 8))
    store.create("x", a.shape, "float64", chunks=(8, 8), fill=np.nan)
    store.write_window("x", a, (0, 0))
    w = store.read_window("x", (-2, 10), (-2, 10))
    assert w.shape == (12, 12)
    assert np.isnan(w[0, :]).all() and np.isnan(w[:, 0]).all()
    assert (w[2:10, 2:10] == 1).all()
    # clipped write: out-of-bounds part silently dropped
    store.write_window("x", np.full((4, 4), 7.0), (6, 6))
    assert (store["x"][6:8, 6:8] == 7).all()


def test_missing_chunk_reads_as_fill(store):
    store.create("x", (32, 32), "float64", chunks=(16, 16), fill=np.nan)
    store.write_window("x", np.ones((16, 16)), (0, 0))
    got = store["x"]
    assert (got[:16, :16] == 1).all()
    assert np.isnan(got[16:, 16:]).all()


# -- zarr-v2 byte-level format pin -------------------------------------------

def test_zarr_v2_bytes_golden(store):
    """Pin the on-disk format to the zarr-v2 spec byte for byte: a zarr
    reader must be able to open what we write."""
    a = np.arange(12.0, dtype="<f8").reshape(3, 4)
    store.create("g", a.shape, "float64", chunks=(2, 2), fill=np.nan)
    store.write_window("g", a, (0, 0))
    d = os.path.join(store.root, "g")
    with open(os.path.join(d, ".zarray")) as f:
        meta = json.load(f)
    assert meta["zarr_format"] == 2
    assert meta["shape"] == [3, 4] and meta["chunks"] == [2, 2]
    assert meta["dtype"] == "<f8"
    assert meta["order"] == "C" and meta["filters"] is None
    assert meta["compressor"]["id"] == "zlib"
    assert meta["fill_value"] == "NaN"  # spec: NaN serializes as a string
    # chunk (0,0) covers rows 0:2, cols 0:2 -> [[0,1],[4,5]] C-order f8 LE
    with open(os.path.join(d, "0.0"), "rb") as f:
        raw = zlib.decompress(f.read())
    assert raw == np.array([[0.0, 1.0], [4.0, 5.0]], "<f8").tobytes()
    # edge chunk (1,1) is padded to full chunk shape per the spec
    with open(os.path.join(d, "1.1"), "rb") as f:
        raw = zlib.decompress(f.read())
    got = np.frombuffer(raw, "<f8").reshape(2, 2)
    np.testing.assert_array_equal(got[0], [10.0, 11.0])
    with open(os.path.join(store.root, ".zgroup")) as f:
        assert json.load(f)["zarr_format"] == 2


def test_zarr_v2_foreign_store_reads(tmp_path):
    """Decode a store directory written from the spec alone (as real zarr
    would write it): raw uncompressed chunks, int dtype, missing chunk."""
    root = tmp_path / "foreign.zarr"
    d = root / "arr"
    os.makedirs(d)
    with open(root / ".zgroup", "w") as f:
        json.dump({"zarr_format": 2}, f)
    meta = {"zarr_format": 2, "shape": [4, 4], "chunks": [2, 2],
            "dtype": "<i4", "compressor": None, "fill_value": 7,
            "filters": None, "order": "C"}
    with open(d / ".zarray", "w") as f:
        json.dump(meta, f)
    with open(d / "0.0", "wb") as f:
        f.write(np.array([[1, 2], [3, 4]], "<i4").tobytes())
    with open(d / "1.0", "wb") as f:
        f.write(np.array([[5, 6], [7, 8]], "<i4").tobytes())
    s = ArrayStore(str(root))
    got = s["arr"]
    np.testing.assert_array_equal(got[:2, :2], [[1, 2], [3, 4]])
    np.testing.assert_array_equal(got[2:, :2], [[5, 6], [7, 8]])
    assert (got[:, 2:] == 7).all()  # missing chunks -> fill_value
