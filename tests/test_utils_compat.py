"""pydem_tpu.utils — the reference's public pydem.utils surface
(utils.py:43-468) on pydem_tpu implementations."""
import numpy as np
import pytest

from pydem_tpu import utils


def test_sortrows_matches_reference_examples():
    a = np.array([[1, 2], [3, 1], [2, 3]])
    np.testing.assert_array_equal(utils.sortrows(a, 0),
                                  [[1, 2], [2, 3], [3, 1]])
    c, I = utils.sortrows(a, 1, index_out=True)
    np.testing.assert_array_equal(c, [[3, 1], [1, 2], [2, 3]])
    np.testing.assert_array_equal(a[I, :], c)


def test_region_helpers_round_trip():
    region = np.zeros((8, 8), bool)
    region[3:6, 3:6] = True
    border = utils.get_border_mask(region)
    assert border.sum() == 16 and not (border & region).any()
    I = np.flatnonzero(region)
    adj = utils.get_adjacent_index(I, region.shape, region.size)
    bor = utils.get_border_index(I, region.shape, region.size)
    assert set(bor) == set(np.flatnonzero(border))
    assert set(I) <= set(adj)
    src = np.zeros((8, 8), bool)
    src[3, 3] = True
    d = utils.get_distance(region, src)
    assert d[3, 3] == 0 and d[4, 4] == pytest.approx(np.sqrt(2))
    assert utils.find_centroid(region) == (4, 4)


def test_slices():
    assert utils.make_slice(5, 2) == slice(2, 5)
    assert utils.grow_slice(slice(0, 3), 10) == slice(0, 4)
    assert utils.grow_obj((slice(1, 3), slice(8, 10)), (10, 10)) == \
        (slice(0, 4), slice(7, 10))


def test_raster_round_trip(tmp_path):
    fn = str(tmp_path / "t.tif")
    data = np.arange(64, dtype="float32").reshape(8, 8)
    t = utils.mk_transform(10.0, 20.0, -0.01, 0.01)
    utils.save_raster(fn, data, crs=4326, transform=t)
    g = utils.read_raster(fn)
    np.testing.assert_allclose(np.asarray(g.data), data)
    kw = utils.dem_processor_from_raster_kwargs(fn)
    assert {"elev", "dX", "dY", "dX2", "dY2"} <= set(kw)
    dx, dy, dx2, dy2 = utils.mk_dx_dy_from_geotif_layer(g)
    assert dx.shape == (7,) and dx2.shape == (8,)
    fn2 = utils.get_fn(g, "uca")
    assert fn2.endswith("_uca.tif") and fn2[0] in "NS"
