"""Golden parity on the bundled real-world tile
(/root/reference/pydem/test/test_NN032_033_elev.tif): full chain vs the
reference implementation with real geodesic pixel sizes."""
import warnings

import numpy as np
import pytest

from pydem_tpu import DEMProcessor
from pydem_tpu.io import read_geotiff_kwargs

oracle = pytest.importorskip("oracle")

TILE = "/root/reference/pydem/test/test_NN032_033_elev.tif"


def test_bundled_tile_full_chain():
    kwargs = read_geotiff_kwargs(TILE)

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        ref = oracle.reference_processor(
            kwargs["elev"].copy(), dX=kwargs["dX"].copy(),
            dY=kwargs["dY"].copy(), dX2=kwargs["dX2"].copy(),
            dY2=kwargs["dY2"].copy())
        mine = DEMProcessor(elev_fn=TILE)

        rmag, rang = ref.calc_slopes_directions()
        mmag, mang = mine.calc_slopes_directions()
        np.testing.assert_array_almost_equal(ref.elev, mine.elev, decimal=10)
        np.testing.assert_array_almost_equal(rmag, mmag, decimal=10)
        np.testing.assert_array_almost_equal(rang, mang, decimal=10)

        ruca = ref.calc_uca()
        muca = mine.calc_uca()
        # relative comparison: geodesic cell areas are ~9e6 m²
        both_nan = np.isnan(ruca) & np.isnan(muca)
        np.testing.assert_allclose(
            np.where(both_nan, 0, np.asarray(ruca, "float64")),
            np.where(both_nan, 0, muca), rtol=1e-8)

        rtwi = ref.calc_twi()
        mtwi = mine.calc_twi()
        both_nan = np.isnan(rtwi) & np.isnan(mtwi)
        np.testing.assert_allclose(
            np.where(both_nan, 0, np.asarray(rtwi, "float64")),
            np.where(both_nan, 0, mtwi), rtol=1e-8)
