"""Device pit-connectivity growth == host exact implementation."""
import warnings

import numpy as np
import pytest

from pydem_tpu import DEMProcessor, fixtures
from pydem_tpu.core import conditioning as cond
from pydem_tpu.ops.pit_growth import connectivity_pits_device

# pit-heavy regimes: pits, ring flats (leftover flats become pits for UCA),
# trough, spiral, noisy cone
CASES = [13, 14, 16, 24, 25, 26, 30, 31]


@pytest.mark.parametrize("testnum", CASES)
def test_device_matches_host(testnum):
    elev, _a, _u = fixtures.get_test_case(testnum, 32)
    dp = DEMProcessor(elev=elev)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        dp.calc_slopes_directions()
        host = cond.connectivity_pits(dp.flats, dp.elev, dp.mag,
                                      dp.dX, dp.dY)
        dev = connectivity_pits_device(dp.flats, dp.elev, dp.mag,
                                       dp.dX, dp.dY)

    h_src, h_dst, h_w, h_flats, h_mag = host
    d_src, d_dst, d_w, d_flats, d_mag = dev

    # same link set (order may differ within a pit — sort by (src, dst))
    h_order = np.lexsort((h_dst, h_src))
    d_order = np.lexsort((d_dst, d_src))
    np.testing.assert_array_equal(h_src[h_order], d_src[d_order])
    np.testing.assert_array_equal(h_dst[h_order], d_dst[d_order])
    np.testing.assert_array_almost_equal(h_w[h_order], d_w[d_order])
    np.testing.assert_array_equal(h_flats, d_flats)
    np.testing.assert_array_almost_equal(h_mag, d_mag)
