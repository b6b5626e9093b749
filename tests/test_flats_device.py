"""On-device fill_flats == host (exact-semantics) fill_flats."""
import numpy as np
import pytest

from pydem_tpu import fixtures
from pydem_tpu.core import conditioning as cond
from pydem_tpu.core.flats_device import fill_flats_device

# every flat-handling regime: cones, ring/top/line flats with various
# drains, pits, trough, spiral, noisy cone
CASES = [0, 13, 14, 15, 18, 19, 20, 23, 24, 26, 30, 31, 33]


@pytest.mark.parametrize("testnum", CASES)
def test_device_matches_host(testnum):
    elev, _a, _u = fixtures.get_test_case(testnum, 32)
    host = cond.fill_flats(elev.copy())
    dev = np.asarray(fill_flats_device(elev.astype("float64")))
    both_nan = np.isnan(host) & np.isnan(dev)
    np.testing.assert_array_almost_equal(
        np.where(both_nan, 0, host), np.where(both_nan, 0, dev), decimal=10,
        err_msg="case %d" % testnum)
