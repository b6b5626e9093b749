"""Native (C++) conditioning kernel == numpy reference implementation.

The native drain-path carver (pydem_tpu/native/conditioning.cpp) must be
bit-identical with the numpy loop in core.conditioning.drain_pit_paths —
including tie ordering (ascending flat index), back-pruning, and the numpy
linspace carving formula.  Tested on noisy pit-dense terrain, masked (NaN)
terrain, and the analytic fixture suite.
"""
import warnings

import numpy as np
import pytest

from pydem_tpu import fixtures
from pydem_tpu.core import conditioning as cond
from pydem_tpu.native import get_lib

pytestmark = pytest.mark.skipif(get_lib() is None,
                                reason="native kernel unavailable")


def _both(elev, **kw):
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        a = cond.drain_pit_paths(elev, kw.pop("dX", np.ones(elev.shape[0] - 1)),
                                 kw.pop("dY", np.ones(elev.shape[0] - 1)),
                                 native=True, **kw)
        b = cond.drain_pit_paths(elev, np.ones(elev.shape[0] - 1),
                                 np.ones(elev.shape[0] - 1),
                                 native=False, **kw)
    return a, b


def test_noisy_cone_bitexact():
    rng = np.random.RandomState(7)
    n = 96
    x, y = np.mgrid[-1:1:complex(0, n), -1:1:complex(0, n)]
    elev = (1 - np.sqrt(x ** 2 + y ** 2) / np.sqrt(2)) * 5 + rng.rand(n, n)
    a, b = _both(elev)
    assert (a != elev).any()  # something was carved
    np.testing.assert_array_equal(a, b)


def test_masked_terrain_bitexact():
    rng = np.random.RandomState(3)
    n = 64
    elev = rng.rand(n, n) * 4 + 1
    elev[20:30, 20:30] = np.nan  # no-data hole: growth into it must stall
    a, b = _both(elev)
    np.testing.assert_array_equal(a, b)


def test_geodesic_spacing_bitexact():
    rng = np.random.RandomState(11)
    n = 48
    elev = np.cumsum(rng.rand(n, n) - 0.45, axis=0) + rng.rand(n, n)
    dX = 0.8 + 0.4 * np.linspace(0, 1, n - 1)
    dY = np.full(n - 1, 0.93)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        a = cond.drain_pit_paths(elev, dX, dY, native=True)
        b = cond.drain_pit_paths(elev, dX, dY, native=False)
    np.testing.assert_array_equal(a, b)


def test_distance_filters_bitexact():
    rng = np.random.RandomState(5)
    n = 64
    elev = rng.rand(n, n) * 3
    for kw in ({"max_dist": 4}, {"max_dist": None},
               {"max_dist_XY": 3.0}, {"max_iter": 5}):
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            a = cond.drain_pit_paths(elev, np.ones(n - 1), np.ones(n - 1),
                                     native=True, **kw)
            b = cond.drain_pit_paths(elev, np.ones(n - 1), np.ones(n - 1),
                                     native=False, **kw)
        np.testing.assert_array_equal(a, b, err_msg=str(kw))


@pytest.mark.parametrize("testnum", [0, 9, 13, 20, 24, 26, 28, 30])
def test_fixture_bitexact(testnum):
    elev, _ang, _uca = fixtures.get_test_case(testnum, 16)
    filled = cond.fill_flats(np.asarray(elev, "float64"))
    a, b = _both(filled)
    np.testing.assert_array_equal(a, b)
