"""Pallas block-relaxation UCA == plain Jacobi UCA (interpret mode on CPU)."""
import jax.numpy as jnp
import numpy as np
import pytest

from pydem_tpu import fixtures
from pydem_tpu.core.receivers import receiver_weights, section_proportion
from pydem_tpu.core.slope_direction import find_flats_edges, slopes_directions
from pydem_tpu.core.uca import accumulate, base_area
from pydem_tpu.ops.uca_block import accumulate_blocked


@pytest.mark.parametrize("testnum", [33, 5, 30])
def test_blocked_matches_jacobi(testnum):
    n = 32
    elev, _a, _u = fixtures.get_test_case(testnum, n)
    elev = jnp.asarray(elev)
    dX = dY = jnp.ones(n - 1)
    mag, direction = slopes_directions(elev, dX, dY)
    flats = find_flats_edges(elev, mag, direction)
    direction = jnp.where(flats, -1, direction)
    section, proportion = section_proportion(direction, flats, dX, dY)
    W = receiver_weights(section, proportion, elev)
    base = base_area(jnp.ones(n), jnp.ones(n), elev.shape, elev.dtype)

    ref, _sweeps = accumulate(base, W)
    got, rounds = accumulate_blocked(base, W, B=8, interpret=True)
    np.testing.assert_array_almost_equal(np.asarray(ref), np.asarray(got),
                                         decimal=10)
    # block-rounds scale with path length in block units — strictly fewer
    # than the plain per-pixel sweeps (path length in pixels)
    assert int(rounds) < int(_sweeps)
