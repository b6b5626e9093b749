"""Property tests the reference's own suite lacks (SURVEY §4.5).

Area conservation: the accumulation fixed point x = base + A·x satisfies
Σ_p x_p·(1 − outflow_p) = Σ base exactly — every unit of base area
terminates somewhere (at a sink, a flat, or by leaving through a pruned
edge, all captured by the (1 − outflow) factor).  A violation means the
solver duplicated or dropped flow.
"""
import warnings

import jax.numpy as jnp
import numpy as np
import pytest

from pydem_tpu import DEMProcessor, fixtures
from pydem_tpu.core.receivers import receiver_weights, section_proportion
from pydem_tpu.core.uca import accumulate, base_area
from pydem_tpu.ops.uca_block import accumulate_blocked


def _setup(testnum, n=24):
    elev, _a, _u = fixtures.get_test_case(testnum, n)
    dp = DEMProcessor(elev=elev)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        dp.calc_slopes_directions()
    section, proportion = section_proportion(
        jnp.asarray(dp.direction), jnp.asarray(dp.flats),
        jnp.asarray(dp.dX), jnp.asarray(dp.dY))
    W = receiver_weights(section, proportion, jnp.asarray(dp.elev))
    base = base_area(jnp.asarray(dp.dX2), jnp.asarray(dp.dY2),
                     elev.shape, jnp.float64)
    return base, W


@pytest.mark.parametrize("testnum", [1, 3, 5, 8, 33, 13, 24, 30])
def test_area_conservation_jacobi(testnum):
    base, W = _setup(testnum)
    x, _ = accumulate(base, W)
    outflow = jnp.sum(W, axis=0)
    terminated = float(jnp.sum(x * (1 - outflow)))
    total = float(jnp.sum(base))
    assert terminated == pytest.approx(total, rel=1e-10)


@pytest.mark.parametrize("testnum", [33, 30])
def test_area_conservation_blocked(testnum):
    base, W = _setup(testnum)
    x, _ = accumulate_blocked(base, W, B=8, interpret=True)
    outflow = jnp.sum(W, axis=0)
    terminated = float(jnp.sum(x * (1 - outflow)))
    total = float(jnp.sum(base))
    assert terminated == pytest.approx(total, rel=1e-10)
