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


@pytest.mark.parametrize("testnum", [33, 5, 24])  # 24: masked sea (carkoon)
def test_blocked_gs_matches_jacobi(testnum):
    """The Gauss-Seidel fast-sweeping variant reaches the same fixed point.

    GS blocks read the live canvas (earlier blocks' results propagate within
    the round) and rounds cycle the 4 corner orders; the per-orientation
    canonical summation order makes the fixed point bitwise stable."""
    from pydem_tpu.ops.uca_block import accumulate_blocked_gs

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

    ref, sweeps = accumulate(base, W)
    got, rounds = accumulate_blocked_gs(base, W, B=8, inner_max=8,
                                        interpret=True)
    np.testing.assert_array_almost_equal(np.asarray(ref), np.asarray(got),
                                         decimal=10)
    # fast-sweeping rounds scale with flow-direction reversals, far fewer
    # than per-pixel sweeps
    assert int(rounds) < int(sweeps)


@pytest.mark.parametrize("testnum", [13, 16])
def test_blocked_with_pits_matches(testnum):
    """Blocked solver with pit links == the dense Jacobi with pit links."""
    import warnings

    import jax

    from pydem_tpu import DEMProcessor, fixtures
    from pydem_tpu.ops.uca_block import accumulate_blocked_pits

    n = 32
    elev, _a, _u = fixtures.get_test_case(testnum, n)
    # conditioning off so pits survive to the UCA stage and create links
    opts = dict(fill_flats=False, drain_pits_path=False)
    dp = DEMProcessor(elev=elev, **opts)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        ref_uca = dp.calc_uca()  # jacobi path incl. pit links

    from pydem_tpu.core import conditioning as cond
    from pydem_tpu.core.receivers import receiver_weights, section_proportion

    dp2 = DEMProcessor(elev=elev, **opts)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        dp2.calc_slopes_directions()
        section, proportion = section_proportion(
            jnp.asarray(dp2.direction), jnp.asarray(dp2.flats),
            jnp.asarray(dp2.dX), jnp.asarray(dp2.dY))
        ps, pd, pw, flats2, _mag2 = cond.connectivity_pits(
            dp2.flats, dp2.elev, dp2.mag, dp2.dX, dp2.dY)
    keep = pw > 1e-8
    ps, pd, pw = ps[keep], pd[keep], pw[keep]
    W = receiver_weights(section, proportion, jnp.asarray(dp2.elev))
    base = base_area(jnp.asarray(dp2.dX2), jnp.asarray(dp2.dY2),
                     elev.shape, jnp.asarray(dp2.elev).dtype)
    if ps.size == 0:
        pytest.skip("case has no pit links")
    from pydem_tpu.ops.uca_block import accumulate_blocked_pits_gs

    for solver in (accumulate_blocked_pits, accumulate_blocked_pits_gs):
        got, _rounds = solver(
            base, W, jnp.asarray(ps), jnp.asarray(pd), jnp.asarray(pw),
            B=8, inner_max=8, interpret=True)
        got = np.where(np.asarray(flats2), np.nan, np.asarray(got))
        both_nan = np.isnan(ref_uca) & np.isnan(got)
        np.testing.assert_array_almost_equal(
            np.where(both_nan, 0, ref_uca), np.where(both_nan, 0, got),
            decimal=8, err_msg=solver.__name__)


def test_compact_from_dense_roundtrip():
    """(K, W1) compact encoding expands back to the dense planes bitwise."""
    from pydem_tpu.ops.uca_block import _NO_EDGE, compact_from_dense

    n = 32
    elev, _a, _u = fixtures.get_test_case(13, n)  # pits -> pruning exercised
    elev = jnp.asarray(elev)
    dX = dY = jnp.ones(n - 1)
    mag, direction = slopes_directions(elev, dX, dY)
    flats = find_flats_edges(elev, mag, direction)
    direction = jnp.where(flats, -1, direction)
    section, proportion = section_proportion(direction, flats, dX, dY)
    W = receiver_weights(section, proportion, elev)
    K, W1 = compact_from_dense(W)
    k1, k2 = np.asarray(K) >> 4, np.asarray(K) & 15
    w1 = np.asarray(W1)
    w2 = np.where(k2 != _NO_EDGE, 1 - w1, 0.0)
    dense = np.zeros_like(np.asarray(W))
    for k in range(8):
        dense[k] = np.where(k1 == k, w1, 0) + np.where(k2 == k, w2, 0)
    np.testing.assert_array_equal(dense, np.asarray(W))


def test_blocked_gs_split_subsets_match():
    """interior-then-boundary subset rounds (the sharded overlap structure)
    reach the same fixed point as the plain Jacobi solve."""
    import jax

    from pydem_tpu.ops.uca_block import (HC, HR, compact_from_dense,
                                         gs_round_oriented)

    n = 32
    B = 8
    elev, _a, _u = fixtures.get_test_case(33, n)
    elev = jnp.asarray(elev)
    dX = dY = jnp.ones(n - 1)
    mag, direction = slopes_directions(elev, dX, dY)
    flats = find_flats_edges(elev, mag, direction)
    direction = jnp.where(flats, -1, direction)
    section, proportion = section_proportion(direction, flats, dX, dY)
    W = receiver_weights(section, proportion, elev)
    base = base_area(jnp.ones(n), jnp.ones(n), elev.shape, elev.dtype)
    ref, _sweeps = accumulate(base, W)

    K, W1 = compact_from_dense(W)
    kp = jnp.pad(K, ((HR, HR), (HC, HC)), constant_values=255)
    w1p = jnp.pad(W1, ((HR, HR), (HC, HC)))
    xp = jnp.pad(base, ((HR, HR), (HC, HC)))
    for r in range(64):
        o = jnp.int32(r % 4)
        xp, chg_i = gs_round_oriented(xp, kp, w1p, base, o, B=B,
                                      inner_max=2 * B + 4, interpret=True,
                                      subset="interior")
        xp, chg_b = gs_round_oriented(xp, kp, w1p, base, o, B=B,
                                      inner_max=2 * B + 4, interpret=True,
                                      subset="boundary")
        if int(np.sum(chg_i)) + int(np.sum(chg_b)) == 0:
            break
    got = xp[HR: HR + n, HC: HC + n]
    np.testing.assert_array_almost_equal(np.asarray(ref), np.asarray(got),
                                         decimal=10)
