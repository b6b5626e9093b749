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


def _long_channel(n=128, drain_col=115):
    """A pit whose min-elevation growth frontier must wander ``drain_col-4``
    px down a narrow channel before finding a strictly-lower drain — beyond
    the device backend's 96-px search window (ops/pit_growth.py docstring)
    but within the reference's whole-tile search
    (dem_processing.py:1287-1329)."""
    elev = np.full((n, n), 10.0)
    row, c0 = n // 2, 4
    elev[row, c0] = 1.0  # the pit
    ks = np.arange(1, drain_col - c0)
    elev[row, c0 + ks] = 1.0 + 0.001 * ks  # strictly-rising channel floor
    elev[row, drain_col] = 0.5  # the drain, below the pit
    flats = np.zeros((n, n), bool)
    flats[row, c0] = True
    mag = np.zeros((n, n))
    d = np.ones(n - 1)
    return elev, flats, mag, d, row, c0, drain_col


def test_window_approximation_pinned():
    """Frontier wandering past the 96-px window: host backend drains the pit
    exactly (reference semantics); device backend marks it undrained and
    warns — the documented divergence, asserted not just documented."""
    elev, flats, mag, d, row, c0, drain_col = _long_channel()
    n = elev.shape[0]

    h_src, h_dst, h_w, h_flats, h_mag = cond.connectivity_pits(
        flats, elev, mag, d, d, max_iter=300, max_dist=300)
    assert list(h_src) == [row * n + c0]
    assert list(h_dst) == [row * n + drain_col]
    np.testing.assert_allclose(h_w, [1.0])
    assert not h_flats[row, c0]  # drained: flat cleared, slope stamped
    assert h_mag[row, c0] > 0

    with pytest.warns(UserWarning, match="1 pits had no place to drain"):
        d_src, d_dst, d_w, d_flats, d_mag = connectivity_pits_device(
            flats, elev, mag, d, d, max_iter=300, max_dist=300)
    assert d_src.size == 0 and d_dst.size == 0
    assert d_flats[row, c0]  # undrained: pit stays a flat
    assert d_mag[row, c0] == 0


def test_window_large_enough_matches_host():
    """With the window widened to cover the whole canvas the device backend
    reproduces the host result on the same wandering-frontier fixture —
    the divergence is purely the window, nothing else."""
    elev, flats, mag, d, row, c0, drain_col = _long_channel()
    n = elev.shape[0]

    d_src, d_dst, d_w, d_flats, d_mag = connectivity_pits_device(
        flats, elev, mag, d, d, max_iter=300, max_dist=300, window=n)
    assert list(d_src) == [row * n + c0]
    assert list(d_dst) == [row * n + drain_col]
    np.testing.assert_allclose(d_w, [1.0])
    assert not d_flats[row, c0]


def test_packed_two_tier_retry_matches_wide_window():
    """A pit whose growth frontier wanders past the first-tier window but
    inside the full window: the packed path must detect the clipped search
    and regrow at the full window, producing the same links as a direct
    full-window run (and the same as the host reference)."""
    import jax.numpy as jnp

    from pydem_tpu.ops.pit_growth import pit_links_device_packed

    # channel 40 px long: beyond first_window=16's half-width, inside
    # window=96's search
    elev, flats, mag, d, row, c0, drain_col = _long_channel(n=128,
                                                            drain_col=44)
    n = elev.shape[0]
    out = pit_links_device_packed(jnp.asarray(flats), jnp.asarray(elev),
                                  d, d, max_iter=300, max_dist=300,
                                  first_window=16, window=96)
    wgt = np.asarray(out["wgt"])
    src = np.asarray(out["src"])[wgt > 0]
    dst = np.asarray(out["dst"])[wgt > 0]
    assert list(src) == [row * n + c0]
    assert list(dst) == [row * n + drain_col]
    np.testing.assert_allclose(wgt[wgt > 0], [1.0])
    didx = np.asarray(out["drained_idx"])
    assert row * n + c0 in didx[didx < n * n]
    assert out["n_warn"] == 0


def test_packed_matches_legacy_on_fixture():
    """pit_links_device_packed link set == the host-array device path on a
    pit-dense fixture (covers the dense extraction + compaction)."""
    import jax.numpy as jnp

    from pydem_tpu.ops.pit_growth import pit_links_device, \
        pit_links_device_packed

    n = 64
    x, y = np.mgrid[0:n, 0:n]
    elev = 2 + 0.01 * x + 0.013 * y
    for (i, j) in ((10, 10), (20, 45), (40, 20), (50, 50), (30, 30)):
        elev[i, j] -= 0.5  # isolated pits
    # conditioning off so the pits survive to the connectivity stage
    dp = DEMProcessor(elev=elev, fill_flats=False, drain_pits_path=False)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        dp.calc_slopes_directions()
        assert (dp.flats & (dp.elev > 0)).sum() > 0  # fixture has pits
        legacy = pit_links_device(jnp.asarray(dp.flats),
                                  jnp.asarray(dp.elev), dp.dX, dp.dY)
        packed = pit_links_device_packed(jnp.asarray(dp.flats),
                                         jnp.asarray(dp.elev), dp.dX, dp.dY)
    l_src, l_dst, l_w = legacy[0], legacy[1], legacy[2]
    keep = l_w > 1e-8
    l_src, l_dst, l_w = l_src[keep], l_dst[keep], l_w[keep]
    wgt = np.asarray(packed["wgt"])
    p_src = np.asarray(packed["src"])[wgt > 0]
    p_dst = np.asarray(packed["dst"])[wgt > 0]
    p_w = wgt[wgt > 0]
    lo = np.lexsort((l_dst, l_src))
    po = np.lexsort((p_dst, p_src))
    np.testing.assert_array_equal(l_src[lo], p_src[po])
    np.testing.assert_array_equal(l_dst[lo], p_dst[po])
    np.testing.assert_array_almost_equal(l_w[lo], p_w[po])


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
