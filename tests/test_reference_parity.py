"""Golden parity vs the reference implementation.

Runs the *actual* reference pyDEM (from /root/reference, via tools/oracle.py
stubs + a pure-python port of its Cython kernel) side by side with pydem_tpu
on the analytic fixture suite, comparing every pipeline stage:
conditioned elevation, slope magnitude, direction, flats, UCA, and TWI.

This is the reference's own test philosophy (exact-value + fixture DEMs,
test_end_to_end.py) extended to full-field golden comparison.
"""
import numpy as np
import pytest

from pydem_tpu import DEMProcessor, fixtures

oracle = pytest.importorskip("oracle")

# Fixture cases by regime (utils_test_pydem.py:426-488):
#  ramps/cone (smooth), flats (ring/top/line), pits, masked/no-data, spiral.
CASES = [0, 1, 3, 5, 8, 9, 11, 13, 14, 18, 20, 23, 24, 26, 28, 29, 30, 33]
N = 16


def _both(testnum, NN=N, **opts):
    elev, _ang, _uca = fixtures.get_test_case(testnum, NN)
    ref = oracle.reference_processor(elev.copy(), **opts)
    mine = DEMProcessor(elev=elev.copy(), **opts)
    return ref, mine


def _cmp(a, b, name, case, decimal=10):
    np.testing.assert_array_almost_equal(
        np.asarray(a, "float64"), np.asarray(b, "float64"), decimal=decimal,
        err_msg="case %s: %s mismatch" % (case, name))


@pytest.mark.parametrize("testnum", CASES)
def test_full_chain_parity(testnum):
    ref, mine = _both(testnum)

    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        rmag, rang = ref.calc_slopes_directions()
        mmag, mang = mine.calc_slopes_directions()

        _cmp(ref.elev, mine.elev, "conditioned elev", testnum)
        _cmp(rmag, mmag, "mag", testnum)
        _cmp(rang, mang, "direction", testnum)
        _cmp(ref.flats, mine.flats, "flats", testnum)

        ruca = ref.calc_uca()
        muca = mine.calc_uca()
        _cmp(ruca, muca, "uca", testnum, decimal=8)
        _cmp(ref.mag, mine.mag, "mag post-pits", testnum)

        rtwi = ref.calc_twi()
        mtwi = mine.calc_twi()
        _cmp(rtwi, mtwi, "twi", testnum, decimal=8)


@pytest.mark.parametrize("testnum", [0, 13, 24, 30])
def test_no_conditioning_parity(testnum):
    """fill_flats=False + drain_pits_path=False exercises the raw stencil."""
    ref, mine = _both(testnum, fill_flats=False, drain_pits_path=False)
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        rmag, rang = ref.calc_slopes_directions()
        mmag, mang = mine.calc_slopes_directions()
        _cmp(rmag, mmag, "mag", testnum)
        _cmp(rang, mang, "direction", testnum)
        ruca = ref.calc_uca()
        muca = mine.calc_uca()
        _cmp(ruca, muca, "uca", testnum, decimal=8)


@pytest.mark.parametrize("mode", ["drain_flats", "drain_pits_spill"])
@pytest.mark.parametrize("testnum", [0, 9, 11, 13, 18, 20, 24])
def test_deprecated_drain_mode_parity(mode, testnum):
    """The non-default drain modes (dem_processing.py:1384-1645) match the
    reference end to end: drain_flats routes flat areas through each flat's
    lowest pixel; drain_pits_spill drains each pit to its watershed spill
    point with weight 1."""
    import warnings

    opts = {"drain_pits": False, mode: True}
    ref, mine = _both(testnum, **opts)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        ruca = ref.calc_uca()
        muca = mine.calc_uca()
        rtwi = ref.calc_twi()
        mtwi = mine.calc_twi()
    assert (np.isfinite(ruca) == np.isfinite(muca)).all(), \
        "case %s %s: NaN pattern mismatch" % (testnum, mode)
    both = np.isfinite(ruca) & np.isfinite(muca)
    _cmp(ruca[both], muca[both], "uca(%s)" % mode, testnum, decimal=8)
    tb = np.isfinite(rtwi) & np.isfinite(mtwi)
    _cmp(rtwi[tb], mtwi[tb], "twi(%s)" % mode, testnum, decimal=8)
    _cmp(ref.mag, mine.mag, "mag post-%s" % mode, testnum)


@pytest.mark.parametrize("testnum", [0, 13, 33])
def test_blocked_solver_full_chain_parity(testnum):
    """DEMProcessor(uca_solver='blocked') — the Pallas Gauss-Seidel path,
    interpret-mode off-TPU — matches the reference end to end, including
    pit links through accumulate_blocked_pits_gs."""
    import warnings

    ref, mine = _both(testnum, uca_solver="blocked", uca_block_size=8)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        ruca = ref.calc_uca()
        muca = mine.calc_uca()
        rtwi = ref.calc_twi()
        mtwi = mine.calc_twi()
    assert (np.isfinite(ruca) == np.isfinite(muca)).all()
    both = np.isfinite(ruca) & np.isfinite(muca)
    _cmp(ruca[both], muca[both], "uca(blocked)", testnum, decimal=8)
    tb = np.isfinite(rtwi) & np.isfinite(mtwi)
    _cmp(rtwi[tb], mtwi[tb], "twi(blocked)", testnum, decimal=8)


@pytest.mark.parametrize("testnum", [0, 1, 3, 20, 30])
def test_uca_limit_edges_parity(testnum):
    """apply_uca_limit_edges (dem_processing.py:977-980): edge pixels whose
    UCA exceeds 2x the saturation limit are marked done — the large-domain
    convergence early-exit.  A low saturation limit makes it fire on 16²
    fixtures with live edges."""
    import warnings

    opts = dict(apply_uca_limit_edges=True, uca_saturation_limit=2.0)
    ref, mine = _both(testnum, **opts)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        ruca = ref.calc_uca()
        muca = mine.calc_uca()
    both = np.isfinite(ruca) & np.isfinite(muca)
    _cmp(ruca[both], muca[both], "uca", testnum, decimal=8)
    np.testing.assert_array_equal(
        np.asarray(ref.edge_done), np.asarray(mine.edge_done),
        err_msg="case %s: edge_done mismatch under apply_uca_limit_edges"
        % testnum)
    np.testing.assert_array_equal(
        np.asarray(ref.edge_todo, bool), np.asarray(mine.edge_todo, bool),
        err_msg="case %s: edge_todo mismatch" % testnum)
    # sanity: the saturation threshold is actually exceeded on edge pixels
    # (otherwise the test is vacuous)
    edge = np.zeros(muca.shape, bool)
    edge[[0, -1], :] = True
    edge[:, [0, -1]] = True
    sat = np.nan_to_num(np.asarray(muca)) > 2.0 * 2 * mine.twi_min_area
    assert (sat & edge).any(), \
        "case %s: saturation limit never exceeded; lower the limit" % testnum
