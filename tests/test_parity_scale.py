"""Parity vs the reference AT SCALE (64² / 256²) and manager-vs-reference
ProcessManager on the same tile directory.

Small-N parity (test_reference_parity.py) pins the numerics; these sizes are
where the documented device approximations (pit-growth window, label-flood
order) and multi-region interactions would bite if they were wrong.
"""
import os
import warnings

import numpy as np
import pytest

from pydem_tpu import DEMProcessor, fixtures

oracle = pytest.importorskip("oracle")


def _hard_terrain(n, quant=150, seed=7):
    """Quantized noisy cone + sea notch — the bench's pit/flat-dense regime."""
    rng = np.random.RandomState(seed)
    x, y = np.mgrid[-1:1:complex(0, n), -1:1:complex(0, n)]
    elev = 1 - np.sqrt(x**2 + y**2) / np.sqrt(2.0) + rng.randn(n, n) * 0.002
    elev = np.round(elev * quant) / quant
    elev = elev - elev.min() + 0.05
    elev[(x > 0.8) & (np.abs(y) < 0.1)] = 0.0
    return elev.astype("float64")


def _cmp(a, b, name, decimal=8):
    a, b = np.asarray(a, "float64"), np.asarray(b, "float64")
    np.testing.assert_array_equal(np.isnan(a), np.isnan(b),
                                  err_msg="%s NaN pattern" % name)
    both = np.isfinite(a) & np.isfinite(b)
    np.testing.assert_array_almost_equal(a[both], b[both], decimal=decimal,
                                         err_msg=name)


def _cmp_flow(a, b, name, rtol=1e-6, allow_flip_frac=0.05, rel_cap=0.05):
    """Flow-field comparison discipline at scale (docs/PARITY.md): XLA and
    numpy transcendentals (atan2/sqrt) differ by 1 ulp on some inputs; at
    64²+ a handful of pixels sit exactly on a D∞ facet boundary, where the
    ulp flips the section and redistributes that pixel's flow between the
    facet's two receivers — every pixel downstream of a flip shifts by the
    redistributed fraction.  Assertion: identical NaN pattern; at least
    ``1-allow_flip_frac`` of finite pixels within ``rtol``; NO pixel beyond
    ``rel_cap`` relative (the redistribution is bounded, not garbage)."""
    a, b = np.asarray(a, "float64"), np.asarray(b, "float64")
    np.testing.assert_array_equal(np.isnan(a), np.isnan(b),
                                  err_msg="%s NaN pattern" % name)
    both = np.isfinite(a) & np.isfinite(b)
    close = np.isclose(a[both], b[both], rtol=rtol, atol=1e-9)
    frac_off = 1.0 - close.mean()
    rel = np.abs(a[both] - b[both]) / np.maximum(
        np.maximum(np.abs(a[both]), np.abs(b[both])), 1e-9)
    assert frac_off <= allow_flip_frac, (
        "%s: %.4f%% of pixels beyond rtol=%g (max rel %.3g)"
        % (name, 100 * frac_off, rtol, rel.max()))
    assert rel.max() <= rel_cap, (
        "%s: max relative deviation %.3g exceeds cap %.3g"
        % (name, rel.max(), rel_cap))


@pytest.mark.parametrize("n,testnum", [(64, 30), (64, 13), (256, 33),
                                       (256, 30)])
def test_fixture_parity_at_scale(n, testnum):
    """Full host-backend chain matches the reference at 64²/256²."""
    elev, _a, _u = fixtures.get_test_case(testnum, n)
    ref = oracle.reference_processor(elev.copy())
    mine = DEMProcessor(elev=elev.copy())
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        ref.calc_twi()
        mine.calc_twi()
    _cmp(ref.mag, mine.mag, "mag@%d case %d" % (n, testnum), decimal=10)
    _cmp_flow(ref.uca, mine.uca, "uca@%d case %d" % (n, testnum))
    _cmp_flow(ref.twi, mine.twi, "twi@%d case %d" % (n, testnum),
              rtol=1e-4)


@pytest.mark.parametrize("n", [64, 256])
def test_hard_terrain_parity_at_scale(n):
    """Quantized pit/flat-dense terrain (the regime real DEMs live in)
    matches the reference through conditioning + pits + UCA + TWI."""
    elev = _hard_terrain(n)
    ref = oracle.reference_processor(elev.copy())
    mine = DEMProcessor(elev=elev.copy())
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        ref.calc_twi()
        mine.calc_twi()
    _cmp(ref.elev, mine.elev, "conditioned elev@%d" % n, decimal=10)
    _cmp_flow(ref.uca, mine.uca, "uca@%d" % n)
    _cmp_flow(ref.twi, mine.twi, "twi@%d" % n, rtol=1e-4)


@pytest.mark.parametrize("mode", ["drain_flats", "drain_pits_spill"])
def test_drain_mode_parity_at_scale(mode):
    """Deprecated drain modes at 64² on quantized terrain."""
    elev = _hard_terrain(64, quant=60)
    opts = {"drain_pits": False, mode: True}
    ref = oracle.reference_processor(elev.copy(), **opts)
    mine = DEMProcessor(elev=elev.copy(), **opts)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        ruca = ref.calc_uca()
        muca = mine.calc_uca()
    _cmp_flow(ruca, muca, "uca(%s)@64" % mode)


@pytest.mark.parametrize("n", [256])
def test_device_backend_parity_at_scale(n):
    """Device backends (fill_flats_device + windowed pit growth + blocked
    GS) vs the reference at 256² on hard terrain.

    The device pit search uses a 96-px window (documented approximation,
    docs/PARITY.md): pits whose min-elevation frontier wanders beyond it are
    dropped rather than drained, perturbing their local UCA.  The assertion
    is therefore: identical NaN pattern up to those pits, and >= 99% of
    finite pixels matching the reference to 1e-4."""
    elev = _hard_terrain(n)
    ref = oracle.reference_processor(elev.copy())
    mine = DEMProcessor(elev=elev.copy(), conditioning_backend="device",
                        pit_backend="device")
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        ruca = np.asarray(ref.calc_uca(), "float64")
        muca = np.asarray(mine.calc_uca(), "float64")
    both = np.isfinite(ruca) & np.isfinite(muca)
    assert both.sum() > 0.97 * np.isfinite(ruca).sum()
    close = np.isclose(ruca[both], muca[both], rtol=1e-4, atol=1e-6)
    frac = close.mean()
    assert frac >= 0.99, "only %.4f of finite pixels match" % frac


def test_manager_vs_reference_process_manager(tmp_path):
    """OUR ProcessManager vs the REFERENCE ProcessManager on the SAME tile
    directory (the reference's own multi-file discipline,
    test_end_to_end.py:26-149, with the reference itself as the oracle
    instead of a single-tile run)."""
    import oracle_pm

    from pydem_tpu import manager as my_manager
    from pydem_tpu.manager import ProcessManager

    tiles = fixtures.mk_test_multifile(33, 32, str(tmp_path), nx_grid=3,
                                       ny_grid=3, nx_overlap=2, ny_overlap=2)

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        ref_pm = oracle_pm.reference_manager(
            tiles, str(tmp_path / "ref_results.zarr"))
        ref_pm.process_twi()
        ref_pm.save_non_overlap_data()
        ref_uca = np.asarray(ref_pm.out_file_noverlap["uca"][:], "float64")
        ref_twi = np.asarray(ref_pm.out_file_noverlap["twi"][:], "float64")

        old_debug = my_manager.DEBUG
        my_manager.DEBUG = True
        try:
            pm = ProcessManager(in_path=tiles,
                                out_path=str(tmp_path / "my_results.zarr"))
            pm.process_twi()
        finally:
            my_manager.DEBUG = old_debug
        my_uca = np.asarray(pm.out_file["uca"], "float64")
        my_twi = np.asarray(pm.out_file["twi"], "float64")

    assert ref_uca.shape == my_uca.shape
    # the reference swallows worker exceptions into its success array — an
    # all-zero canvas means every tile failed, not parity
    assert np.count_nonzero(np.nan_to_num(ref_uca)) > 0, \
        "reference ProcessManager produced nothing (worker failures?)"
    # interior comparison — the reference's own tolerance discipline
    # (test_end_to_end.py:96: edge pixels differ by construction)
    _cmp_flow(ref_uca[1:-1, 1:-1], my_uca[1:-1, 1:-1], "manager uca",
              rtol=1e-6)
    _cmp_flow(ref_twi[1:-1, 1:-1], my_twi[1:-1, 1:-1], "manager twi",
              rtol=1e-4)
