"""Exact-value D∞ slope/direction tests.

The 5×5 cardinal/diagonal ramp matrices mirror the reference's pinned
expectations (test_end_to_end.py:152-287), verified under reverse, transpose,
and transpose-reverse orientations.
"""
import numpy as np
import pytest

from pydem_tpu import DEMProcessor

R2 = np.sqrt(2)
PI = np.pi

CARDINAL_ELEV = np.array([
    [1, 1, 1, 1, 1],
    [2, 2, 2, 2, 2],
    [3, 3, 3, 3, 3],
    [4, 4, 4, 4, 4],
    [5, 5, 5, 5, 5]], dtype="float64")
CARDINAL_ANG = np.array([
    [-1, -1, PI / 2, -1, -1],
    [PI / 2] * 5,
    [PI / 2] * 5,
    [PI / 2] * 5,
    [PI / 2] * 5])
CARDINAL_MAG = np.array([
    [-1, -1, 1, -1, -1],
    [1, 1, 1, 1, 1],
    [1, 1, 1, 1, 1],
    [1, 1, 1, 1, 1],
    [1, 1, 1, 1, 1]], dtype="float64")
CARDINAL_UCA = np.array([
    [np.nan, np.nan, 5, np.nan, np.nan],
    [4, 4, 4, 4, 4],
    [3, 3, 3, 3, 3],
    [2, 2, 2, 2, 2],
    [1, 1, 1, 1, 1]], dtype="float64")

DIAG_ELEV = np.array([
    [1, 2, 3, 4, 5],
    [2, 3, 4, 5, 6],
    [3, 4, 5, 6, 7],
    [4, 5, 6, 7, 8],
    [5, 6, 7, 8, 9]], dtype="float64")
DIAG_ANG = np.array([
    [3 / 4, 3 / 4, 3 / 4, 3 / 4, 1],
    [3 / 4, 3 / 4, 3 / 4, 3 / 4, 3 / 4],
    [3 / 4, 3 / 4, 3 / 4, 3 / 4, 3 / 4],
    [3 / 4, 3 / 4, 3 / 4, 3 / 4, 3 / 4],
    [1 / 2, 3 / 4, 3 / 4, 3 / 4, 3 / 4]]) * PI
DIAG_MAG = np.array([
    [R2, R2, R2, R2, 1],
    [R2, R2, R2, R2, R2],
    [R2, R2, R2, R2, R2],
    [R2, R2, R2, R2, R2],
    [1, R2, R2, R2, R2]])
DIAG_UCA = np.array([
    [5, 4, 3, 3, 1],
    [4, 4, 3, 2, 1],
    [3, 3, 3, 2, 1],
    [3, 2, 2, 2, 1],
    [1, 1, 1, 1, 1]], dtype="float64")


def _check(elev, mag_exp, ang_exp, uca_exp, check_ang=True):
    dp = DEMProcessor(elev=elev, fill_flats=False)
    mag, ang = dp.calc_slopes_directions()
    np.testing.assert_array_almost_equal(mag, mag_exp)
    if check_ang:
        np.testing.assert_array_almost_equal(ang, ang_exp)
    uca = dp.calc_uca()
    np.testing.assert_array_almost_equal(uca, uca_exp)


@pytest.mark.parametrize("name,elev,mag,ang,uca", [
    ("cardinal", CARDINAL_ELEV, CARDINAL_MAG, CARDINAL_ANG, CARDINAL_UCA),
    ("diagonal", DIAG_ELEV, DIAG_MAG, DIAG_ANG, DIAG_UCA),
])
def test_orientations(name, elev, mag, ang, uca):
    _check(elev, mag, ang, uca)
    # reverse rows
    slc = (slice(None, None, -1), slice(None))
    _check(elev[slc], mag[slc], None, uca[slc], check_ang=False)
    # transpose
    _check(elev.T, mag.T, None, uca.T, check_ang=False)
    # transpose-reverse
    slc = (slice(None, None, -1), slice(None, None, -1))
    _check(elev[slc].T, mag[slc].T, None, uca[slc].T, check_ang=False)


# ---------------------------------------------------------------------------
# label_flood (the core labeling primitive behind find_flats_edges)
# ---------------------------------------------------------------------------

def _flood_vs_scipy(mask):
    """label_flood's (min-flat-index label, payload-at-label) must agree with
    scipy.ndimage.label + per-region reductions."""
    import jax.numpy as jnp
    from scipy import ndimage as ndi

    from pydem_tpu.core.slope_direction import label_flood

    n, m = mask.shape
    payload = np.arange(n * m, dtype="float64").reshape(n, m) * 1.7 + 3.0

    lbl, rep = label_flood(jnp.asarray(mask), jnp.asarray(payload))
    lbl, rep = np.asarray(lbl), np.asarray(rep)

    slabels, nreg = ndi.label(mask, structure=np.ones((3, 3), bool))
    exp_lbl = np.full(mask.shape, n * m, "int64")
    exp_rep = np.full(mask.shape, np.nan)
    flat_idx = np.arange(n * m).reshape(n, m)
    for r in range(1, nreg + 1):
        sel = slabels == r
        first = flat_idx[sel].min()
        exp_lbl[sel] = first
        exp_rep[sel] = payload.ravel()[first]
    np.testing.assert_array_equal(lbl, exp_lbl)
    np.testing.assert_array_equal(np.isnan(rep), np.isnan(exp_rep))
    np.testing.assert_array_almost_equal(np.nan_to_num(rep),
                                         np.nan_to_num(exp_rep))


@pytest.mark.parametrize("seed,p", [(0, 0.3), (1, 0.5), (2, 0.7)])
def test_label_flood_random(seed, p):
    rng = np.random.RandomState(seed)
    _flood_vs_scipy(rng.rand(40, 37) < p)


def test_label_flood_snake():
    """A single serpentine region whose path length is ~n²/2 — the case that
    stresses the pointer-jump compression (O(diameter) stencil sweeps would
    need ~800 iterations here)."""
    n = 41
    mask = np.zeros((n, n), bool)
    for r in range(0, n, 2):
        mask[r, :] = True
    for k, r in enumerate(range(1, n, 2)):
        mask[r, -1 if k % 2 == 0 else 0] = True
    _flood_vs_scipy(mask)


def test_label_flood_empty_and_full():
    _flood_vs_scipy(np.zeros((16, 16), bool))
    _flood_vs_scipy(np.ones((16, 16), bool))
