"""DEMProcessor option-surface behavior (api.py): config validation, the
deliberately-inert reference options, and the saturation early-exit flag."""
import warnings

import numpy as np
import pytest

from pydem_tpu import DEMProcessor


def _elev(n=16):
    x, y = np.mgrid[-1:1:complex(0, n), -1:1:complex(0, n)]
    return (1 - np.hypot(x, y) / np.sqrt(2) + 0.05).astype("float64")


def test_unknown_option_rejected():
    with pytest.raises(TypeError):
        DEMProcessor(elev=_elev(), not_an_option=True)


@pytest.mark.parametrize("key,val", [("circular_ref_maxcount", 5),
                                     ("fill_flats_max_iter", 3)])
def test_inert_options_warn_on_non_default(key, val):
    """The two documented-inert reference options (docs/PARITY.md) must not
    be accepted silently with non-default values."""
    with pytest.warns(UserWarning, match="no effect"):
        DEMProcessor(elev=_elev(), **{key: val})


@pytest.mark.parametrize("key,val", [("circular_ref_maxcount", 50),
                                     ("fill_flats_max_iter", 10)])
def test_inert_options_quiet_on_default(key, val):
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        DEMProcessor(elev=_elev(), **{key: val})


def test_apply_uca_limit_edges_marks_saturated_edges_done():
    """Edge pixels with uca > 2·limit·min_area report done
    (dem_processing.py:977-980) so a tile-edge fixed point can early-exit."""
    n = 16
    ramp = np.tile(np.linspace(1.0, 2.0, n)[:, None], (1, n))
    base = DEMProcessor(elev=ramp.copy())
    base.calc_uca()
    lim = DEMProcessor(elev=ramp.copy(), apply_uca_limit_edges=True,
                       uca_saturation_limit=2.0)
    lim.calc_uca()
    np.testing.assert_allclose(base.uca, lim.uca)  # uca itself is untouched
    sat = lim.uca > 2.0 * 2 * lim.twi_min_area
    assert sat.any()
    assert lim.edge_done[sat].all()
    extra = lim.edge_done & ~base.edge_done
    assert extra.any() and (extra <= sat).all()
