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


def test_device_fast_path_matches_staged():
    """The device-resident fast chain (fused programs, lazy state fetch)
    must produce the same uca/twi/mag/flats as the staged orchestration
    with the same device backends."""
    import warnings

    import numpy as np

    from pydem_tpu import DEMProcessor, fixtures

    n = 64
    rng = np.random.RandomState(3)
    elev, _a, _u = fixtures.get_test_case(30, n)  # noisy cone
    elev = np.round(np.asarray(elev) * 40) / 40  # quantization pits/flats

    class StagedDP(DEMProcessor):
        _fast_device = False  # force the per-stage host-orchestrated path

    kw = dict(conditioning_backend="device", pit_backend="device")
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        fast = DEMProcessor(elev=elev.copy(), **kw)
        twi_fast = fast.calc_twi()
        staged = StagedDP(elev=elev.copy(), **kw)
        twi_staged = staged.calc_twi()

    assert fast._dev("uca") is not None  # the fast path actually ran
    for name in ("uca", "mag", "twi"):
        a, b = getattr(fast, name), getattr(staged, name)
        np.testing.assert_array_almost_equal(
            np.nan_to_num(a), np.nan_to_num(b), decimal=8, err_msg=name)
        np.testing.assert_array_equal(np.isnan(a), np.isnan(b), err_msg=name)
    np.testing.assert_array_equal(fast.flats, staged.flats)
    np.testing.assert_array_almost_equal(np.nan_to_num(twi_fast),
                                         np.nan_to_num(twi_staged), decimal=8)
