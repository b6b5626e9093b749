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


def test_pit_gate_sees_pit_beside_nan_hole():
    """A pit whose every true pit borders a NaN no-data pixel must still trip
    the device pit gate (advisor r4 high): jnp.minimum would propagate the
    NaN and silently skip the carve, diverging conditioned elevation from
    the reference (whose scipy minimum_filter ignores non-leading NaNs)."""
    import jax.numpy as jnp

    from pydem_tpu.api import _has_pits_program

    elev = _elev(16) + 1.0
    elev[7, 7] = 0.5          # the only pit
    elev[7, 8] = np.nan       # no-data hole adjacent to it
    assert bool(_has_pits_program(jnp.asarray(elev)))
    # the gate must be a superset of the exact host detection: the host
    # pass sees this pit too (it cannot drain it — the NaN poisons its
    # border minimum — but it detects it and warns, which a False gate
    # would silently skip)
    from pydem_tpu.core.conditioning import drain_pit_paths

    with pytest.warns(UserWarning, match="no place to drain"):
        drain_pit_paths(elev, np.ones(15), np.ones(15), native=False)


def test_min_area_pending_folds_across_solves():
    """Two calc_uca calls with no intervening host read must still
    accumulate min(min_area) across solves (advisor r4: the pending device
    scalar was overwritten)."""
    dp = DEMProcessor(elev=_elev(16), conditioning_backend="device",
                      pit_backend="device")
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        dp.calc_uca()
    # plant a smaller pending min_area as if an earlier solve produced it
    import jax.numpy as jnp

    dp.__dict__["_min_area_dev"] = jnp.asarray(0.25)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        dp._calc_uca_device(fetch=False)
    assert dp.twi_min_area == 0.25


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
