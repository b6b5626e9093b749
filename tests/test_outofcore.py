"""Out-of-core (bounded-memory) pipeline equivalence.

The engine must reproduce the single-canvas DEMProcessor result while only
ever holding S×S super-block windows (the reference's per-tile streaming
guarantee, process_manager.py:1251-1318, at super-block granularity)."""
import numpy as np
import pytest

from pydem_tpu import DEMProcessor, fixtures, manager
from pydem_tpu.io.store import ArrayStore
from pydem_tpu.outofcore import OutOfCoreEngine


def _engine(tmp_path, elev, S=16, margin=64, resume=False, **kwargs):
    store = ArrayStore(str(tmp_path / "ooc.zarr"))
    store.create("elev_src", elev.shape, "float64", chunks=(S, S),
                 fill=np.nan, overwrite=True)
    store.write_window("elev_src", elev, (0, 0))
    n = elev.shape[0]
    eng = OutOfCoreEngine(store, elev.shape, np.ones(n - 1), np.ones(n - 1),
                          np.ones(n), np.ones(n), dem_proc_kwargs=kwargs,
                          superblock=S, margin=margin, resume=resume)
    return store, eng


def _dp(elev, **kwargs):
    n = elev.shape[0]
    dp = DEMProcessor(elev=elev.copy(), dX=np.ones(n - 1), dY=np.ones(n - 1),
                      dX2=np.ones(n), dY2=np.ones(n), **kwargs)
    dp.calc_twi()
    return dp


def _cmp_store(store, dp, fields=("slope", "aspect", "uca", "twi"),
               decimal=10):
    ref = {"slope": dp.mag, "aspect": dp.direction, "uca": dp.uca,
           "twi": dp.twi, "elev": dp.elev}
    for key in fields:
        a, b = np.asarray(ref[key], "float64"), store[key]
        assert (np.isnan(a) == np.isnan(b)).all(), key
        np.testing.assert_array_almost_equal(
            np.nan_to_num(a), np.nan_to_num(b), decimal=decimal,
            err_msg=key)


def test_engine_matches_single_canvas_cone(tmp_path):
    """Non-square domain, partial edge blocks, full-margin conditioning."""
    elev, _a, _u = fixtures.get_test_case(33, 48)
    elev = elev[:40, :]  # 40x48: partial blocks at the bottom
    store, eng = _engine(tmp_path, elev, S=16)
    eng.run()
    dp = _dp(elev)
    _cmp_store(store, dp, ("elev", "slope", "aspect", "uca", "twi"))
    assert eng.uca_rounds >= 1


def test_engine_small_margin_local_features(tmp_path):
    """With features smaller than the margin, windowed conditioning equals
    the global pass even when windows are much smaller than the canvas."""
    elev, _a, _u = fixtures.get_test_case(33, 96)
    store, eng = _engine(tmp_path, elev, S=32, margin=24)
    eng.run()
    dp = _dp(elev)
    _cmp_store(store, dp, ("elev", "slope", "aspect", "uca", "twi"))


def test_engine_pit_links_cross_blocks(tmp_path):
    """Pit fixture: the global pit-link fold across super-block rounds."""
    elev, _a, _u = fixtures.get_test_case(13, 48)
    # conditioning would fill these pits; disable it so the pit-link fold
    # (connectivity_pits -> cross-block scatter) actually carries flow
    opts = dict(fill_flats=False, drain_pits_path=False)
    store, eng = _engine(tmp_path, elev, S=16, **opts)
    eng.run()
    dp = _dp(elev, **opts)
    _cmp_store(store, dp, ("uca", "twi"))
    src, dst, w = eng._links
    assert len(src) > 0  # the fixture actually has pit links


def test_engine_masked_sea(tmp_path):
    """No-data (NaN) regions stream through every stage."""
    elev, _a, _u = fixtures.get_test_case(24, 48)  # masked pit case
    store, eng = _engine(tmp_path, elev, S=16)
    eng.run()
    dp = _dp(elev)
    _cmp_store(store, dp, ("uca",))


def test_engine_resume_is_idempotent(tmp_path):
    elev, _a, _u = fixtures.get_test_case(33, 48)
    store, eng = _engine(tmp_path, elev, S=16)
    eng.run()
    uca0 = store["uca"]
    store2, eng2 = _engine(tmp_path, elev, S=16, resume=True)
    eng2.run()
    np.testing.assert_array_equal(uca0, store2["uca"])


def test_manager_out_of_core_end_to_end(tmp_path):
    """ProcessManager(out_of_core=True) on a tile directory matches the
    in-memory manager, without ever materializing the mosaic."""
    manager.DEBUG = True
    try:
        chunks = fixtures.mk_test_multifile(33, 32, str(tmp_path),
                                            nx_grid=2, ny_grid=2,
                                            nx_overlap=2, ny_overlap=2)
        pm0 = manager.ProcessManager(in_path=chunks,
                                     out_path=str(tmp_path / "mem.zarr"))
        pm0.process_twi()
        pm1 = manager.ProcessManager(in_path=chunks, out_of_core=True,
                                     superblock=16,
                                     out_path=str(tmp_path / "ooc.zarr"))
        pm1.process_twi()
        for key in ("elev", "slope", "aspect", "uca", "twi"):
            a, b = pm0.out_file[key], pm1.out_file[key]
            assert (np.isnan(a) == np.isnan(b)).all(), key
            np.testing.assert_array_almost_equal(
                np.nan_to_num(a), np.nan_to_num(b), err_msg=key)
    finally:
        manager.DEBUG = False


def test_engine_streaming_path_with_frontier(tmp_path, monkeypatch):
    """With the device budget forced to zero the engine takes the
    streaming-rounds path (per-block store IO + converged-block frontier)
    and still reproduces the single-canvas result — incl. pit links whose
    contributions cross super-blocks."""
    monkeypatch.setenv("PYDEM_OOC_DEVICE_CACHE", "0")
    elev, _a, _u = fixtures.get_test_case(13, 48)  # pits -> pit links
    store, eng = _engine(tmp_path, elev, S=16)
    assert not eng._fits_device_resident()
    eng.run()
    dp = _dp(elev)
    _cmp_store(store, dp, ("elev", "slope", "aspect", "uca", "twi"))
    assert eng.uca_rounds >= 1


def test_engine_device_vs_streaming_identical(tmp_path):
    """The spill-to-HBM fast path and the streaming rounds reach the same
    fixed point bitwise."""
    elev, _a, _u = fixtures.get_test_case(33, 48)
    s1, e1 = _engine(tmp_path / "a", elev, S=16)
    assert e1._fits_device_resident()
    e1.run()
    import os
    os.environ["PYDEM_OOC_DEVICE_CACHE"] = "0"
    try:
        s2, e2 = _engine(tmp_path / "b", elev, S=16)
        e2.run()
    finally:
        del os.environ["PYDEM_OOC_DEVICE_CACHE"]
    np.testing.assert_array_equal(s1["uca"], s2["uca"])
    np.testing.assert_array_equal(s1["twi"], s2["twi"])


def test_sharded_out_of_core_compose(tmp_path):
    """sharded + out-of-core composition (VERDICT r3 #7): the canvases
    shard over the mesh while the host streams S² windows — a canvas
    larger than any single super-block host view, solved on an 8-device
    mesh, equals the single-device result."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    from pydem_tpu.parallel.sharded import make_mesh

    elev, _a, _u = fixtures.get_test_case(33, 64)
    elev = elev[:48, :]  # 48x64 over a 2x4 mesh -> 24x16 shards
    mesh = make_mesh(jax.devices()[:8], shape=(2, 4))

    store, eng = _engine(tmp_path / "mesh", elev, S=16)
    eng.mesh = mesh
    assert eng._fits_device_resident()
    eng.run()

    dp = _dp(elev)
    _cmp_store(store, dp, ("elev", "slope", "aspect", "uca", "twi"))


def test_manager_mesh_out_of_core(tmp_path):
    """ProcessManager(mesh=..., out_of_core=True) end-to-end."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    from pydem_tpu.parallel.sharded import make_mesh

    manager.DEBUG = True
    try:
        chunks = fixtures.mk_test_multifile(33, 32, str(tmp_path),
                                            nx_grid=2, ny_grid=2,
                                            nx_overlap=2, ny_overlap=2)
        mesh = make_mesh(jax.devices()[:8], shape=(2, 4))
        pm = manager.ProcessManager(in_path=chunks, mesh=mesh,
                                    out_of_core=True, superblock=16)
        pm.process_twi()
        elev, _a, _u = fixtures.get_test_case(33, 32)
        dp = _dp(elev)
        got = pm.out_file["uca"]
        ref = np.asarray(dp.uca, "float64")
        assert (np.isnan(ref) == np.isnan(got))[1:-1, 1:-1].all()
        np.testing.assert_array_almost_equal(
            np.nan_to_num(ref)[1:-1, 1:-1], np.nan_to_num(got)[1:-1, 1:-1])
    finally:
        manager.DEBUG = False
