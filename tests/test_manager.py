"""Multi-tile pipeline equivalence — the reference's TestMultiFileEndToEnd
pattern (test_end_to_end.py:26-149): split a 32² cone into overlapping tile
grids, run the full ProcessManager pipeline, and require the mosaic UCA to
equal the single-array UCA on the interior."""
import numpy as np
import pytest

from pydem_tpu import DEMProcessor, fixtures, manager

TEST_NUM = 33
NN = 32


@pytest.fixture(scope="module")
def single_uca():
    elev, _a, _u = fixtures.get_test_case(TEST_NUM, NN)
    dp = DEMProcessor(elev=elev, dX=np.ones(NN - 1), dY=np.ones(NN - 1),
                      dX2=np.ones(NN), dY2=np.ones(NN))
    dp.calc_twi()
    return dp


@pytest.mark.parametrize("nx,ny,overlap", [
    (3, 3, 2), (5, 4, 2), (5, 4, 3), (3, 3, 1), (3, 4, 1),
])
def test_multifile_equivalence(tmp_path, single_uca, nx, ny, overlap):
    manager.DEBUG = True
    try:
        chunks = fixtures.mk_test_multifile(
            TEST_NUM, NN, str(tmp_path), nx_grid=nx, ny_grid=ny,
            nx_overlap=overlap, ny_overlap=overlap)
        pm = manager.ProcessManager(in_path=chunks, n_workers=1)
        pm.process_twi()
        pm.save_non_overlap_data()
        assert pm.out_file_noverlap["uca"].shape == (NN, NN)
        np.testing.assert_array_almost_equal(
            single_uca.uca[1:-1, 1:-1],
            pm.out_file_noverlap["uca"][1:-1, 1:-1])
    finally:
        manager.DEBUG = False


def test_geotiff_export_and_overviews(tmp_path, single_uca):
    manager.DEBUG = True
    try:
        chunks = fixtures.mk_test_multifile(TEST_NUM, NN, str(tmp_path),
                                            nx_grid=2, ny_grid=2,
                                            nx_overlap=2, ny_overlap=2)
        pm = manager.ProcessManager(in_path=chunks, n_workers=1)
        pm.process_twi()
        written = pm.save_non_overlap_data_geotiff(str(tmp_path / "out"))
        assert any(f.endswith("twi.tif") for f in written)
        from pydem_tpu.io import read_geotiff
        g = read_geotiff(str(tmp_path / "out" / "uca.tif"))
        ref = pm.out_file["uca"].astype("float32")
        nod = np.isnan(ref)  # streaming writer stores nodata for NaN
        assert np.allclose(np.where(nod, 0, g.data), np.where(nod, 0, ref))
        assert np.all(g.data[nod] == np.float32(-9999.0))
        # overview pyramid is embedded as subsequent IFDs (factor 3 first)
        ov = read_geotiff(str(tmp_path / "out" / "uca.tif"), ifd_index=1)
        assert ov.shape[0] == g.shape[0] // 3
        pm.process_overviews(keys=("twi",))
        assert "twi_3" in pm.out_file
    finally:
        manager.DEBUG = False


# -- grid-discovery robustness (reference process_manager.py:517-565) --------

def _write_tile(path, name, block, lat_top, lon_left, pitch):
    from pydem_tpu.geometry import mk_transform
    from pydem_tpu.io.geotiff import write_geotiff
    transform = mk_transform(lat_top, lon_left, -pitch, pitch,
                             lat_lon_centered=False)
    fn = str(path / name)
    write_geotiff(fn, block, transform)
    return fn


def _tile_grid(path, elev, n_tiles=2, pitch=0.01, jitter=0.0, rng=None):
    """Split ``elev`` into an n x n tile grid with optionally float-jittered
    corner coordinates."""
    n = elev.shape[0]
    step = n // n_tiles
    for ti in range(n_tiles):
        for tj in range(n_tiles):
            block = elev[ti * step:(ti + 1) * step,
                         tj * step:(tj + 1) * step]
            top = 46.0 - ti * step * pitch
            left = -73.0 + tj * step * pitch
            if jitter and rng is not None:
                top += rng.uniform(-jitter, jitter)
                left += rng.uniform(-jitter, jitter)
            _write_tile(path, "t_%d_%d.tif" % (ti, tj), block, top, left,
                        pitch)


def test_grid_jittered_bounds_snap(tmp_path):
    """Float-jittered tile corners (well under a pixel) must snap onto the
    same mosaic as exact corners (grid_round_decimals snapping,
    process_manager.py:517-521)."""
    rng = np.random.RandomState(0)
    elev, _a, _u = fixtures.get_test_case(TEST_NUM, NN)
    exact = tmp_path / "exact"
    jit = tmp_path / "jit"
    exact.mkdir(), jit.mkdir()
    _tile_grid(exact, elev)
    _tile_grid(jit, elev, jitter=1e-5, rng=rng)  # ~1e-3 px at pitch 0.01
    pm0 = manager.ProcessManager(in_path=str(exact))
    pm1 = manager.ProcessManager(in_path=str(jit))
    assert pm0.compute_grid() == pm1.compute_grid() == (NN, NN)
    assert [s for s in pm0.grid_slice] == [s for s in pm1.grid_slice]
    np.testing.assert_array_equal(pm0._mosaic_elev(), pm1._mosaic_elev())


def test_grid_pitch_mismatch_raises(tmp_path):
    elev, _a, _u = fixtures.get_test_case(TEST_NUM, NN)
    _tile_grid(tmp_path, elev)
    # one tile with a different pixel pitch
    _write_tile(tmp_path, "t_bad.tif", elev[:16, :16], 44.0, -73.0, 0.02)
    pm = manager.ProcessManager(in_path=str(tmp_path))
    with pytest.raises(ValueError, match="pixel pitch"):
        pm.compute_grid()


def test_grid_inconsistent_shape_raises(tmp_path):
    """Tiles sharing a grid row must agree on nrows (the reference's
    asserts at :537-545) — and the error must say which files clash."""
    elev, _a, _u = fixtures.get_test_case(TEST_NUM, NN)
    _tile_grid(tmp_path, elev)
    # same grid row as t_0_*, but 3 rows shorter
    _write_tile(tmp_path, "t_short.tif", elev[:13, :16], 46.0,
                -73.0 + 2 * 16 * 0.01, 0.01)
    pm = manager.ProcessManager(in_path=str(tmp_path))
    with pytest.raises(ValueError, match="rows"):
        pm.compute_grid()


def test_grid_duplicate_cell_raises(tmp_path):
    elev, _a, _u = fixtures.get_test_case(TEST_NUM, NN)
    _tile_grid(tmp_path, elev)
    _write_tile(tmp_path, "t_dup.tif", elev[:16, :16], 46.0, -73.0, 0.01)
    pm = manager.ProcessManager(in_path=str(tmp_path))
    with pytest.raises(ValueError, match="same grid cell"):
        pm.compute_grid()


def test_grid_off_pixel_alignment_raises(tmp_path):
    """A tile offset by a fraction of a pixel from the mosaic grid must be
    rejected, not silently rounded onto the wrong cell."""
    elev, _a, _u = fixtures.get_test_case(TEST_NUM, NN)
    _tile_grid(tmp_path, elev)
    # offset by 0.4 px in lon; snaps into its own grid column
    _write_tile(tmp_path, "t_misaligned.tif", elev[:16, :16], 46.0 - 16 * 0.01,
                -73.0 + (2 * 16 + 0.4) * 0.01, 0.01)
    pm = manager.ProcessManager(in_path=str(tmp_path), grid_round_decimals=6)
    with pytest.raises(ValueError, match="aligned"):
        pm.compute_grid()


def test_mosaic_overlap_disagreement_warns(tmp_path):
    elev, _a, _u = fixtures.get_test_case(TEST_NUM, NN)
    _tile_grid(tmp_path, elev)
    # overlapping tile whose data disagrees with the base grid
    _write_tile(tmp_path, "t_overlap.tif", elev[:16, :16] + 1.0,
                46.0 - 8 * 0.01, -73.0 + 8 * 0.01, 0.01)
    pm = manager.ProcessManager(in_path=str(tmp_path))
    pm.compute_grid()
    with pytest.warns(UserWarning, match="disagree"):
        pm._mosaic_elev()


def test_crash_midstage_resume_bitidentical(tmp_path):
    """Fault isolation (reference process_manager.py:69-70,998-999,
    1274-1275): a stage exception is captured with its traceback into
    errors.json, the per-stage success columns stay honest, and a
    resume=True rerun continues from the stored stages to a bit-identical
    result."""
    import json

    from pydem_tpu import api

    manager.DEBUG = True
    try:
        chunks = fixtures.mk_test_multifile(TEST_NUM, NN, str(tmp_path),
                                            nx_grid=2, ny_grid=2,
                                            nx_overlap=2, ny_overlap=2)
        # clean run for the golden result
        clean_dir = str(tmp_path / "clean.zarr")
        pm0 = manager.ProcessManager(in_path=chunks, out_path=clean_dir)
        golden = np.array(pm0.process_twi())

        # crashing run: UCA raises mid-pipeline
        out_dir = str(tmp_path / "crashy.zarr")
        pm1 = manager.ProcessManager(in_path=chunks, out_path=out_dir)
        orig = api.DEMProcessor.calc_uca

        def boom(self, *a, **k):
            raise RuntimeError("injected UCA crash")

        api.DEMProcessor.calc_uca = boom
        try:
            with pytest.raises(RuntimeError, match="injected"):
                pm1.process_twi()
        finally:
            api.DEMProcessor.calc_uca = orig

        # bookkeeping is honest: elevation+aspect_slope succeeded, uca/twi
        # did not; the traceback is captured
        s = pm1.out_file["success"]
        assert s.shape[1] == 4
        assert s[:, 0].all() and s[:, 1].all()
        assert not s[:, 2].any() and not s[:, 3].any()
        with open(str(tmp_path / "crashy.zarr" / "errors.json")) as f:
            errs = json.load(f)
        assert errs[-1]["stage"] == "uca"
        assert "injected UCA crash" in errs[-1]["traceback"]

        # resume: redoes only uca+twi, reaching the clean result bitwise
        pm2 = manager.ProcessManager(in_path=chunks, out_path=out_dir,
                                     resume=True)
        twi = np.array(pm2.process_twi())
        np.testing.assert_array_equal(golden, twi)
        assert pm2.out_file["success"].all()
    finally:
        manager.DEBUG = False
