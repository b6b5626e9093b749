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
        assert any("ovr3" in f for f in written)
        from pydem_tpu.io import read_geotiff
        g = read_geotiff(str(tmp_path / "out" / "uca.tif"))
        ref = pm.out_file["uca"].astype("float32")
        both_nan = np.isnan(g.data) & np.isnan(ref)
        assert np.allclose(np.where(both_nan, 0, g.data),
                           np.where(both_nan, 0, ref))
        pm.process_overviews(keys=("twi",))
        assert "twi_3" in pm.out_file
    finally:
        manager.DEBUG = False
