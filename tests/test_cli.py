"""CLI smoke tests: the working versions of the reference's (stale) console
entry points (commandline_utils.py:18,56,100 — TWIDinf / AreaDinf /
DinfFlowDir) run end to end on a real GeoTIFF."""
import os

import numpy as np

from pydem_tpu import cli, fixtures
from pydem_tpu.geometry import mk_transform
from pydem_tpu.io import read_geotiff, write_geotiff


def _mk_tile(tmp_path, n=16):
    elev, _ang, _uca = fixtures.get_test_case(33, n)
    fn = str(tmp_path / "elev.tif")
    transform = mk_transform(1.0, -1.0, 2.0 / n, 2.0 / n)
    write_geotiff(fn, np.asarray(elev, "float64"), transform)
    return fn


def test_twi_dinf(tmp_path):
    fn = _mk_tile(tmp_path)
    cli.main(["TWIDinf", fn, str(tmp_path / "out")])
    g = read_geotiff(str(tmp_path / "out_twi.tif"))
    assert g.data.shape == (16, 16)
    finite = g.data[g.data != -9999]
    assert np.isfinite(finite).any()


def test_area_dinf(tmp_path):
    fn = _mk_tile(tmp_path)
    cli.main(["AreaDinf", fn, str(tmp_path / "out")])
    g = read_geotiff(str(tmp_path / "out_uca.tif"))
    assert np.nanmax(g.data) > 1  # area accumulated somewhere


def test_dinf_flow_dir(tmp_path):
    fn = _mk_tile(tmp_path)
    cli.main(["DinfFlowDir", fn, str(tmp_path / "out")])
    g = read_geotiff(str(tmp_path / "out_ang.tif"))
    finite = g.data[np.isfinite(g.data) & (g.data >= 0)]
    assert finite.size and finite.max() <= 2 * np.pi + 1e-6


def test_unknown_command():
    assert cli.main(["NoSuchCmd"]) != 0


def test_deploy_golden_check():
    """The deploy golden regression (deploy/golden_check.py, run inside the
    Docker image at build time) also passes in this environment."""
    import subprocess
    import sys

    r = subprocess.run(
        [sys.executable, "deploy/golden_check.py"],
        cwd=os.path.join(os.path.dirname(__file__), ".."),
        capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stdout + r.stderr


def test_process_cli_out_of_core_resume_flags(tmp_path):
    """`process --out-of-core --resume` flags drive the OOC engine and
    crash-resume machinery (the docs/CLOUD.md recipe's exact invocation)."""
    from pydem_tpu import fixtures, manager
    from pydem_tpu.cli import process

    manager.DEBUG = True
    try:
        chunks = fixtures.mk_test_multifile(33, 32, str(tmp_path),
                                            nx_grid=2, ny_grid=2,
                                            nx_overlap=2, ny_overlap=2)
        out = str(tmp_path / "out")
        rc = process([chunks, "--out", out, "--out-of-core",
                      "--superblock", "16", "--resume"])
        assert rc in (0, None)
        import os

        assert os.path.exists(os.path.join(out, "twi.tif"))
        # resume rerun: no recompute of finished stages, same result
        rc = process([chunks, "--out", out, "--out-of-core",
                      "--superblock", "16", "--resume"])
        assert rc in (0, None)
    finally:
        manager.DEBUG = False
