#!/usr/bin/env python
"""Environment-reproducibility golden regression for the shipped image.

Mirror of the reference's in-container golden test
(``/root/reference/pydem/test/test_docker_container.py:19-62``): run the
full ProcessManager pipeline on a deterministic input raster and compare
every exported GeoTIFF BITWISE against the goldens committed in
``deploy/goldens/``.  Any toolchain/numerics drift in the image (jax, XLA
CPU codegen, numpy, zlib) shows up as a byte diff.

Usage:
    python deploy/golden_check.py            # verify (exit 1 on mismatch)
    python deploy/golden_check.py --write    # (re)generate the goldens

The input tile is generated from the deterministic analytic fixture
generator (case 33, a geodesically-scaled cone at 64²) — self-contained, no
external data.  The Dockerfile runs the verify mode at build time.
"""
from __future__ import annotations

import argparse
import os
import shutil
import sys
import tempfile

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))  # repo checkout without install
GOLDEN_DIR = os.path.join(HERE, "goldens")
KEYS = ("elev", "aspect", "slope", "uca", "twi")


def _setup_jax():
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)


def run_pipeline(workdir):
    """Deterministic tile -> full pipeline -> exported GeoTIFF dir."""
    import warnings

    from pydem_tpu import fixtures
    from pydem_tpu.manager import ProcessManager

    tiles = fixtures.mk_test_multifile(33, 64, workdir, nx_grid=2, ny_grid=2,
                                       nx_overlap=2, ny_overlap=2)
    out = os.path.join(workdir, "results_geotiff")
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        pm = ProcessManager(in_path=tiles,
                            out_path=os.path.join(workdir, "results.zarr"))
        pm.process_twi()
        pm.save_non_overlap_data_geotiff(out)
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--write", action="store_true",
                    help="(re)generate the goldens instead of verifying")
    args = ap.parse_args(argv)

    _setup_jax()
    work = tempfile.mkdtemp(prefix="pydem_golden_")
    try:
        out = run_pipeline(work)
        if args.write:
            os.makedirs(GOLDEN_DIR, exist_ok=True)
            for key in KEYS:
                shutil.copy(os.path.join(out, key + ".tif"),
                            os.path.join(GOLDEN_DIR, key + ".tif"))
            print("goldens written to", GOLDEN_DIR)
            return 0

        import numpy as np

        from pydem_tpu.io import read_geotiff

        failed = []
        for key in KEYS:
            got_fn = os.path.join(out, key + ".tif")
            exp_fn = os.path.join(GOLDEN_DIR, key + ".tif")
            with open(got_fn, "rb") as f:
                got_bytes = f.read()
            with open(exp_fn, "rb") as f:
                exp_bytes = f.read()
            if got_bytes == exp_bytes:
                print("OK (bitwise)  %s" % key)
                continue
            # bytes differ: decode and report whether the VALUES differ
            got = read_geotiff(got_fn).data
            exp = read_geotiff(exp_fn).data
            if np.array_equal(got, exp):
                print("OK (values; container bytes differ)  %s" % key)
            else:
                bad = int((got != exp).sum())
                print("MISMATCH  %s: %d px differ (max |d| = %g)"
                      % (key, bad,
                         float(np.nanmax(np.abs(got.astype("f8")
                                                - exp.astype("f8"))))))
                failed.append(key)
        if failed:
            print("GOLDEN CHECK FAILED:", ", ".join(failed))
            return 1
        print("golden check passed")
        return 0
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
