"""f32-regime parity budget (BASELINE.md gate 4; envelope in PARITY.md).

The TPU runs float32; the test suite otherwise forces x64 for exact
reference parity (tests/conftest.py).  This test runs the full chain in the
ACTUAL f32 regime — a subprocess with x64 off — against the f64 reference
on the bundled real tile, asserting the measured deviation envelope of
PARITY.md, and covers the out-of-core engine's float32 storage round-trip
(advisor r3: otherwise only exercised at f64).

Run ``python tests/test_parity_f32.py --measure`` to print the raw
deviation tables PARITY.md is built from.
"""
import json
import os
import subprocess
import sys

import pytest

_RUNNER = r"""
import json, sys, warnings
import jax
jax.config.update("jax_platforms", "cpu")
assert not jax.config.jax_enable_x64  # the f32 regime under test
sys.path.insert(0, %(repo)r); sys.path.insert(0, %(repo)r + "/tools")
import numpy as np
from pydem_tpu import DEMProcessor
from pydem_tpu.io.raw import read_raster
import oracle

g = read_raster(%(repo)r + "/../reference/pydem/test/test_NN032_033_elev.tif")
elev = np.asarray(g.data, "float64")
with warnings.catch_warnings():
    warnings.simplefilter("ignore")
    ref = oracle.reference_processor(elev.copy())
    ref.calc_twi()
    mine = DEMProcessor(elev=elev.copy())
    mine.calc_twi()

out = {}
for f in ("elev", "mag", "direction", "uca", "twi"):
    a = np.asarray(getattr(ref, f), "float64")
    b = np.asarray(getattr(mine, f), "float64")
    ok = np.isfinite(a) & np.isfinite(b)
    rel = np.abs(a[ok] - b[ok]) / np.maximum(np.abs(a[ok]), 1e-30)
    out[f] = {"nan_match": bool((np.isnan(a) == np.isnan(b)).all()),
              "p99": float(np.quantile(rel, 0.99)),
              "max": float(rel.max()),
              "frac_1e3": float((rel > 1e-3).mean())}

# out-of-core f32 storage round-trip vs the in-core f32 result
import tempfile
from pydem_tpu.io.store import ArrayStore
from pydem_tpu.outofcore import OutOfCoreEngine
n = elev.shape[0]
dX = dY = np.ones(n - 1); dX2 = dY2 = np.ones(n)
with warnings.catch_warnings():
    warnings.simplefilter("ignore")
    core = DEMProcessor(elev=elev.copy(), dX=dX, dY=dY, dX2=dX2, dY2=dY2)
    core.calc_twi()
    with tempfile.TemporaryDirectory() as td:
        store = ArrayStore(td + "/s.zarr")
        store.create("elev_src", elev.shape, "float64", chunks=(16, 16),
                     fill=np.nan)
        store.write_window("elev_src", elev, (0, 0))
        eng = OutOfCoreEngine(store, elev.shape, dX, dY, dX2, dY2,
                              superblock=16)
        eng.run()
        ooc_twi = store["twi"]
        ooc_uca = store["uca"]
both = np.isfinite(core.twi) & np.isfinite(ooc_twi)
out["ooc_f32"] = {
    "nan_match": bool((np.isnan(core.uca) == np.isnan(ooc_uca)).all()),
    "twi_max_abs": float(np.abs(core.twi - ooc_twi)[both].max()),
    "uca_rel_p99": float(np.quantile(
        np.abs(core.uca - ooc_uca)[np.isfinite(core.uca)]
        / np.maximum(np.abs(core.uca)[np.isfinite(core.uca)], 1e-30), 0.99)),
    "storage_dtype": str(np.asarray(ooc_uca).dtype)}
print("PARITY_JSON:" + json.dumps(out))
"""


def _run_f32(repo):
    env = dict(os.environ)
    env.pop("JAX_ENABLE_X64", None)
    env["XLA_FLAGS"] = ""
    p = subprocess.run(
        [sys.executable, "-c", _RUNNER % {"repo": repo}],
        capture_output=True, text=True, env=env, timeout=900)
    assert p.returncode == 0, p.stderr[-4000:]
    line = [ln for ln in p.stdout.splitlines()
            if ln.startswith("PARITY_JSON:")][-1]
    return json.loads(line[len("PARITY_JSON:"):])


def test_f32_envelope():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if not os.path.exists(os.path.join(
            repo, "..", "reference", "pydem", "test",
            "test_NN032_033_elev.tif")):
        pytest.skip("bundled reference tile not available")
    out = _run_f32(repo)

    for f in ("elev", "mag", "direction", "uca", "twi"):
        assert out[f]["nan_match"], f

    # PARITY.md asserted envelope (~2x headroom over measured)
    assert out["elev"]["max"] == 0.0
    assert out["mag"]["p99"] < 1e-5
    assert out["direction"]["p99"] < 1e-4
    assert out["direction"]["frac_1e3"] < 0.02  # facet-flip fraction
    assert out["uca"]["p99"] < 0.25
    assert out["twi"]["p99"] < 0.06

    # f32 storage round-trip of the out-of-core engine
    ooc = out["ooc_f32"]
    assert ooc["storage_dtype"] == "float32"
    assert ooc["nan_match"]
    assert ooc["uca_rel_p99"] < 1e-3


if __name__ == "__main__":
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    print(json.dumps(_run_f32(repo), indent=1))
