"""Cloud-burst queue/worker protocol (deploy/cloud): runnable replacement
for the reference's aws/ Lambda scaffolding (aws/handler.py, mk_dist.py).

Covers: enqueue idempotence, multi-process draining, preemption (stale
lease steal) resuming to the correct result."""
import json
import os
import subprocess
import sys
import time

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from deploy.cloud import jobqueue as q  # noqa: E402
from pydem_tpu import DEMProcessor, fixtures  # noqa: E402


def _mk_region(tmp_path, name, testnum=33, NN=32):
    d = fixtures.mk_test_multifile(testnum, NN, str(tmp_path / name),
                                   nx_grid=2, ny_grid=2,
                                   nx_overlap=2, ny_overlap=2)
    return d


def _golden(NN=32):
    elev, _a, _u = fixtures.get_test_case(33, NN)
    dp = DEMProcessor(elev=elev, dX=np.ones(NN - 1), dY=np.ones(NN - 1),
                      dX2=np.ones(NN), dY2=np.ones(NN))
    dp.calc_twi()
    return dp


def test_queue_protocol(tmp_path):
    queue = str(tmp_path / "q")
    assert q.submit(queue, "a", {"x": 1})
    assert not q.submit(queue, "a", {"x": 2})  # idempotent
    got = q.claim_next(queue)
    assert got is not None and got[0] == "a" and got[1] == {"x": 1}
    # claimed: not claimable again within the lease
    assert q.claim_next(queue, lease_s=600) is None
    # stale lease -> stealable
    os.utime(got[2], (time.time() - 1e4, time.time() - 1e4))
    stolen = q.claim_next(queue, lease_s=600)
    assert stolen is not None and stolen[0] == "a"
    q.finish(stolen[2], result={"ok": True})
    st = q.status(queue)
    assert st["done"] == ["a"] and not st["pending"] and not st["claimed"]


def test_submit_and_local_workers_end_to_end(tmp_path):
    regions = [_mk_region(tmp_path, "r1"), _mk_region(tmp_path, "r2")]
    queue = str(tmp_path / "q")
    submit = os.path.join(REPO, "deploy", "cloud", "submit.py")
    p = subprocess.run(
        [sys.executable, submit, "--queue", queue, *regions,
         "--local-workers", "2", "--debug-unit-pixels"],
        capture_output=True, text=True, timeout=600,
        env={**os.environ, "JAX_PLATFORMS": "cpu",
             "JAX_ENABLE_X64": "1"})
    assert p.returncode == 0, p.stdout + p.stderr
    st = q.status(queue)
    assert len(st["done"]) == 2 and not st["failed"], st

    golden = _golden()
    from pydem_tpu.io.store import ArrayStore
    for r in regions:
        uca = ArrayStore(os.path.join(r, "results.zarr"))["uca"]
        np.testing.assert_array_almost_equal(
            np.nan_to_num(golden.uca)[1:-1, 1:-1],
            np.nan_to_num(uca)[1:-1, 1:-1])


def test_worker_resumes_preempted_job(tmp_path):
    """A job claimed by a dead worker is stolen after the lease and the
    store's resume machinery finishes it to the golden result."""
    region = _mk_region(tmp_path, "r1")
    queue = str(tmp_path / "q")
    assert q.submit(queue, "r1", {"in_path": region, "_debug": True})

    # fake a preempted worker: claim, partially run (elevation only), die
    got = q.claim_next(queue)
    name, spec, claim = got
    from pydem_tpu.manager import ProcessManager
    pm = ProcessManager(in_path=region, resume=True, _debug=True)
    pm.compute_grid()
    pm._success_init()
    pm._stage_guarded("elevation", pm.process_elevation)
    os.utime(claim, (time.time() - 1e4, time.time() - 1e4))  # lease expires

    worker = os.path.join(REPO, "deploy", "cloud", "worker.py")
    p = subprocess.run(
        [sys.executable, worker, "--queue", queue, "--drain",
         "--lease", "600"],
        capture_output=True, text=True, timeout=600,
        env={**os.environ, "JAX_PLATFORMS": "cpu",
             "JAX_ENABLE_X64": "1"})
    assert p.returncode == 0, p.stdout + p.stderr
    assert q.status(queue)["done"] == ["r1"]

    golden = _golden()
    from pydem_tpu.io.store import ArrayStore
    uca = ArrayStore(os.path.join(region, "results.zarr"))["uca"]
    np.testing.assert_array_almost_equal(
        np.nan_to_num(golden.uca)[1:-1, 1:-1],
        np.nan_to_num(uca)[1:-1, 1:-1])
