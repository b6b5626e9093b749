"""Cloud-burst worker: claim jobs from the queue, run the pipeline, exit
when drained.

Runnable equivalent of the reference's Lambda handler
(`/root/reference/pydem/aws/handler.py:78-175`) for preemptible TPU/CPU
VMs: start one of these per VM (systemd/instance template restarts it on
boot), point ``--queue`` at shared durable storage, and preemption costs
at most one stage / super-block visit (``resume=True`` everywhere).

Job spec fields (see submit.py):
  in_path        tile directory
  out_path       store path (default <in_path>/results.zarr)
  export         optional GeoTIFF export directory
  out_of_core    bool; superblock size via "superblock"
  dem_proc_kwargs  forwarded DEMProcessor options

Runs locally too — ``submit.py --local-workers N`` fans N of these out as
processes, which is also how the test suite exercises the protocol.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time
import traceback

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from deploy.cloud import jobqueue as q  # noqa: E402


def run_job(name, spec):
    from pydem_tpu.manager import ProcessManager

    kw = dict(in_path=spec["in_path"],
              out_path=spec.get("out_path"),
              dem_proc_kwargs=spec.get("dem_proc_kwargs"),
              resume=True,
              out_of_core=bool(spec.get("out_of_core", False)))
    if spec.get("superblock"):
        kw["superblock"] = int(spec["superblock"])
    if spec.get("_debug"):
        kw["_debug"] = True
    pm = ProcessManager(**kw)
    pm.process_twi()
    if spec.get("export"):
        pm.save_non_overlap_data_geotiff(spec["export"])
    return {"canvas_shape": list(pm.grid_shape),
            "n_tiles": pm.n_inputs,
            "uca_rounds": int(getattr(pm._dp, "uca_sweeps", -1))
            if pm._dp is not None else -1}


def main(argv=None):
    # honor JAX_PLATFORMS even where a sitecustomize force-registers a
    # different PJRT plugin (the env var alone can be overridden)
    if os.environ.get("JAX_PLATFORMS"):
        import jax

        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    ap = argparse.ArgumentParser(description="pydem_tpu cloud-burst worker")
    ap.add_argument("--queue", required=True,
                    help="shared queue directory (durable storage)")
    ap.add_argument("--lease", type=int, default=600,
                    help="claim lease seconds before another worker "
                         "may steal a stalled job")
    ap.add_argument("--poll", type=float, default=10.0,
                    help="idle poll interval")
    ap.add_argument("--drain", action="store_true",
                    help="exit when no work is claimable (default: keep "
                         "polling — VM mode)")
    ap.add_argument("--max-jobs", type=int, default=0,
                    help="exit after N jobs (0 = unlimited)")
    args = ap.parse_args(argv)

    done = 0
    while True:
        got = q.claim_next(args.queue, lease_s=args.lease)
        if got is None:
            if args.drain:
                return 0
            time.sleep(args.poll)
            continue
        name, spec, claim = got
        stop = threading.Event()

        def beat():
            while not stop.wait(min(args.lease / 3.0, 30.0)):
                q.heartbeat(claim)

        t = threading.Thread(target=beat, daemon=True)
        t.start()
        print("[worker %s] job %s: %s" % (q.worker_id(), name,
                                          json.dumps(spec)), flush=True)
        try:
            result = run_job(name, spec)
        except Exception:
            stop.set()
            q.finish(claim, error=traceback.format_exc())
            print("[worker] job %s FAILED" % name, flush=True)
        else:
            stop.set()
            q.finish(claim, result=result)
            print("[worker] job %s done: %s" % (name, result), flush=True)
        done += 1
        if args.max_jobs and done >= args.max_jobs:
            return 0


if __name__ == "__main__":
    sys.exit(main())
