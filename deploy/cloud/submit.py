"""Enqueue pydem_tpu jobs and (optionally) run local workers.

The runnable replacement for the reference's ``aws/mk_dist.py`` +
``aws/handler.py`` pair: instead of zip-packing a Lambda per tile, each
job is a region (tile directory) processed end-to-end with resume; the
queue is plain files on shared storage (deploy/cloud/jobqueue.py), workers
are ``worker.py`` processes on preemptible VMs — or local processes via
``--local-workers`` (the test/dev mode).

Examples::

  # enqueue every region under /data/regions/* and process with 4 local
  # worker processes
  python deploy/cloud/submit.py --queue /data/q /data/regions/* \
      --export-root /data/out --local-workers 4

  # enqueue only; preemptible VMs run worker.py against the same queue
  python deploy/cloud/submit.py --queue /data/q /data/regions/* --out-of-core

  # queue status
  python deploy/cloud/submit.py --queue /data/q --status
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import zlib

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from deploy.cloud import jobqueue as q  # noqa: E402


def main(argv=None):
    ap = argparse.ArgumentParser(description="pydem_tpu cloud-burst submit")
    ap.add_argument("--queue", required=True)
    ap.add_argument("regions", nargs="*",
                    help="tile directories, one job each")
    ap.add_argument("--export-root", default=None,
                    help="write GeoTIFF exports under <root>/<region>")
    ap.add_argument("--out-of-core", action="store_true")
    ap.add_argument("--superblock", type=int, default=None)
    ap.add_argument("--dem-proc-kwargs", default=None,
                    help="JSON dict forwarded to DEMProcessor")
    ap.add_argument("--local-workers", type=int, default=0,
                    help="run N worker.py processes to drain the queue "
                         "(dev/test mode; VMs run worker.py themselves)")
    ap.add_argument("--lease", type=int, default=600)
    ap.add_argument("--status", action="store_true")
    ap.add_argument("--debug-unit-pixels", action="store_true",
                    help=argparse.SUPPRESS)  # test hook (manager._debug)
    args = ap.parse_args(argv)

    if args.status:
        print(json.dumps(q.status(args.queue), indent=1))
        return 0

    n_new = 0
    for region in args.regions:
        region = os.path.abspath(region)
        name = "%s-%08x" % (os.path.basename(region.rstrip("/")),
                            zlib.crc32(region.encode()))
        spec = {"in_path": region,
                "out_of_core": bool(args.out_of_core)}
        if args.superblock:
            spec["superblock"] = args.superblock
        if args.export_root:
            spec["export"] = os.path.join(args.export_root, name)
        if args.dem_proc_kwargs:
            spec["dem_proc_kwargs"] = json.loads(args.dem_proc_kwargs)
        if args.debug_unit_pixels:
            spec["_debug"] = True
        n_new += bool(q.submit(args.queue, name, spec))
    print("enqueued %d job(s); queue: %s"
          % (n_new, json.dumps({k: len(v)
                                for k, v in q.status(args.queue).items()})))

    if args.local_workers:
        worker = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "worker.py")
        procs = [subprocess.Popen(
            [sys.executable, worker, "--queue", args.queue, "--drain",
             "--lease", str(args.lease)])
            for _ in range(args.local_workers)]
        rc = 0
        for p in procs:
            rc |= p.wait()
        print(json.dumps(q.status(args.queue), indent=1))
        return rc
    return 0


if __name__ == "__main__":
    sys.exit(main())
