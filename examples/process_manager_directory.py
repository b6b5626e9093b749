"""Process a directory of elevation tiles with ProcessManager.

Counterpart of the reference's ``examples/process_manager_directory.py``
(reference examples/process_manager_directory.py:1-36): discover the tile
grid, run the full pipeline, export de-overlapped GeoTIFFs with overview
pyramids.

Run:  python examples/process_manager_directory.py [tile_dir]
(without an argument, a demo tile directory is generated first)
"""
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# Pick the platform explicitly when PYDEM_PLATFORM is set (e.g. "cpu"):
# some environments pin a default accelerator platform at import time.
import jax  # noqa: E402

if os.environ.get("PYDEM_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["PYDEM_PLATFORM"])

from pydem_tpu import fixtures  # noqa: E402
from pydem_tpu.manager import ProcessManager  # noqa: E402

if len(sys.argv) > 1:
    tile_dir = sys.argv[1]
else:
    work = tempfile.mkdtemp(prefix="pydem_demo_")
    tile_dir = fixtures.mk_test_multifile(33, 64, work, nx_grid=2, ny_grid=2,
                                          nx_overlap=2, ny_overlap=2)
    print("generated demo tiles in", tile_dir)

pm = ProcessManager(
    in_path=tile_dir,
    # resume=True skips stages already present in the store (crash recovery)
    resume=False,
    # out_of_core=True streams S x S super-blocks for domains larger than
    # memory; mesh=... shards the canvas over a TPU mesh
)
pm.process_twi()
written = pm.save_non_overlap_data_geotiff(
    os.path.join(tile_dir, "..", "results_geotiff"))
print("exported:")
for fn in written:
    print(" ", fn)
print("metrics:", os.path.join(pm.out_path, "metrics.json"))
