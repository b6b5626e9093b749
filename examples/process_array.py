"""Process an in-memory elevation array end to end.

Counterpart of the reference's ``examples/process_array.py`` (reference
examples/process_array.py:1-50): build a DEMProcessor from a numpy array,
run slope/aspect -> UCA -> TWI, and plot/save the results.

Run:  python examples/process_array.py
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# Pick the platform explicitly when PYDEM_PLATFORM is set (e.g. "cpu"):
# some environments pin a default accelerator platform at import time.
import jax  # noqa: E402

if os.environ.get("PYDEM_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["PYDEM_PLATFORM"])

from pydem_tpu import DEMProcessor  # noqa: E402

# a synthetic cone with quantization flats — swap in your own DEM array
n = 256
x, y = np.mgrid[-1:1:complex(0, n), -1:1:complex(0, n)]
elev = np.round((1 - np.sqrt(x**2 + y**2)) * 50) / 50 + 0.05

# dX/dY: pixel sizes in meters (scalars or per-row arrays).  Constructing
# from a GeoTIFF instead (DEMProcessor(elev_fn="tile.tif")) derives
# per-row geodesic sizes from the raster CRS automatically.
dp = DEMProcessor(elev=elev, dX=30.0, dY=30.0)

mag, aspect = dp.calc_slopes_directions()
uca = dp.calc_uca()
twi = dp.calc_twi()

print("slope    min/max: %.4f / %.4f" % (np.nanmin(mag), np.nanmax(mag)))
print("uca      min/max: %.1f / %.1f" % (np.nanmin(uca), np.nanmax(uca)))
print("twi      min/max: %.2f / %.2f" % (np.nanmin(twi), np.nanmax(twi)))

# persistence (reference dem_processing.py:260-303 conventions)
dp.save_array("example_uca", "uca")
print("saved example_uca.npz")
os.remove("example_uca.npz")
