"""pydem_tpu — TPU-native terrain-hydrology stencil engine.

A from-scratch JAX/XLA/Pallas framework with the capabilities of pyDEM
(creare-com/pydem): D-infinity slope magnitude/direction, elevation
conditioning (flat filling, pit draining), upstream contributing area, and
topographic wetness index — over single rasters or sharded multi-chip
canvases.
"""
__version__ = "0.1.0"

from .api import DEMProcessor  # noqa: F401
from . import fixtures, geometry, utils  # noqa: F401

# reference-compatible module aliases (pydem exposes process_manager and
# utils_test_pydem at the package root, reference __init__.py:16-18)
from . import manager as process_manager  # noqa: F401
utils_test_pydem = fixtures
