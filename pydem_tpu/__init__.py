"""pydem_tpu — TPU-native terrain-hydrology stencil engine.

A from-scratch JAX/XLA/Pallas framework with the capabilities of pyDEM
(creare-com/pydem): D-infinity slope magnitude/direction, elevation
conditioning (flat filling, pit draining), upstream contributing area, and
topographic wetness index — over single rasters or sharded multi-chip
canvases.
"""
__version__ = "0.1.0"

from .api import DEMProcessor  # noqa: F401
from . import fixtures, geometry  # noqa: F401
