"""Topographic wetness index (dem_processing.py:1647-1677)."""
from __future__ import annotations

import jax.numpy as jnp


def twi(uca, mag, min_area, min_slope=1e-3, saturation_limit=32,
        cap_uca=False, cap_twi=False):
    """TWI = ln(uca / (mag + min_slope)); returns the ×10-scaled array the
    reference stores (dem_processing.py:1674)."""
    u = uca
    if cap_uca:
        u = jnp.minimum(u, saturation_limit * min_area)
    t = jnp.log(u / (mag + min_slope))
    if cap_twi:
        t = jnp.minimum(t, jnp.log(saturation_limit * min_area / min_slope))
    return t * 10
