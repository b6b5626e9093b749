"""Shared 3×3 stencil utilities (shift/pad helpers, neighbor tables).

All terrain kernels in this package are expressed as gather-style 3×3
stencils over the (possibly halo-extended) elevation canvas: slope facets,
flat labeling, and the UCA accumulation sweep all reduce to combinations of
the 8 single-pixel shifts defined here.  This is the TPU-native backbone —
shifts lower to cheap XLA slice/pad ops that fuse into the surrounding
elementwise work, and the same code runs inside ``shard_map`` blocks on
halo-extended shards.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# Neighbor offsets in (di, dj), indexed 0..7 counter-clockwise starting East.
# This matches the Tarboton facet diagram in the reference
# (dem_processing.py:156-182): facet ind uses neighbors e1/e2 drawn from this
# ring.
NEIGHBOR_OFFSETS = (
    (0, 1),    # 0: E
    (-1, 1),   # 1: NE
    (-1, 0),   # 2: N
    (-1, -1),  # 3: NW
    (0, -1),   # 4: W
    (1, -1),   # 5: SW
    (1, 0),    # 6: S
    (1, 1),    # 7: SE
)

OFFSET_INDEX = {off: k for k, off in enumerate(NEIGHBOR_OFFSETS)}

# Tarboton facet table (dem_processing.py:173-182): facet ind -> (e1, e2)
# neighbor offsets, and the angle adjustment (ang_adj, dem_processing.py:184).
FACET_E1 = ((0, 1), (-1, 0), (-1, 0), (0, -1), (0, -1), (1, 0), (1, 0), (0, 1))
FACET_E2 = ((-1, 1), (-1, 1), (-1, -1), (-1, -1), (1, -1), (1, -1), (1, 1), (1, 1))
ANG_ADJ = np.array(
    [[0, 1], [1, -1], [1, 1], [2, -1], [2, 1], [3, -1], [3, 1], [4, -1]]
)


def shift(arr, di, dj, fill=jnp.nan):
    """Value of the neighbor at offset (di, dj): out[i, j] = arr[i+di, j+dj].

    Out-of-bounds positions get ``fill``.
    """
    n, m = arr.shape
    pad = ((max(0, -di), max(0, di)), (max(0, -dj), max(0, dj)))
    p = jnp.pad(arr, pad, constant_values=fill)
    return p[pad[0][1]: pad[0][1] + n, pad[1][1]: pad[1][1] + m]


def scatter_shift(arr, di, dj, fill=0.0):
    """Place arr[i, j] at [i+di, j+dj] (inverse of :func:`shift`)."""
    return shift(arr, -di, -dj, fill=fill)


def neighbor_stack(arr, fill=jnp.nan):
    """(8, n, m) stack of all 8 neighbor values."""
    return jnp.stack([shift(arr, di, dj, fill) for di, dj in NEIGHBOR_OFFSETS])


def min_filter3(arr, include_center=True):
    """3×3 minimum filter (NaN-propagating, like a plain min reduce)."""
    vals = [arr] if include_center else []
    vals += [shift(arr, di, dj, jnp.inf) for di, dj in NEIGHBOR_OFFSETS]
    out = vals[0]
    for v in vals[1:]:
        out = jnp.minimum(out, v)
    return out


def max_filter3(arr, include_center=True, fill=-jnp.inf):
    vals = [arr] if include_center else []
    vals += [shift(arr, di, dj, fill) for di, dj in NEIGHBOR_OFFSETS]
    out = vals[0]
    for v in vals[1:]:
        out = jnp.maximum(out, v)
    return out


def any_neighbor(mask, include_center=False):
    """8-connected dilation step (bool)."""
    vals = [mask] if include_center else []
    vals += [shift(mask, di, dj, False) for di, dj in NEIGHBOR_OFFSETS]
    out = vals[0]
    for v in vals[1:]:
        out = out | v
    return out
