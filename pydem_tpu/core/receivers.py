"""Flow splitting: direction angle → receiver weights.

Replaces the reference's section/proportion + scipy.sparse adjacency matrix
(``/root/reference/pydem/dem_processing.py:1021-1267``) with a dense,
TPU-friendly representation: 8 per-neighbor weight planes ``W[k]`` where
``W[k][i, j]`` is the fraction of pixel (i, j)'s accumulated area sent to the
neighbor at ``NEIGHBOR_OFFSETS[k]``.  Every pixel has at most two nonzero
entries (the D∞ facet pair); pit/flat drains to non-adjacent pixels are
carried separately as sparse index triples (see ``core.uca``).

The adjacency-pruning rules of dem_processing.py:1126-1141 are applied per
entry: drop NaN proportions (flats), drop weights ≤ 1e-8, drop out-of-grid
receivers (the reference's per-edge/corner section subsets at :1182-1265 are
exactly "both receiver pixels in-grid"), and drop uphill edges
(keep only ``elev[receiver] <= elev[sender]``) so floating-point ties cannot
create circular references.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .stencil import ANG_ADJ, FACET_E1, FACET_E2, OFFSET_INDEX, shift

FLAT_ID_INT = -1


def section_theta(dX, dY, n):
    """The per-row facet-opening angle used by section/proportion.

    Reproduces the fence→post padding of dem_processing.py:1031-1033: theta is
    computed on interior fence rows (index 0..n-3) and replicated at the top
    and bottom rows, i.e. ``theta_full[i] = atan2(dY, dX)[clip(i-1, 0, n-3)]``.
    """
    t = jnp.arctan2(dY[: n - 2], dX[: n - 2])
    i = jnp.arange(n)
    return t[jnp.clip(i - 1, 0, n - 3)][:, None]


def section_proportion(direction, flats, dX=None, dY=None, theta=None):
    """Facet index (0-7) and straight-neighbor proportion per pixel.

    Functional port of ``_calc_uca_section_proportion``
    (dem_processing.py:1021-1070); flats get section -1 / proportion NaN.

    ``theta`` optionally supplies the per-row facet angle directly (length-n
    vector) — used by windowed callers, whose rows need the *global* row
    angles rather than the window-local fence clipping of
    :func:`section_theta`.
    """
    n, m = direction.shape
    if theta is None:
        theta = section_theta(dX, dY, n)
    else:
        theta = jnp.asarray(theta, direction.dtype).reshape(n, 1)
    theta = jnp.broadcast_to(theta, (n, m))
    pi = np.pi

    quad_idx = jnp.floor(direction / pi * 2.0).astype(jnp.int32)
    quadrant = direction - quad_idx.astype(direction.dtype) * (pi / 2.0)

    even = quad_idx % 2 == 0
    section = (
        quad_idx * 2
        + ((quadrant > theta) & even).astype(jnp.int32)
        + ((quadrant > (pi / 2 - theta)) & ~even).astype(jnp.int32)
    )

    proportion = jnp.full(direction.shape, jnp.nan, direction.dtype)
    I1 = (section == 0) | (section == 1) | (section == 4) | (section == 5)
    proportion = jnp.where(I1 & (quadrant <= theta), quadrant / theta, proportion)
    proportion = jnp.where(
        I1 & (quadrant > theta), (quadrant - theta) / (pi / 2 - theta), proportion
    )
    proportion = jnp.where(
        ~I1 & (quadrant <= (pi / 2 - theta)), quadrant / (pi / 2 - theta), proportion
    )
    proportion = jnp.where(
        ~I1 & (quadrant > (pi / 2 - theta)),
        (quadrant - (pi / 2 - theta)) / theta,
        proportion,
    )

    section = jnp.where(flats, FLAT_ID_INT, section)
    proportion = jnp.where(flats, jnp.nan, proportion)
    section = jnp.where(section == 8, 0, section)

    adjust = jnp.asarray(ANG_ADJ[:, 1], direction.dtype)[section]
    proportion = (1 + adjust) / 2.0 - adjust * proportion
    return section, proportion


def receiver_weights(section, proportion, elev, prune_uphill=True):
    """Dense (8, n, m) receiver weight planes from section/proportion.

    Entry pruning per dem_processing.py:1126-1141.  ``W[k][p] > 0`` implies
    the neighbor at offset k is in-grid and at elevation <= elev[p].
    """
    W = [jnp.zeros(elev.shape, elev.dtype) for _ in range(8)]
    for s in range(8):
        on = section == s
        for e_off, w in ((FACET_E1[s], proportion), (FACET_E2[s], 1.0 - proportion)):
            k = OFFSET_INDEX[e_off]
            target_elev = shift(elev, *e_off)  # NaN outside the grid
            keep = on & (w > 1e-8)
            if prune_uphill:
                keep = keep & (target_elev <= elev)
            W[k] = W[k] + jnp.where(keep, w, 0.0)
    return jnp.stack(W)
