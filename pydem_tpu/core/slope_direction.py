"""D-infinity (Tarboton) slope magnitude and flow direction.

TPU-native re-formulation of the reference's facet sweep
(``/root/reference/pydem/dem_processing.py:1753-1991``).  The reference walks
9 separate region loops (interior, 4 edges, 4 corners) with per-region facet
subsets and numpy fancy-indexing; here the whole grid is processed by one
vectorized 8-facet sweep over NaN-padded neighbor shifts, with the edge /
corner facet subsets expressed as static region masks.  Everything is
jit-compatible, dtype-polymorphic (f64 on CPU for exact parity, f32 on TPU),
and runs unchanged on halo-extended shards inside ``shard_map``.

Region facet subsets (facet is valid iff both its neighbors are in-grid):

==========  ==================
region      facets (slope calc)
==========  ==================
interior    0-7
left col    0, 1, 6, 7
right col   2, 3, 4, 5
top row     4, 5, 6, 7
bottom row  0, 1, 2, 3
TL corner   6, 7
TR corner   4, 5
BL corner   0, 1
BR corner   2, 3
==========  ==================

(matching dem_processing.py:1800-1899), plus the sequential
"upstream-facing edges copy the interior value" steps
(dem_processing.py:1782-1795), which are order-dependent and reproduced in
the same left → right → top → bottom sequence.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .stencil import ANG_ADJ, FACET_E1, FACET_E2, shift

FLAT_ID_INT = -1

# facet -> which groups of d1/d2 assignment (dem_processing.py:1905-1938):
# for facets 0,3,4,7 d1 runs along X (d1=dX, d2=dY); for 1,2,5,6 swapped.
_D1_IS_DX = (True, False, False, True, True, False, False, True)
# facet -> whether its diagonal neighbor (e2 for 0,3,4,7 / e1 for 1,2,5,6)
# points up (-1) or down (+1); selects the 'fence' row: up -> dX[i-1],
# down -> dX[i]  (the slicing in dem_processing.py:1914-1924).
_ROW_IS_UP = (True, True, True, True, False, False, False, False)


def _facet_row_distances(dX, dY, n):
    """Per-facet (d1, d2) column vectors of shape (n, 1).

    dX/dY are 'fence' arrays of length n-1.  Row i of facet ``ind`` uses
    fence index ``i-1`` for up-facets and ``i`` for down-facets, clipped to
    [0, n-2] — the clipping reproduces the reference's special handling of
    the top row (dX[0]/dY[0], dem_processing.py:1927-1929) and bottom row
    (dX[-1]/dY[-1], :1931-1934).
    """
    i = jnp.arange(n)
    up = jnp.clip(i - 1, 0, n - 2)
    dn = jnp.clip(i, 0, n - 2)
    dX_up, dY_up = dX[up][:, None], dY[up][:, None]
    dX_dn, dY_dn = dX[dn][:, None], dY[dn][:, None]
    out = []
    for ind in range(8):
        dx, dy = (dX_up, dY_up) if _ROW_IS_UP[ind] else (dX_dn, dY_dn)
        d1, d2 = (dx, dy) if _D1_IS_DX[ind] else (dy, dx)
        out.append((d1, d2))
    return out


def _region_masks(n, m):
    """Static facet-validity masks: allowed[ind][i,j] iff facet ind's e1 and
    e2 neighbors are both inside the grid."""
    ii = np.arange(n)[:, None] * np.ones((1, m), int)
    jj = np.ones((n, 1), int) * np.arange(m)[None, :]
    allowed = []
    for ind in range(8):
        ok = np.ones((n, m), bool)
        for (di, dj) in (FACET_E1[ind], FACET_E2[ind]):
            ok &= (ii + di >= 0) & (ii + di < n) & (jj + dj >= 0) & (jj + dj < m)
        allowed.append(ok)
    interior = np.zeros((n, m), bool)
    interior[1:-1, 1:-1] = True
    return np.stack(allowed), interior


def _facet_candidates(elev, d1, d2, ind):
    """(rad2, r) candidate slope/in-facet angle for facet ``ind`` at every
    pixel, with the reference's special-case handling
    (dem_processing.py:1942-1991)."""
    e1 = shift(elev, *FACET_E1[ind])
    e2 = shift(elev, *FACET_E2[ind])
    s1 = (elev - e1) / d1
    s2 = (e1 - e2) / d2
    # The barriers stop XLA from contracting a*a + b*b into an FMA: facet
    # candidates that differ by 1 ulp (numpy semantics, which the reference's
    # tie-breaks depend on) would otherwise collapse into exact ties and be
    # broken by facet order instead of by value.
    s1_2 = jax.lax.optimization_barrier(s1 * s1)
    s2_2 = jax.lax.optimization_barrier(s2 * s2)
    d1_2 = jax.lax.optimization_barrier(d1 * d1)
    hyp = jnp.sqrt(d1_2 + d2 * d2)
    sd = (elev - e2) / hyp
    r = jnp.arctan2(s2, s1)
    rad2 = s1_2 + s2_2
    theta = jnp.arctan2(d2, d1)
    theta_b = jnp.broadcast_to(theta, elev.shape)

    b_s1_lte0 = s1 <= 0
    b_s2_lte0 = s2 <= 0
    b_s2_gt0 = s2 > 0

    # The reference's special-case tests compare transcendentals
    # (``r > theta``, ``r < 0`` with r = atan2(s2, s1),
    # dem_processing.py:1973-1978).  XLA's atan2 differs from numpy's libm by
    # ±1 ulp, which flips facet tie-breaks; we use the exact algebraic
    # equivalents instead (valid since theta ∈ (0, π/2) and d1, d2 > 0):
    #   r > theta  ⟺  s2 > 0 ∧ (s1 ≤ 0 ∨ s2·d1 > s1·d2)
    #   r < 0      ⟺  s2 < 0
    # on-diagonal case
    I1 = b_s2_gt0 & (b_s1_lte0 | (s2 * d1 > s1 * d2))
    rad2 = jnp.where(I1, sd * sd, rad2)
    r = jnp.where(I1, theta_b, r)
    # on-straight-edge case (post-I1 r in the reference; disjoint from I1)
    I2 = (s2 < 0) | ((s2 == 0) & (s1 > 0))
    rad2 = jnp.where(I2, s1_2, rad2)
    r = jnp.where(I2, 0.0, r)
    # upslope or flat facet
    I3 = b_s1_lte0 & (b_s2_lte0 | (b_s2_gt0 & (sd <= 0)))
    rad2 = jnp.where(I3, -1.0, rad2)
    return rad2, r


def _apply_facets(elev, mag, direction, dists, masks):
    """Run the 8-facet max-update restricted to ``masks[ind]``."""
    for ind in range(8):
        d1, d2 = dists[ind]
        rad2, r = _facet_candidates(elev, d1, d2, ind)
        upd = masks[ind] & (rad2 > mag)
        # python ints keep weak typing: numpy scalars would promote f32->f64
        adj0, adj1 = int(ANG_ADJ[ind][0]), int(ANG_ADJ[ind][1])
        ang = r * adj1 + adj0 * (np.pi / 2)
        mag = jnp.where(upd, rad2, mag)
        direction = jnp.where(upd, ang, direction)
    return mag, direction


def slopes_directions(elev, dX, dY):
    """D∞ slope magnitude and direction for the whole grid.

    Returns (mag, direction); flats (all-upslope pixels) hold -1 in both.
    Exact functional port of dem_processing.py:1753-1903.
    """
    elev = jnp.asarray(elev)
    n, m = elev.shape
    dX = jnp.broadcast_to(jnp.asarray(dX, elev.dtype), (n - 1,))
    dY = jnp.broadcast_to(jnp.asarray(dY, elev.dtype), (n - 1,))

    dists = _facet_row_distances(dX, dY, n)
    allowed, interior = _region_masks(n, m)

    mag = jnp.full((n, m), float(FLAT_ID_INT), elev.dtype)
    direction = jnp.full((n, m), float(FLAT_ID_INT), elev.dtype)

    # Phase 1: interior pixels, all 8 facets (dem_processing.py:1764-1777).
    interior_masks = [jnp.asarray(interior)] * 8
    mag, direction = _apply_facets(elev, mag, direction, dists, interior_masks)

    # Phase 2: upstream-facing edges copy the adjacent interior value, in the
    # reference's sequential order (dem_processing.py:1782-1795).  Later steps
    # observe earlier writes.
    pi = np.pi
    ids = (direction[:, 1] > pi / 2) & (direction[:, 1] < 3 * pi / 2)
    direction = direction.at[:, 0].set(jnp.where(ids, direction[:, 1], direction[:, 0]))
    mag = mag.at[:, 0].set(jnp.where(ids, mag[:, 1], mag[:, 0]))

    ids = (direction[:, -2] < pi / 2) | (direction[:, -2] > 3 * pi / 2)
    direction = direction.at[:, -1].set(jnp.where(ids, direction[:, -2], direction[:, -1]))
    mag = mag.at[:, -1].set(jnp.where(ids, mag[:, -2], mag[:, -1]))

    ids = (direction[1, :] > 0) & (direction[1, :] < pi)
    direction = direction.at[0, :].set(jnp.where(ids, direction[1, :], direction[0, :]))
    mag = mag.at[0, :].set(jnp.where(ids, mag[1, :], mag[0, :]))

    ids = (direction[-2, :] > pi) & (direction[-2, :] < 2 * pi)
    direction = direction.at[-1, :].set(jnp.where(ids, direction[-2, :], direction[-1, :]))
    mag = mag.at[-1, :].set(jnp.where(ids, mag[-2, :], mag[-1, :]))

    # Phase 3: edge/corner pixels with their in-grid facet subsets
    # (dem_processing.py:1800-1899), possibly overriding the copies when a
    # downstream facet has larger slope.
    border_masks = [jnp.asarray(allowed[ind] & ~interior) for ind in range(8)]
    mag, direction = _apply_facets(elev, mag, direction, dists, border_masks)

    mag = jnp.where(mag > 0, jnp.sqrt(mag), mag)
    return mag, direction


# ---------------------------------------------------------------------------
# flat-region extension (dem_processing.py:657-680)
# ---------------------------------------------------------------------------

def label_flood(mask, payload):
    """Connected-component labels (8-connectivity) by min-index flood, plus
    the payload value at the label-defining pixel carried to the whole region.

    Label of a region = smallest flattened index of its pixels (which is also
    the scan-order-first pixel, matching ``scipy.ndimage.label`` region
    ordering); ``rep`` = the payload value at that pixel.  Non-region pixels
    get label n*m / payload NaN.

    Algorithm: Shiloach–Vishkin-style union over the pixel grid —

    1. *sweep*: ``m[p] = min(lbl[p], lbl of 8 neighbors)`` (a cheap fused
       VPU stencil pass, ~0.7 ms at 1024²);
    2. *hook*: ``parent[lbl[p]] = min(parent[lbl[p]], m[p])`` (scatter-min):
       each pixel's current ROOT learns the smallest label seen anywhere on
       its tree's frontier — this is what turns boundary-limited O(diameter)
       propagation into true logarithmic union (plain pointer-jumping stalls
       once every pixel points at a local root: 49 vs 6 iterations on a
       quantized 1024² cone);
    3. *compress*: ``lbl <- lbl[lbl]`` twice (gathers).

    Hook+compress run under ``lax.cond`` gated on the sweep having changed
    anything, so locally-converged canvases — most importantly flat-free
    smooth terrain, the hot path — run ONE sweep and zero gather/scatters.
    ``rep`` is a single payload gather at the converged labels.

    Invariant: every label value is the flat index of a pixel in the same
    region (sweep candidates come from 8-adjacent mask pixels; hook targets
    are existing labels), so the final min is the region's scan-first pixel,
    matching scipy.ndimage.label region order.

    SPMD note: the stencil sweep partitions under GSPMD with 1-px halo
    collectives, but hook/compress lower to cross-shard collective
    scatter/gathers on a sharded canvas.  They are runtime-gated (a mesh run
    over flat-free terrain never executes them), but flats-heavy sharded
    canvases do pay cross-shard traffic here — this is the one non-stencil
    op in the pipeline (see parallel/sharded.py module notes).
    """
    from .stencil import NEIGHBOR_OFFSETS

    n, m = mask.shape
    N = n * m
    # int32 labels: beyond 2^31-1 pixels the clipped gathers would silently
    # wrap — fail loudly instead (a >46k² single canvas should be tiled).
    if N >= 2 ** 31:
        raise ValueError("label_flood: canvas has %d pixels >= 2^31; "
                         "int32 labels would overflow" % N)
    big = jnp.int32(N)
    idx = jnp.arange(N, dtype=jnp.int32).reshape(n, m)
    lbl0 = jnp.where(mask, idx, big)
    mask_flat = mask.ravel()

    def sweep(lbl):
        new_lbl = lbl
        for di, dj in NEIGHBOR_OFFSETS:
            new_lbl = jnp.minimum(new_lbl, shift(lbl, di, dj, big))
        return jnp.where(mask, new_lbl, big)

    # TPU: sweeps are ~2.6 ms fused stencils while every scatter/gather is
    # ~10 ms at 1M ids, so spend MORE sweeps (5) and FEWER compress gathers
    # (1) per hook round — measured best of the (sweeps, compress) grid on
    # the quantized 1024² fixture.  CPU: scatters/gathers are cheap
    # relative to sweeps; the classic 1-sweep/2-compress shape wins.
    on_tpu = jax.default_backend() == "tpu"
    n_sweeps = 5 if on_tpu else 1
    n_compress = 1 if on_tpu else 2

    def hook_and_compress(args):
        lbl, mins = args
        lf = lbl.ravel()
        # parent table indexed by pixel id; one slot of slack for `big`
        parent = jnp.concatenate([lf, jnp.array([big])])
        tgt = jnp.where(mask_flat, lf, N)
        parent = parent.at[tgt].min(mins.ravel())
        lbl = jnp.where(mask, parent[:N].reshape(n, m), big)
        for _ in range(n_compress):  # compress: lbl <- lbl[lbl]
            f = lbl.ravel()
            lbl = jnp.where(mask, f[jnp.clip(f, 0, N - 1)].reshape(n, m),
                            big)
        return lbl

    def body(state):
        lbl, _changed = state
        mins = lbl
        for _ in range(n_sweeps):
            mins = sweep(mins)
        changed = jnp.any(mins != lbl)
        lbl2 = jax.lax.cond(changed, hook_and_compress,
                            lambda a: a[0], (lbl, mins))
        return lbl2, changed

    lbl, _ = jax.lax.while_loop(
        lambda s: s[1], body, (lbl0, jnp.asarray(True)))
    rep = jnp.where(mask,
                    payload.ravel()[jnp.clip(lbl.ravel(), 0, N - 1)]
                    .reshape(n, m), jnp.nan)
    return lbl, rep


def find_flats_edges(elev, mag, direction=None, flood=None):
    """Extend flats one pixel downstream (dem_processing.py:657-680).

    For each flat region (mag == -1), pixels 8-adjacent to the region become
    flat iff their elevation equals the region's representative elevation
    (first pixel in scan order).  The reference assigns region-by-region in
    label order so the highest label adjacent to a pixel wins; reproduced by
    taking the max adjacent (label, rep) pair.

    ``flood``: alternative ``(mask, payload) -> (lbl, rep)`` labeling
    implementation (e.g. ``parallel.sharded.label_flood_sharded`` on a
    device mesh); None uses the global :func:`label_flood`.
    """
    from .stencil import NEIGHBOR_OFFSETS

    flat = mag == FLAT_ID_INT
    lbl, rep = (flood or label_flood)(flat, elev)

    NEG = jnp.int32(-1)
    lbl_m = jnp.where(flat, lbl, NEG)
    best_lbl = jnp.full(elev.shape, NEG)
    best_rep = jnp.full(elev.shape, jnp.nan, elev.dtype)
    for di, dj in NEIGHBOR_OFFSETS:
        nl = shift(lbl_m, di, dj, NEG)
        nr = shift(rep, di, dj, jnp.nan)
        better = nl > best_lbl
        best_lbl = jnp.where(better, nl, best_lbl)
        best_rep = jnp.where(better, nr, best_rep)

    flat_new = jnp.where(best_lbl >= 0, elev == best_rep, flat)
    return flat_new
