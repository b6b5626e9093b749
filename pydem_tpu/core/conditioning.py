"""Elevation conditioning: flat filling, pit-artifact filling, pit draining.

Host-side (numpy/scipy) implementations with exact reference semantics:

- :func:`fill_pit_artifacts`  — dem_processing.py:396-426
- :func:`fill_flats`          — dem_processing.py:305-394, 551-579
- :func:`drain_pit_paths`     — dem_processing.py:428-548
- :func:`connectivity_pits`   — dem_processing.py:1269-1382

Conditioning is ingest-side preprocessing (runs once per tile, touches each
pixel a handful of times); the hot path — slope/UCA/TWI — is fully on-device.
The per-region work here is independent across regions, so these also have a
clear parallel-on-device formulation (label flood + segment reductions) which
is the planned follow-up; this module is the semantics reference and default.

Notable reference behaviors reproduced deliberately:

- ``_fill_flat``'s recursive refinement writes into a *copy* that is then
  discarded (``dem_processing.py:389-394`` — ``out = out2`` rebinds a local
  just before returning), so recursion has no observable effect; only the
  first-level interpolation lands.  We therefore run level-0 only.
- Pit-path carving mutates elevation *during* the ascending-elevation pit
  loop, so later pits see earlier carvings (dem_processing.py:450-539).
- ``connectivity_pits`` computes the pit set once and never re-reads mutated
  state across pits, so it is order-independent (and parallelizable).
"""
from __future__ import annotations

import warnings

import numpy as np
from scipy import ndimage as ndi

STRUCT8 = np.ones((3, 3), bool)
SQRT2 = np.sqrt(2.0)
_ORTH = np.array([[0, 1, 0], [1, 1, 1], [0, 1, 0]], bool)


# ---------------------------------------------------------------------------
# small region helpers (semantics of utils.py:270-468)
# ---------------------------------------------------------------------------

def _adjacent_flat_indices(I, shape):
    """Flattened indices 8-adjacent to the index set I (utils.py:270-311)."""
    m, n = shape
    In = I % n
    bL = In != 0
    bR = In != n - 1
    J = np.concatenate([
        I - n, I[bL] - 1, I[bR] + 1, I + n,
        I[bL] - n - 1, I[bR] - n + 1, I[bL] + n - 1, I[bR] + n + 1,
    ])
    return J[(J >= 0) & (J < m * n)]


def _border_flat_indices(I, shape):
    """Adjacent minus the set itself, sorted ascending (utils.py:313-340)."""
    return np.setdiff1d(_adjacent_flat_indices(I, shape), I)


def _border_mask(region):
    interior = region[1:-1, 1:-1]
    if interior.all() and interior.any():
        return ~region
    grown = ndi.maximum_filter(region, footprint=STRUCT8)
    return grown & ~region


def _region_distance(region, src):
    """Within-region chamfer distance from src pixels (utils.py:374-402)."""
    dmax = float(region.size)
    d = np.full(region.shape, dmax)
    d[src] = 0
    for _ in range(region.size):
        d_orth = ndi.minimum_filter(d, footprint=_ORTH) + 1
        d_diag = ndi.minimum_filter(d, (3, 3)) + SQRT2
        d_adj = np.minimum(d_orth[region], d_diag[region])
        d[region] = np.minimum(d_adj, d[region])
        if (d[region] < dmax).all():
            break
    return d


def _centroid(region):
    """In-region pixel nearest the center of mass (utils.py:450-468)."""
    x, y = ndi.center_of_mass(region)
    w = np.argwhere(region)
    i, j = w[np.argmin(np.linalg.norm(w - (x, y), axis=1))]
    return i, j


def _grow_window(obj, shape):
    """bbox slices grown by 1, clipped (utils.py:410-447)."""
    return (
        slice(max(0, obj[0].start - 1), min(shape[0], obj[0].stop + 1)),
        slice(max(0, obj[1].start - 1), min(shape[1], obj[1].stop + 1)),
    )


def _ordered_slice(a, b):
    return slice(a, b) if a < b else slice(b, a)


def _fence_mean(dX, i1, i2):
    """Mean fence spacing between rows i1 and i2 (dem_processing.py:1993-1997)."""
    if i1 == i2:
        return dX[min(i1, dX.size - 1)]
    return dX[_ordered_slice(i1, i2)].mean()


def _sea_mask(elev, below_sea):
    return (elev != 0) if below_sea else (elev > 0)


# ---------------------------------------------------------------------------
# pit-artifact filling (dem_processing.py:396-426)
# ---------------------------------------------------------------------------

def fill_pit_artifacts(elev, maximum_pit_area=32, below_sea=False):
    """Raise quantization pits (flat region whose entire border sits exactly
    +1 above) by one elevation unit.  Returns a new array."""
    out = elev.copy()
    flat = (ndi.minimum_filter(elev, (3, 3)) >= elev) & _sea_mask(elev, below_sea)
    labels, _n = ndi.label(flat, structure=STRUCT8)
    for i, bbox in enumerate(ndi.find_objects(labels)):
        win = _grow_window(bbox, elev.shape)
        # regions whose bbox touches the array edge are skipped (:414-415)
        if not (elev[win].shape[0] == elev[bbox].shape[0] + 2
                and elev[win].shape[1] == elev[bbox].shape[1] + 2):
            continue
        mask = labels[win] == i + 1
        ring = ndi.maximum_filter(mask, (3, 3)) ^ mask
        region_elev = elev[win][mask][0]
        if np.all(elev[win][ring] - 1 == region_elev) and mask.sum() <= maximum_pit_area:
            out[win] += 1 * mask
    return out


# ---------------------------------------------------------------------------
# flat filling (dem_processing.py:305-394, 551-579)
# ---------------------------------------------------------------------------

def _interpolate_flat(roi, out, region, edge, source_tol=1, fill_peaks=True,
                      fill_pits=True):
    """Fill one flat region by inverse-distance-squared interpolation between
    its high (source) and low (drain) border.  Writes region pixels of
    ``out`` in place."""
    e = roi[region][0]

    # single-pixel region inside a <=3x3 window (:311-325)
    if roi.size <= 9 and region.sum() == 1:
        higher = roi > e
        n = higher.sum()
        if n == roi.size - 1:
            pass  # pit: leave
        elif n > 0:
            out[region] += min(1.0, roi[higher].min() - e) - 0.01
        elif fill_peaks:
            out[region] += 0.5
        return

    border = _border_mask(region)
    drain = border & (roi == e)
    source = border & (roi > e)
    replace = None

    if source.any():
        e_source = roi[source].min()
        eH = min(e + 1.0, e_source)
        source &= roi <= e_source + source_tol
    elif fill_peaks:
        eH = e + 0.5
        c = _centroid(region)
        out[c] = eH
        source[c] = True
        replace = source
    else:
        return

    if drain.any():
        pass
    elif (region & edge).any():
        replace = drain = region & edge
        if not (region & ~drain).any():
            return
    elif fill_pits:
        c = _centroid(region)
        drain[c] = True
        replace = drain
    else:
        return

    dH = _region_distance(region, source)
    dL = _region_distance(region, drain)
    interp = region if replace is None else region & ~replace
    out[interp] = (eH * dL[interp] ** 2 + e * dH[interp] ** 2) / (
        dL[interp] ** 2 + dH[interp] ** 2)


def fill_flats(elev, source_tol=1, fill_peaks=True, fill_pits=True,
               below_sea=False, maximum_pit_area=32):
    """Condition elevation by filling/interpolating flats.  Returns a new
    float64 array (NaN for masked input pixels)."""
    if maximum_pit_area:
        elev = fill_pit_artifacts(elev, maximum_pit_area, below_sea)

    data = np.ma.filled(np.ma.asarray(elev).astype("float64"), np.nan)
    filled = data.copy()
    edge = np.ones_like(data, bool)
    edge[1:-1, 1:-1] = False
    flat = (ndi.minimum_filter(data, (3, 3)) >= data) & _sea_mask(data, below_sea)
    for corner in ((0, 0), (-1, 0), (0, -1), (-1, -1)):
        flat[corner] = False
    labels, _n = ndi.label(flat, structure=STRUCT8)
    for i, bbox in enumerate(ndi.find_objects(labels)):
        win = _grow_window(bbox, data.shape)
        _interpolate_flat(data[win], filled[win], labels[win] == i + 1,
                          edge[win], source_tol, fill_peaks, fill_pits)
    return filled


# ---------------------------------------------------------------------------
# pit drain paths (dem_processing.py:428-548)
# ---------------------------------------------------------------------------

def drain_pit_paths(elev, dX, dY, max_iter=300, max_dist=32, max_dist_XY=None,
                    below_sea=False):
    """Carve a monotone elevation ramp from each pit to the nearest lower
    drain along a min-elevation growth path.  Returns a new array."""
    elev = elev.copy()
    e = elev.ravel()
    shape = elev.shape
    sea = _sea_mask(e, below_sea)

    ring = np.ones((3, 3), bool)
    ring[1, 1] = False
    pits_bool = (ndi.minimum_filter(elev, footprint=ring).ravel() > e) & sea
    pits = np.where(pits_bool)[0]
    warn_pits = []
    for pit in pits[np.argsort(e[pits])]:
        area = np.array([pit], "int64")
        drain = None
        epit = e[pit]
        path = [pit]
        for _ in range(max_iter):
            border = _border_flat_indices(area, shape)
            if border.size == 0:
                break
            eb = e[border]
            emin = eb.min()
            if emin < epit:
                drain = border[eb == emin]
                break
            grow = border[eb == emin]
            path += grow.tolist()
            area = np.concatenate([area, grow])

        if drain is None:
            warn_pits.append(pit)
            continue

        ipit, jpit = np.unravel_index(pit, shape)
        Id, Jd = np.unravel_index(drain, shape)
        if max_dist:
            b = np.sqrt((ipit - Id) ** 2 + (jpit - Jd) ** 2) <= max_dist
            if not b.any():
                warn_pits.append(pit)
                continue
            drain, Id, Jd = drain[b], Id[b], Jd[b]

        dx = [_fence_mean(dX, ipit, i2) * (jpit - j2) for i2, j2 in zip(Id, Jd)]
        dy = [dY[_ordered_slice(ipit, i2)].sum() for i2 in Id]
        dxy = np.sqrt(np.asarray(dx) ** 2 + np.asarray(dy) ** 2)
        if max_dist_XY:
            b = dxy <= max_dist_XY
            if not b.any():
                warn_pits.append(pit)
                continue
            drain, dxy = drain[b], dxy[b]

        if drain.size > 1:
            drain = drain[dxy == dxy.min()]
        drain = drain[0]
        path += [drain]

        # back-prune path pixels not 8-connected toward the drain (:520-532)
        ip, jp = np.unravel_index(np.asarray(path), shape)
        ip, jp = ip.tolist(), jp.tolist()
        k = len(path) - 2
        while k > 0:
            if abs(ip[k] - ip[k + 1]) <= 1 and abs(jp[k] - jp[k + 1]) <= 1:
                k -= 1
            else:
                path.pop(k)
                ip.pop(k)
                jp.pop(k)
                k = min(k, len(path) - 2)
            if path[k] == pit:
                break

        if e[pit] < e[drain]:
            e[pit] = e[path][e[path] > e[drain]].min()
        si = e[drain] - e[pit]
        e[path] = e[pit] + np.linspace(0, 1, len(path)) * si

    if warn_pits:
        warnings.warn("%d pits had no place to drain to in this chunk"
                      % len(warn_pits))
    return elev


# ---------------------------------------------------------------------------
# pit connectivity for UCA (dem_processing.py:1269-1382)
# ---------------------------------------------------------------------------

def connectivity_pits(flats, elev, mag, dX, dY, max_iter=300, max_dist=32,
                      max_dist_XY=None, min_border=False):
    """Sparse drain links for pits/flats that survived conditioning.

    Returns ``(pit_src, pit_dst, pit_w, flats, mag)``; ``flats``/``mag`` are
    modified copies (drained pits get mag = mean slope, flats cleared).
    """
    flats = flats.copy()
    mag = mag.copy()
    e = elev.ravel()
    shape = elev.shape

    pits_bool = (flats & (elev > 0)).ravel()
    pits = np.where(pits_bool)[0]
    src, dst, wgt = [], [], []
    warn_pits = []
    for pit in pits[np.argsort(e[pits])]:
        area = np.array([pit], "int64")
        drain = None
        epit = e[pit]
        if min_border:
            epit_border = e[_border_flat_indices(area, shape)].min()
        else:
            epit_border = epit
        for _ in range(max_iter):
            border = _border_flat_indices(area, shape)
            if border.size == 0:
                break
            eb = e[border]
            emin = eb.min()
            is_pit = pits_bool[border]
            eb_pits, eb_nopits = eb[is_pit], eb[~is_pit]
            if eb_nopits.size > 0 and eb_nopits.min() < epit_border:
                drain = border[~is_pit][eb_nopits < epit_border]
                break
            if eb_pits.size > 0 and eb_pits.min() < epit:
                drain = border[is_pit][eb_pits < epit]
                break
            area = np.concatenate([area, border[eb == emin]])

        if drain is None:
            warn_pits.append(pit)
            continue

        ipit, jpit = np.unravel_index(pit, shape)
        Id, Jd = np.unravel_index(drain, shape)
        if max_dist:
            b = np.sqrt((ipit - Id) ** 2 + (jpit - Jd) ** 2) <= max_dist
            if not b.any():
                warn_pits.append(pit)
                continue
            drain, Id, Jd = drain[b], Id[b], Jd[b]

        dx = [_fence_mean(dX, ipit, i2) * (jpit - j2) for i2, j2 in zip(Id, Jd)]
        dy = [dY[_ordered_slice(ipit, i2)].sum() for i2 in Id]
        dxy = np.sqrt(np.asarray(dx) ** 2 + np.asarray(dy) ** 2)
        if max_dist_XY:
            b = dxy <= max_dist_XY
            if not b.any():
                warn_pits.append(pit)
                continue
            drain, dxy = drain[b], dxy[b]

        s = np.abs(e[pit] - e[drain]) / dxy
        src += [pit] * drain.size
        dst += drain.tolist()
        wgt += (s / s.sum()).tolist()
        mag[ipit, jpit] = np.mean(s)
        flats[ipit, jpit] = False

    if warn_pits:
        warnings.warn("%d pits had no place to drain to in this chunk"
                      % len(warn_pits))
    return (np.asarray(src, "int64"), np.asarray(dst, "int64"),
            np.asarray(wgt, "float64"), flats, mag)
