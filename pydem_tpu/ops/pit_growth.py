"""Device-parallel pit drainage search (vmapped window region growing).

TPU-native counterpart of the growth loop inside ``connectivity_pits``
(``/root/reference/pydem/dem_processing.py:1287-1329``): every pit grows a
region by its minimum-elevation border until it finds strictly-lower drain
pixels.  The reference iterates pits serially in Python (the scalability
pain point called out in SURVEY §3.1); here all pits grow simultaneously —
the loop is order-independent because the pit set and elevation are static
during the search and each pit only writes its own links.

Each pit searches inside a static window of half-width ``W//2`` centered on
it (clipped to the array).  The reference searches the whole tile, but
accepted drains must lie within ``drain_pits_max_dist`` (default 32) pixels
of the pit, so a window of 96 is exact unless the min-elevation frontier
wanders further than 48 px before draining — a documented approximation
(growth that hits the window edge marks the pit undrained, like the
reference's empty-border break).

Returns boolean drain masks per pit; link weights/filters are assembled on
host (trivial work proportional to the number of pits).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core.stencil import NEIGHBOR_OFFSETS


def _dilate(mask):
    out = mask
    for di, dj in NEIGHBOR_OFFSETS:
        n, m = mask.shape
        pad = ((max(0, -di), max(0, di)), (max(0, -dj), max(0, dj)))
        p = jnp.pad(mask, pad)
        out = out | p[pad[0][1]: pad[0][1] + n, pad[1][1]: pad[1][1] + m]
    return out


@partial(jax.jit, static_argnames=("W", "max_iter", "min_border"))
def grow_pits(elev, pits_bool, pit_i, pit_j, W=96, max_iter=300,
              min_border=False):
    """Vectorized drainage search for all pits.

    elev, pits_bool: (n, m) canvas arrays; pit_i/pit_j: (P,) pit coords.
    Returns (origin_i, origin_j, drain_mask (P, W, W), found (P,)).
    """
    n, m = elev.shape
    half = W // 2

    oi = jnp.clip(pit_i - half, 0, max(n - W, 0))
    oj = jnp.clip(pit_j - half, 0, max(m - W, 0))

    def one(oi_, oj_, pi_, pj_):
        e = jax.lax.dynamic_slice(elev, (oi_, oj_), (W, W))
        pits_w = jax.lax.dynamic_slice(pits_bool, (oi_, oj_), (W, W))
        li, lj = pi_ - oi_, pj_ - oj_
        R0 = jnp.zeros((W, W), bool).at[li, lj].set(True)
        epit = e[li, lj]
        if min_border:
            b0 = _dilate(R0) & ~R0
            epit_border = jnp.min(jnp.where(b0, e, jnp.inf))
        else:
            epit_border = epit

        INF = jnp.asarray(jnp.inf, e.dtype)

        def body(state):
            R, drain, found, it = state
            border = _dilate(R) & ~R
            eb = jnp.where(border, e, INF)
            emin = jnp.min(eb)

            nb = border & ~pits_w
            pb = border & pits_w
            nb_min = jnp.min(jnp.where(nb, e, INF))
            pb_min = jnp.min(jnp.where(pb, e, INF))

            take_nb = nb_min < epit_border
            take_pb = ~take_nb & (pb_min < epit)
            new_drain = jnp.where(
                take_nb, nb & (e < epit_border),
                jnp.where(take_pb, pb & (e < epit),
                          jnp.zeros_like(border)))
            done_now = take_nb | take_pb

            grow = border & (e == emin)
            R_next = jnp.where(done_now, R, R | grow)
            # stall (no growth, no drain) ends the search undrained
            stalled = ~done_now & ~jnp.any(grow)
            return (R_next, jnp.where(done_now, new_drain, drain),
                    found | done_now, jnp.where(stalled, max_iter, it + 1))

        def cond(state):
            _R, _d, found, it = state
            return jnp.logical_and(~found, it < max_iter)

        R0_state = (R0, jnp.zeros((W, W), bool), jnp.asarray(False),
                    jnp.int32(0))
        _R, drain, found, _ = jax.lax.while_loop(cond, body, R0_state)
        return drain, found

    drain, found = jax.vmap(one)(oi, oj, pit_i, pit_j)
    return oi, oj, drain, found


def connectivity_pits_device(flats, elev, mag, dX, dY, max_iter=300,
                             max_dist=32, max_dist_XY=None, min_border=False,
                             window=96):
    """Drop-in replacement for ``conditioning.connectivity_pits`` running the
    growth loops on device.  Same return signature."""
    import warnings

    flats = np.asarray(flats).copy()
    mag = np.asarray(mag).copy()
    elev = np.asarray(elev)
    n, m = elev.shape
    e = elev.ravel()
    pits_bool = flats & (elev > 0)
    pits = np.argwhere(pits_bool)
    if pits.size == 0:
        return (np.zeros(0, "int64"), np.zeros(0, "int64"),
                np.zeros(0, "float64"), flats, mag)

    W = int(min(window, n, m))
    oi, oj, drain_masks, found = jax.tree.map(np.asarray, grow_pits(
        jnp.asarray(elev), jnp.asarray(pits_bool),
        jnp.asarray(pits[:, 0]), jnp.asarray(pits[:, 1]),
        W=W, max_iter=max_iter, min_border=min_border))

    cdX = np.concatenate([[0.0], np.cumsum(dX)])
    cdY = np.concatenate([[0.0], np.cumsum(dY)])

    src, dst, wgt = [], [], []
    warn_pits = 0
    for p in range(len(pits)):
        if not found[p]:
            warn_pits += 1
            continue
        ipit, jpit = pits[p]
        di_, dj_ = np.nonzero(drain_masks[p])
        Id = di_ + oi[p]
        Jd = dj_ + oj[p]
        if max_dist:
            b = np.sqrt((ipit - Id) ** 2 + (jpit - Jd) ** 2) <= max_dist
            if not b.any():
                warn_pits += 1
                continue
            Id, Jd = Id[b], Jd[b]
        # real distances (mean fence spacing × coordinate offsets)
        dx = np.empty(len(Id))
        dy = np.empty(len(Id))
        for k, i2 in enumerate(Id):
            a, b2 = sorted((ipit, int(i2)))
            if a == b2:  # same row: single fence value (dem_processing.py:1993)
                dx[k] = dX[min(ipit, len(dX) - 1)]
            else:
                dx[k] = (cdX[b2] - cdX[a]) / (b2 - a)
            dx[k] *= (jpit - Jd[k])
            dy[k] = cdY[b2] - cdY[a]
        dxy = np.sqrt(dx ** 2 + dy ** 2)
        if max_dist_XY:
            b = dxy <= max_dist_XY
            if not b.any():
                warn_pits += 1
                continue
            Id, Jd, dxy = Id[b], Jd[b], dxy[b]

        drains_flat = Id * m + Jd
        s = np.abs(e[ipit * m + jpit] - e[drains_flat]) / dxy
        src += [ipit * m + jpit] * len(drains_flat)
        dst += drains_flat.tolist()
        wgt += (s / s.sum()).tolist()
        mag[ipit, jpit] = np.mean(s)
        flats[ipit, jpit] = False

    if warn_pits:
        warnings.warn("%d pits had no place to drain to in this chunk"
                      % warn_pits)
    return (np.asarray(src, "int64"), np.asarray(dst, "int64"),
            np.asarray(wgt, "float64"), flats, mag)
