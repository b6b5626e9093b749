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
reference's empty-border break).  The fast chain runs a 64-px first tier
and regrows exactly the pits whose region touched a non-canvas window edge
(``clipped``) at 96 px — tier-1 acceptances saw their complete border at
every step and are therefore identical to full-window runs.

Two consumers: :func:`pit_links_device` assembles host link arrays (the
compat path used by ``connectivity_pits_device``); the fast chain uses
:func:`pit_links_device_packed`, whose link triples and drained-pit
updates stay on device — dense per-window link math plus one global
nonzero compaction, with only the pit count and a 3-scalar stats vector
crossing the host boundary.
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
    Returns (origin_i, origin_j, drain_mask (P, W, W), found (P,),
    clipped (P,)).

    ``clipped`` marks pits whose grown region touched a window edge that is
    NOT a canvas edge: their border was truncated by the window, so the
    search may differ from an unclipped (larger-window) run.  A pit with
    ``clipped == False`` saw its complete border at every step — its result
    is EXACT for any window size, which is what makes a small-window first
    tier with clipped-retry sound (see pit_links_device_packed).
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
            # `live` gates state changes so the body is an exact no-op once
            # found or past max_iter — running extra batched calls cannot
            # change the result (same drains, same stopping iteration)
            live = ~found & (it < max_iter)
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
            done_now = (take_nb | take_pb) & live

            grow = border & (e == emin)
            R_next = jnp.where(done_now | ~live, R, R | grow)
            # stall (no growth, no drain) ends the search undrained
            stalled = live & ~done_now & ~jnp.any(grow)
            return (R_next, jnp.where(done_now, new_drain, drain),
                    found | done_now,
                    jnp.where(stalled, max_iter,
                              it + live.astype(jnp.int32)))

        def body2(state):
            # two growth steps per convergence check: the check itself is
            # a cross-lane reduce whose cost rivals a step; extra steps
            # past a lane's stopping point are no-ops (see `live`)
            return body(body(state))

        def cond(state):
            _R, _d, found, it = state
            return jnp.logical_and(~found, it < max_iter)

        R0_state = (R0, jnp.zeros((W, W), bool), jnp.asarray(False),
                    jnp.int32(0))
        R_f, drain, found, _ = jax.lax.while_loop(cond, body2, R0_state)
        # window-clipped search: the region (monotone under growth) reached
        # a window edge that is interior to the canvas
        clipped = ((jnp.any(R_f[0, :]) & (oi_ > 0))
                   | (jnp.any(R_f[-1, :]) & (oi_ + W < n))
                   | (jnp.any(R_f[:, 0]) & (oj_ > 0))
                   | (jnp.any(R_f[:, -1]) & (oj_ + W < m)))
        return drain, found, clipped

    drain, found, clipped = jax.vmap(one)(oi, oj, pit_i, pit_j)
    return oi, oj, drain, found, clipped


@partial(jax.jit, static_argnames=("W", "max_iter", "min_border", "K",
                                   "max_dist", "has_xy"))
def _grow_and_extract(elev, pits_bool, pit_i, pit_j, cdX, cdY, dX, dY,
                      max_dist_xy, W=96, max_iter=300, min_border=False,
                      K=48, max_dist=32, has_xy=False):
    """Grow all pits AND assemble their drain links on device.

    Per pit, the up-to-K drain cells (row-major, matching the host path's
    np.nonzero order) are turned into (flat index, normalized slope weight)
    pairs with the exact distance arithmetic of
    ``conditioning.connectivity_pits`` (mean fence spacing × coordinate
    offsets, dem_processing.py:1337-1357, 1993-1997).  Returns per-pit
    ``(dst (P,K), wgt (P,K), valid (P,K), mean_s (P,), ok (P,),
    n_drains (P,))`` — only O(P·K) scalars cross back to the host instead
    of the (P, W, W) masks."""
    n, m = elev.shape
    oi, oj, drain, found, _clipped = grow_pits(elev, pits_bool, pit_i,
                                               pit_j, W=W,
                                               max_iter=max_iter,
                                               min_border=min_border)
    fdt = elev.dtype

    def one(drain_p, oi_, oj_, pi_, pj_, found_p):
        di, dj = jnp.nonzero(drain_p, size=K, fill_value=W)
        valid = (di < W) & found_p
        Id = jnp.clip(di + oi_, 0, n - 1)
        Jd = jnp.clip(dj + oj_, 0, m - 1)
        if max_dist:
            valid &= ((pi_ - Id) ** 2 + (pj_ - Jd) ** 2
                      <= max_dist * max_dist)
        a = jnp.minimum(pi_, Id)
        b = jnp.maximum(pi_, Id)
        same = a == b
        dx = jnp.where(same, dX[jnp.minimum(pi_, n - 2)],
                       (cdX[b] - cdX[a]) / jnp.maximum(b - a, 1)
                       .astype(fdt))
        dx = dx * (pj_ - Jd).astype(fdt)
        dy = cdY[b] - cdY[a]
        dxy = jnp.sqrt(dx * dx + dy * dy)
        if has_xy:
            valid &= dxy <= max_dist_xy
        s = jnp.abs(elev[pi_, pj_] - elev[Id, Jd]) / jnp.where(dxy > 0,
                                                               dxy, 1.0)
        s = jnp.where(valid, s, 0.0)
        ssum = jnp.sum(s)
        cnt = jnp.sum(valid)
        ok = found_p & (cnt > 0)
        wgt = s / jnp.where(ssum > 0, ssum, 1.0)
        mean_s = ssum / jnp.maximum(cnt, 1).astype(fdt)
        return Id * m + Jd, wgt, valid, mean_s, ok, jnp.sum(drain_p)

    return jax.vmap(one)(drain, oi, oj, pit_i, pit_j, found)


def _pit_batch_floor(n_px):
    """Canvas-derived pit-batch bucket floor: the compile key must be a
    function of canvas SHAPE for typical terrains (pit counts jitter across
    power-of-two boundaries between perturbed reruns, and a vmapped-growth
    recompile costs seconds on a remote-attached chip).  n_px/512 bounds the
    post-conditioning pit density with margin; capped at 2048 lanes so the
    growth windows stay cache-sized (larger pit sets run more chunks of the
    same compiled program instead)."""
    pb = 512
    while pb < min(n_px // 512, 2048):
        pb *= 2
    return pb


def _grow_batches(elev_d, pits_bool_d, pits, consts, max_dist_xy, W, K,
                  max_iter, min_border, max_dist, has_xy):
    """Run _grow_and_extract over power-of-two pit batches; returns the six
    per-pit DEVICE arrays concatenated to the padded total PT >= P (padding
    lanes repeat the last pit and must be masked by the caller)."""
    P = len(pits)
    PB = _pit_batch_floor(elev_d.size)
    while PB < min(P, 2048):
        PB *= 2
    chunks = []
    for p0 in range(0, P, PB):
        batch = pits[p0: p0 + PB]
        if len(batch) < PB:
            batch = np.concatenate(
                [batch, np.repeat(batch[-1:], PB - len(batch), axis=0)])
        chunks.append(_grow_and_extract(
            elev_d, pits_bool_d, jnp.asarray(batch[:, 0]),
            jnp.asarray(batch[:, 1]), *consts,
            max_dist_xy, W=W, max_iter=max_iter,
            min_border=min_border, K=K, max_dist=max_dist,
            has_xy=has_xy))
    if len(chunks) == 1:
        return chunks[0]
    return tuple(jnp.concatenate([c[i] for c in chunks])
                 for i in range(6))


def pit_links_device(flats_d, elev_d, dX, dY, max_iter=300, max_dist=32,
                     max_dist_XY=None, min_border=False, window=96,
                     link_capacity=48):
    """Device-resident pit-link search: growth loops AND link assembly run
    on device from device-resident ``flats``/``elev``; only the pit
    coordinate list (one boolean canvas fetch) and the O(P·K) link scalars
    cross the host boundary.

    Returns ``(src, dst, wgt, drained_src_flat, drained_mean_s)`` — the
    sparse link triples plus the flat indices of successfully-drained pits
    and their new slope magnitudes (the flats/mag state updates of
    dem_processing.py:1360-1371, to be applied by the caller: on device in
    the fast path, on host in :func:`connectivity_pits_device`).

    Pits with more than ``link_capacity`` drain cells (rare — drains are a
    strict-minimum subset of one border ring) fall back to exact host
    assembly from their fetched masks."""
    import warnings

    n, m = elev_d.shape
    pits_bool_d = flats_d & (elev_d > 0)
    pits = np.argwhere(np.asarray(pits_bool_d))
    z64 = np.zeros(0, "int64")
    if pits.size == 0:
        return z64, z64, np.zeros(0, "float64"), z64, np.zeros(0, "float64")

    dX = np.asarray(dX, "float64")
    dY = np.asarray(dY, "float64")
    W = int(min(window, n, m))
    K = int(link_capacity)
    cdX = np.concatenate([[0.0], np.cumsum(dX)])
    cdY = np.concatenate([[0.0], np.cumsum(dY)])
    P = len(pits)
    fdt = elev_d.dtype
    consts = (jnp.asarray(cdX, fdt), jnp.asarray(cdY, fdt),
              jnp.asarray(dX, fdt), jnp.asarray(dY, fdt))
    grown = _grow_batches(elev_d, pits_bool_d, pits, consts,
                          np.float64(max_dist_XY or 0.0), W, K, max_iter,
                          min_border, max_dist, bool(max_dist_XY))
    outs = [np.asarray(c)[:P] for c in grown]
    dst_d, wgt_d, valid_d, mean_s_d, ok_d, ndr_d = outs

    overflow = ndr_d > K
    fast = ~overflow
    src_flat = pits[:, 0] * m + pits[:, 1]

    take = fast[:, None] & valid_d & ok_d[:, None]
    src = np.repeat(src_flat, K).reshape(-1, K)[take]
    dst = dst_d[take].astype("int64")
    wgt = wgt_d[take].astype("float64")
    drained = fast & ok_d
    drained_src = src_flat[drained].astype("int64")
    drained_mean = mean_s_d[drained].astype("float64")
    warn_pits = int((fast & ~ok_d).sum())

    if overflow.any():
        # exact host assembly for the rare over-capacity pits
        idx = np.where(overflow)[0]
        cap = 1
        while cap < len(idx):
            cap *= 2
        pidx = np.concatenate([idx, np.repeat(idx[-1:], cap - len(idx))])
        oi, oj, drain_masks, found, _cl = jax.tree.map(np.asarray, grow_pits(
            elev_d, pits_bool_d,
            jnp.asarray(pits[pidx, 0]), jnp.asarray(pits[pidx, 1]),
            W=W, max_iter=max_iter, min_border=min_border))
        elev = np.asarray(elev_d)
        e = elev.ravel()
        src2, dst2, wgt2 = [], [], []
        for q, p in enumerate(idx):
            if not found[q]:
                warn_pits += 1
                continue
            ipit, jpit = pits[p]
            di_, dj_ = np.nonzero(drain_masks[q])
            Id = di_ + oi[q]
            Jd = dj_ + oj[q]
            if max_dist:
                b = np.sqrt((ipit - Id) ** 2 + (jpit - Jd) ** 2) <= max_dist
                if not b.any():
                    warn_pits += 1
                    continue
                Id, Jd = Id[b], Jd[b]
            dx = np.empty(len(Id))
            dy = np.empty(len(Id))
            for k, i2 in enumerate(Id):
                a, b2 = sorted((ipit, int(i2)))
                if a == b2:  # same row (dem_processing.py:1993)
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
            src2 += [ipit * m + jpit] * len(drains_flat)
            dst2 += drains_flat.tolist()
            wgt2 += (s / s.sum()).tolist()
            drained_src = np.concatenate(
                [drained_src, [ipit * m + jpit]]).astype("int64")
            drained_mean = np.concatenate([drained_mean, [np.mean(s)]])
        src = np.concatenate([src, np.asarray(src2, "int64")])
        dst = np.concatenate([dst, np.asarray(dst2, "int64")])
        wgt = np.concatenate([wgt, np.asarray(wgt2, "float64")])

    if warn_pits:
        warnings.warn("%d pits had no place to drain to in this chunk"
                      % warn_pits)
    return src, dst, wgt, drained_src, drained_mean


@partial(jax.jit, static_argnames=("W", "max_iter", "min_border",
                                   "max_dist", "has_xy"))
def _grow_extract_dense(elev, pits_bool, pit_i, pit_j, cdX, cdY, dX, dY,
                        max_dist_xy, W=96, max_iter=300, min_border=False,
                        max_dist=32, has_xy=False):
    """Grow all pits and compute their drain-link quantities DENSELY on the
    (P, W, W) windows — no per-lane nonzero extraction (a vmapped nonzero
    measured ~3x the growth loop itself) and no per-pit link capacity.

    Same distance/weight arithmetic as ``_grow_and_extract``
    (dem_processing.py:1337-1357, 1993-1997), evaluated at every window
    cell and masked by the drain set.  Returns per-window
    ``(dst_flat (P,W,W), wgt (P,W,W), valid (P,W,W), mean_s (P,), ok (P,),
    clipped (P,))`` — all device-resident; the caller compacts the valid
    links with one global nonzero (:func:`_compact_dense`)."""
    n, m = elev.shape
    oi, oj, drain, found, clipped = grow_pits(elev, pits_bool, pit_i, pit_j,
                                              W=W, max_iter=max_iter,
                                              min_border=min_border)
    fdt = elev.dtype
    wi = jnp.arange(W)
    Id = oi[:, None, None] + wi[None, :, None]
    Jd = oj[:, None, None] + wi[None, None, :]
    e_win = jax.vmap(lambda a, b: jax.lax.dynamic_slice(elev, (a, b),
                                                        (W, W)))(oi, oj)
    epit = elev[pit_i, pit_j][:, None, None]
    pi3 = pit_i[:, None, None]
    pj3 = pit_j[:, None, None]

    valid = drain & found[:, None, None]
    if max_dist:
        valid &= ((pi3 - Id) ** 2 + (pj3 - Jd) ** 2
                  <= max_dist * max_dist)
    a = jnp.minimum(pi3, Id)
    b = jnp.maximum(pi3, Id)
    same = a == b
    dx = jnp.where(same, dX[jnp.minimum(pi3, n - 2)],
                   (cdX[b] - cdX[a]) / jnp.maximum(b - a, 1).astype(fdt))
    dx = dx * (pj3 - Jd).astype(fdt)
    dy = cdY[b] - cdY[a]
    dxy = jnp.sqrt(dx * dx + dy * dy)
    if has_xy:
        valid &= dxy <= max_dist_xy
    s = jnp.abs(epit - e_win) / jnp.where(dxy > 0, dxy, 1.0)
    s = jnp.where(valid, s, 0.0)
    ssum = jnp.sum(s, axis=(1, 2))
    cnt = jnp.sum(valid, axis=(1, 2))
    ok = found & (cnt > 0)
    wgt = s / jnp.where(ssum > 0, ssum, 1.0)[:, None, None]
    mean_s = ssum / jnp.maximum(cnt, 1).astype(fdt)
    dst_flat = Id * m + Jd
    return dst_flat, wgt, valid, mean_s, ok, clipped


@partial(jax.jit, static_argnames=("L",))
def _compact_dense(take, wgt, dst_flat, src_b, L):
    """Compact the valid (pit, drain) pairs of the dense windows into
    static (L,)-shaped link triples (padding entries carry weight 0)."""
    PT = take.shape[0]
    WW = take.shape[1] * take.shape[2]
    idx = jnp.nonzero(take.ravel(), size=L, fill_value=PT * WW)[0]
    safe = jnp.clip(idx, 0, PT * WW - 1)
    good = idx < PT * WW
    lane = safe // WW
    src_l = jnp.where(good, src_b[lane], 0)
    dst_l = jnp.where(good, dst_flat.ravel()[safe], 0)
    wgt_l = jnp.where(good, wgt.ravel()[safe], 0)
    return src_l, dst_l, wgt_l


def _grow_dense_batches(elev_d, pits_bool_d, pit_i, pit_j, PB, consts,
                        max_dist_xy, W, max_iter, min_border, max_dist,
                        has_xy):
    """Chunk the (PT,) pit coordinates into PB-lane calls of the same
    compiled dense-extract program."""
    PT = pit_i.shape[0]
    chunks = []
    for p0 in range(0, PT, PB):
        chunks.append(_grow_extract_dense(
            elev_d, pits_bool_d, pit_i[p0: p0 + PB], pit_j[p0: p0 + PB],
            *consts, max_dist_xy, W=W, max_iter=max_iter,
            min_border=min_border, max_dist=max_dist, has_xy=has_xy))
    if len(chunks) == 1:
        return chunks[0]
    return tuple(jnp.concatenate([c[i] for c in chunks])
                 for i in range(6))


@partial(jax.jit, static_argnames=("PT",))
def _pit_coords(pits_bool_d, p_count, PT):
    """Pit (i, j) coordinates on device, padded to PT lanes.  Padding lanes
    repeat the FIRST pit (a real pit converges its growth loop quickly;
    an arbitrary fill pixel could drag the lockstep vmap for max_iter
    rounds); callers mask them with a lane-validity test."""
    n, m = pits_bool_d.shape
    idx = jnp.nonzero(pits_bool_d.ravel(), size=PT, fill_value=0)[0]
    idx = jnp.where(jnp.arange(PT) < p_count, idx, idx[0])
    return idx // m, idx % m


def _link_bucket_floor(n_px):
    """Canvas-derived link-count bucket floor (compile-key stability: the
    compaction/solve programs must not recompile when the link count of a
    perturbed rerun crosses a power of two).  n_px/256 bounds observed
    post-conditioning link densities with ~2x margin."""
    cap = 1024
    while cap < n_px // 256:
        cap *= 2
    return cap


def pit_links_device_packed(flats_d, elev_d, dX, dY, max_iter=300,
                            max_dist=32, max_dist_XY=None, min_border=False,
                            window=96, first_window=64):
    """Fully device-resident pit-link search for the fast chain.

    Same search as :func:`pit_links_device`, but the link triples and the
    drained-pit updates STAY ON DEVICE — only the pit count and a 3-scalar
    stats vector cross the host boundary, instead of a boolean canvas plus
    six per-pit arrays (each fetch costing a tunnel round trip on a
    remote-attached chip).  Link assembly is dense over the growth windows
    (no per-pit capacity, no vmapped nonzero).

    Two-tier windows: every pit first grows inside a ``first_window``
    window (growth cost scales with W², and ~99% of real pits drain within
    a few pixels); pits whose region touched a non-canvas window edge —
    the EXACT condition under which a small window can differ from a large
    one (see :func:`grow_pits`) — are regrown at ``window``.

    Returns ``None`` when the canvas has no pits, else a dict with device
    arrays:

    - ``src, dst, wgt``: (L,) compacted link triples (L a canvas-stable
      power-of-two bucket; padding entries have weight 0)
    - ``drained_idx``: (PT,) flat indices of drained pits, sentinel n*m on
      invalid lanes — consumers must scatter with ``mode='drop'``
    - ``drained_mag``: (PT,) new slope magnitudes for those pits
    - ``n_warn``: pits with nowhere to drain (for the reference's warning)
    """
    n, m = elev_d.shape
    pits_bool_d = flats_d & (elev_d > 0)
    # pit COUNT is the only coordinate information the host needs (it picks
    # the chunk count); the coordinates themselves come from a device-side
    # nonzero — one scalar RTT instead of a boolean-canvas download
    P = int(jnp.sum(pits_bool_d))
    if P == 0:
        return None

    dX = np.asarray(dX, "float64")
    dY = np.asarray(dY, "float64")
    W2 = int(min(window, n, m))
    W1 = int(min(first_window, W2))
    cdX = np.concatenate([[0.0], np.cumsum(dX)])
    cdY = np.concatenate([[0.0], np.cumsum(dY)])
    fdt = elev_d.dtype
    consts = (jnp.asarray(cdX, fdt), jnp.asarray(cdY, fdt),
              jnp.asarray(dX, fdt), jnp.asarray(dY, fdt))
    mdxy = np.float64(max_dist_XY or 0.0)
    has_xy = bool(max_dist_XY)

    PB = _pit_batch_floor(elev_d.size)
    while PB < min(P, 2048):
        PB *= 2
    nchunks = -(-P // PB)
    PT = nchunks * PB
    pit_i, pit_j = _pit_coords(pits_bool_d, jnp.asarray(P), PT)
    src_b = pit_i * m + pit_j

    dst_w, wgt_w, valid_w, mean_s, ok, clipped = _grow_dense_batches(
        elev_d, pits_bool_d, pit_i, pit_j, PB, consts, mdxy, W1, max_iter,
        min_border, max_dist, has_xy)

    lane = jnp.arange(PT) < jnp.asarray(P)   # mask the padding lanes
    retry = lane & clipped
    drained = lane & ok & ~clipped
    # adjacency pruning (dem_processing.py:1136) inside take
    take = drained[:, None, None] & valid_w & (wgt_w > 1e-8)
    stats = np.asarray(jnp.stack([
        jnp.sum(take).astype(jnp.int32),
        jnp.sum(lane & ~ok & ~clipped).astype(jnp.int32),
        jnp.sum(retry).astype(jnp.int32),
    ]))
    n_links, n_warn, n_retry = (int(v) for v in stats)

    L = _link_bucket_floor(elev_d.size)
    while L < n_links:
        L *= 2
    src_l, dst_l, wgt_l = _compact_dense(take, wgt_w.astype(fdt), dst_w,
                                         src_b, L)
    sentinel = jnp.asarray(n * m, src_b.dtype)

    if n_retry:
        # tier 2: regrow the clipped pits at the full window; their tier-1
        # results are discarded (take excluded clipped lanes already).
        # Bounded exactly like tier 1: the retry batch caps at 2048 lanes
        # and larger sets run more chunks of the same compiled program —
        # a pathological all-clipped terrain must not OOM or recompile per
        # retry-count power of two.
        RB = 512
        while RB < min(n_retry, 2048):
            RB *= 2
        RT = -(-n_retry // RB) * RB
        lanes2 = jnp.nonzero(retry, size=RT, fill_value=PT)[0]
        safe = jnp.clip(lanes2, 0, PT - 1)
        good = lanes2 < PT
        pi2 = jnp.where(good, pit_i[safe], pit_i[0])
        pj2 = jnp.where(good, pit_j[safe], pit_j[0])
        dst2, wgt2, valid2, mean2, ok2, _cl2 = _grow_dense_batches(
            elev_d, pits_bool_d, pi2, pj2, RB, consts, mdxy, W2, max_iter,
            min_border, max_dist, has_xy)
        take2 = (good & ok2)[:, None, None] & valid2 & (wgt2 > 1e-8)
        stats2 = np.asarray(jnp.stack([
            jnp.sum(take2).astype(jnp.int32),
            jnp.sum(good & ~ok2).astype(jnp.int32),
        ]))
        n_links2, n_warn2 = (int(v) for v in stats2)
        n_warn += n_warn2
        L2 = _link_bucket_floor(elev_d.size)
        while L2 < n_links2:
            L2 *= 2
        src_b2 = pi2 * m + pj2
        s2, d2, w2 = _compact_dense(take2, wgt2.astype(fdt), dst2,
                                    src_b2, L2)
        src_l = jnp.concatenate([src_l, s2])
        dst_l = jnp.concatenate([dst_l, d2])
        wgt_l = jnp.concatenate([wgt_l, w2])
        # fold tier-2 drained pits into the lane-indexed update arrays.
        # mode="drop": padding lanes carry the out-of-bounds sentinel PT and
        # are DROPPED — clipping them to PT-1 would collide with (and could
        # clobber) a real retried pit at the last lane, since .set with
        # duplicate indices is order-undefined.
        drained = drained.at[lanes2].max(ok2, mode="drop")
        mean_s = mean_s.at[lanes2].set(
            jnp.where(ok2, mean2, mean_s[safe]), mode="drop")
        n_links += n_links2

    drained_idx = jnp.where(drained, src_b, sentinel)
    return {"src": src_l, "dst": dst_l, "wgt": wgt_l,
            "drained_idx": drained_idx, "drained_mag": mean_s.astype(fdt),
            "n_warn": n_warn, "n_links": n_links}


def connectivity_pits_device(flats, elev, mag, dX, dY, max_iter=300,
                             max_dist=32, max_dist_XY=None, min_border=False,
                             window=96, link_capacity=48):
    """Drop-in replacement for ``conditioning.connectivity_pits`` running
    the growth loops AND link assembly on device.  Same return signature
    (host arrays; the flats/mag updates are applied here — the
    device-resident fast path uses :func:`pit_links_device` directly and
    applies them on device)."""
    flats = np.asarray(flats).copy()
    mag = np.asarray(mag).copy()
    src, dst, wgt, drained_src, drained_mean = pit_links_device(
        jnp.asarray(np.asarray(flats)), jnp.asarray(np.asarray(elev)),
        dX, dY, max_iter=max_iter, max_dist=max_dist,
        max_dist_XY=max_dist_XY, min_border=min_border, window=window,
        link_capacity=link_capacity)
    mag.ravel()[drained_src] = drained_mean
    flats.ravel()[drained_src] = False
    return src, dst, wgt, flats, mag
