"""On-device elevation conditioning: flat filling as label-flood + segment
reductions + chamfer relaxation (all jnp; jit/SPMD-compatible).

TPU-native counterpart of ``core.conditioning.fill_flats`` (which is the
host-side exact-semantics implementation, see its docstring for the
reference line citations).  The per-region python loops of the reference
become four data-parallel phases over the whole canvas:

1. flat mask (3×3 min filter) + connected components via min-index label
   flood (``slope_direction.label_flood`` machinery);
2. per-region scalars (drain existence, source min-elevation, centroid,
   border statistics) via ``jax.ops.segment_*`` keyed on the region label;
3. source/drain seeding per pixel (a pixel's role is decided against the
   region of the *adjacent* flat pixel, so shared borders between two
   regions behave exactly like the reference's per-region windows);
4. inverse-distance-squared interpolation with in-region chamfer distances
   (orth +1 / diag +√2), iterated min-relaxation — the direct jnp analog of
   the reference's ``get_distance`` (utils.py:374-402).

All regions are processed simultaneously; this is safe because the
reference's writes are provably confined to each region's own pixels.
Matches the host implementation on the analytic fixture suite (see
tests/test_flats_device.py); NaN no-data neighborhoods may differ from
scipy's order-dependent minimum_filter NaN semantics in pathological cases.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .stencil import NEIGHBOR_OFFSETS, shift

SQRT2 = 2.0 ** 0.5


def _flat_mask(elev, below_sea):
    mn = elev
    for di, dj in NEIGHBOR_OFFSETS:
        mn = jnp.minimum(mn, shift(elev, di, dj, jnp.inf))
    sea = (elev != 0) if below_sea else (elev > 0)
    flat = (mn >= elev) & sea
    flat = flat.at[0, 0].set(False).at[-1, 0].set(False)
    flat = flat.at[0, -1].set(False).at[-1, -1].set(False)
    return flat


def _labels(flat, elev):
    """(labels, rep_elev) via min-index flood; non-flat pixels get n*m."""
    from .slope_direction import label_flood

    return label_flood(flat, elev)


def _seg(op, vals, ids, num, init):
    if op == "min":
        return jax.ops.segment_min(vals, ids, num_segments=num)
    if op == "max":
        return jax.ops.segment_max(vals, ids, num_segments=num)
    return jax.ops.segment_sum(vals, ids, num_segments=num)


@partial(jax.jit, static_argnames=("source_tol", "fill_peaks", "fill_pits",
                                   "below_sea", "maximum_pit_area"))
def fill_flats_device(elev, source_tol=1, fill_peaks=True, fill_pits=True,
                      below_sea=False, maximum_pit_area=32):
    """Fill/interpolate flats on device.  Returns the conditioned canvas."""
    elev = jnp.asarray(elev)
    n, m = elev.shape
    N = n * m
    if maximum_pit_area:
        elev = _fill_pit_artifacts(elev, below_sea, maximum_pit_area)

    data = elev.astype(elev.dtype)
    flat = _flat_mask(data, below_sea)
    lbl, rep = _labels(flat, data)
    lbl_flat = jnp.where(flat, lbl, N).ravel()

    # ---- per-region border statistics --------------------------------
    # Inside-out formulation: each REGION pixel r aggregates its non-flat
    # neighbors b with a cheap fused VPU stencil (drain: b == rep; source
    # candidates: b > rep), then segment reductions keyed on r's own label.
    # Equivalent to reducing over border pixels per adjacent region (every
    # (border b, region R) adjacency appears as some (r in R, neighbor b)
    # pair; min/or are duplication-insensitive), replacing 16 per-offset
    # segment scatters — TPU scatters at 1M ids cost ~10 ms each and
    # dominated this stage.
    INF = jnp.asarray(jnp.inf, data.dtype)
    drain_local = jnp.zeros((n, m), bool)
    src_local = jnp.full((n, m), INF)
    for di, dj in NEIGHBOR_OFFSETS:
        b_e = shift(data, di, dj, jnp.nan)       # neighbor elevation at r
        b_flat = shift(flat, di, dj, False)
        nb = ~b_flat                             # border = non-flat neighbor
        drain_local = drain_local | (nb & (b_e == rep))
        src_local = jnp.minimum(src_local,
                                jnp.where(nb & (b_e > rep), b_e, INF))

    ii = jax.lax.broadcasted_iota(jnp.int32, (n, m), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (n, m), 1)
    edge = jnp.zeros((n, m), bool)
    edge = edge.at[0, :].set(True).at[-1, :].set(True)
    edge = edge.at[:, 0].set(True).at[:, -1].set(True)

    # stage-1 segment reductions (6 scatters — separate: BOTH offset-id
    # packing (num_segments multiplies) and column packing ((n·m, k)
    # values; TPU scatter rows don't vectorize) measured SLOWER), results
    # packed into one float table so the per-pixel broadcast is one row
    # gather instead of 6 scalar gathers
    fdt = data.dtype
    src_min = _seg("min", jnp.where(flat, src_local, INF).ravel(),
                   lbl_flat, N + 1, INF)
    drain_s = _seg("sum", (flat & drain_local).ravel().astype(fdt),
                   lbl_flat, N + 1, 0)
    count_s = _seg("sum", jnp.where(flat, 1, 0).ravel().astype(fdt),
                   lbl_flat, N + 1, 0)
    si_s = _seg("sum", jnp.where(flat, ii, 0).ravel().astype(fdt),
                lbl_flat, N + 1, 0)
    sj_s = _seg("sum", jnp.where(flat, jj, 0).ravel().astype(fdt),
                lbl_flat, N + 1, 0)
    edge_s = _seg("sum", (flat & edge).ravel().astype(fdt),
                  lbl_flat, N + 1, 0)

    ftbl = jnp.stack([src_min, si_s, sj_s, count_s, drain_s, edge_s],
                     axis=1)
    fg = ftbl[lbl_flat].reshape(n, m, 6)
    esrc_of = fg[..., 0]
    si_of, sj_of = fg[..., 1], fg[..., 2]
    has_src = jnp.isfinite(esrc_of)
    count_of = fg[..., 3]
    has_drain = fg[..., 4] > 0
    edge_cnt_of = fg[..., 5]

    e_region = rep  # per-pixel (region pixels only)

    # ---- single-pixel regions in <=3x3 windows (dem_processing.py:311-325)
    nbr_higher = jnp.zeros((n, m), jnp.int32)
    nbr_total = jnp.zeros((n, m), jnp.int32)
    for di, dj in NEIGHBOR_OFFSETS:
        qe = shift(data, di, dj, jnp.nan)
        in_grid = ~jnp.isnan(shift(jnp.zeros_like(data), di, dj, jnp.nan))
        nbr_total = nbr_total + in_grid.astype(jnp.int32)
        nbr_higher = nbr_higher + (qe > data).astype(jnp.int32)
    single = flat & (count_of == 1)
    min_higher = jnp.full((n, m), INF)
    for di, dj in NEIGHBOR_OFFSETS:
        qe = shift(data, di, dj, jnp.inf)
        min_higher = jnp.minimum(min_higher,
                                 jnp.where(qe > data, qe, INF))
    sp_pit = single & (nbr_higher == nbr_total)
    sp_fill = single & ~sp_pit & (nbr_higher > 0)
    sp_peak = single & ~sp_pit & (nbr_higher == 0) & bool(fill_peaks)
    out = data
    out = jnp.where(sp_fill,
                    data + jnp.minimum(1.0, min_higher - data) - 0.01, out)
    out = jnp.where(sp_peak, data + 0.5, out)

    # ---- multi-pixel regions -----------------------------------------
    multi = flat & (count_of > 1)
    eH = jnp.minimum(e_region + 1.0, esrc_of)          # normal sources
    eH = jnp.where(has_src, eH, e_region + 0.5)        # peak fallback

    # centroid (nearest in-region pixel to center of mass, scan-order ties)
    cnt_f = count_of.astype(fdt)
    com_i = si_of / jnp.maximum(cnt_f, 1)
    com_j = sj_of / jnp.maximum(cnt_f, 1)
    dist2 = (ii - com_i) ** 2 + (jj - com_j) ** 2
    dmin = _seg("min", jnp.where(flat, dist2, INF).ravel(), lbl_flat, N + 1, INF)
    at_min = flat & (dist2 == dmin[lbl_flat].reshape(n, m))
    idx_flat = (ii * m + jj).ravel()
    cent_idx = _seg("min", jnp.where(at_min.ravel(), idx_flat, N),
                    lbl_flat, N + 1, N)
    is_centroid = flat & (idx_flat.reshape(n, m) == cent_idx[lbl_flat].reshape(n, m))

    # edge-touching regions (upstream river beds): drain to the array edge
    touches_of = edge_cnt_of > 0

    # drain seeds: border pixels with elev == e (normal), else region∩edge,
    # else centroid (pits)
    use_edge_drain = ~has_drain & touches_of
    use_pit_drain = ~has_drain & ~touches_of & bool(fill_pits)
    # region entirely on the edge would have no interior to interpolate
    # (non-edge pixel count = count - edge count; no extra scatter)
    edge_drain_ok = (count_of - edge_cnt_of) > 0

    # peaks: centroid becomes the source, raised to eH
    peak_region = multi & ~has_src & bool(fill_peaks)
    out = jnp.where(peak_region & is_centroid, eH, out)

    # in-region replace set (excluded from interpolation)
    replace = jnp.zeros((n, m), bool)
    replace = replace | (peak_region & is_centroid)
    replace = replace | (multi & use_edge_drain & edge & edge_drain_ok)
    replace = replace | (multi & use_pit_drain & is_centroid & has_src)
    # (pit-drain with peak source: both seeds are the centroid; reference
    # sets source first then drain also at centroid — replace stays centroid)
    replace = replace | (multi & use_pit_drain & ~has_src & bool(fill_peaks)
                         & is_centroid)

    # active regions: those with a usable source AND a usable drain
    active_src = has_src | bool(fill_peaks)
    active_drain = has_drain | (use_edge_drain & edge_drain_ok) | use_pit_drain
    active = multi & active_src & active_drain

    # ---- chamfer distances within regions ----------------------------
    # dH from sources, dL from drains; seeds live either outside the region
    # (border pixels) or inside (centroid / edge pixels in replace roles).
    # Both distances relax in the SAME while loops (the sweep counts only
    # grow to the max of the two; extra sweeps past a fixed point are
    # numeric no-ops), and the out-of-region seed adjacency — a function of
    # static data only — is hoisted out of the loop, halving the per-sweep
    # stencil work.  Identical values to two independent chamfer runs.
    def chamfer_pair(seedA_out_pred, seedA_in, seedB_out_pred, seedB_in):
        """In-region chamfer distances replicating get_distance
        (utils.py:374-402) including its early stop: the reference iterates
        only until every region pixel has been *reached* and keeps the
        distances of that sweep, which can exceed the true chamfer distance.
        Each region therefore freezes at its own arrival sweep.

        seed*_out_pred(q_elev, q_flat, di, dj) marks out-of-region seeds
        adjacent to region pixels; seed*_in marks in-region zero-distance
        seeds."""
        big = jnp.asarray(float(N), data.dtype)

        # static out-of-region seed adjacency, computed once per distance
        def adj_of(seed_out_pred):
            adj = jnp.full((n, m), jnp.inf, data.dtype)
            for di, dj in NEIGHBOR_OFFSETS:
                step = 1.0 if di * dj == 0 else SQRT2
                q_e = shift(data, di, dj, jnp.nan)
                q_flat = shift(flat, di, dj, False)
                is_seed = seed_out_pred(q_e, q_flat, di, dj)
                adj = jnp.minimum(adj, jnp.where(is_seed, step, jnp.inf))
            return jnp.minimum(adj, big)

        adjA = adj_of(seedA_out_pred)
        adjB = adj_of(seedB_out_pred)

        def relax(dcur, seed_in, adj):
            dn = dcur
            for di, dj in NEIGHBOR_OFFSETS:
                step = 1.0 if di * dj == 0 else SQRT2
                dn = jnp.minimum(dn, shift(dcur, di, dj, big) + step)
            # only region pixels update; in-region seeds stay 0
            dn = jnp.where(flat, jnp.minimum(dn, adj), big)
            return jnp.where(seed_in, 0.0, dn)

        dA0 = jnp.where(seedA_in, 0.0, big)
        dB0 = jnp.where(seedB_in, 0.0, big)

        # Phase A (pure stencil): arrival sweep per pixel — the sweep index
        # at which each region pixel first becomes reachable.
        def body_a(state):
            dA, dB, arrA, arrB, sweep, _chg = state
            dnA = relax(dA, seedA_in, adjA)
            dnB = relax(dB, seedB_in, adjB)
            arrA = jnp.where((dnA < big) & (arrA < 0), sweep + 1, arrA)
            arrB = jnp.where((dnB < big) & (arrB < 0), sweep + 1, arrB)
            chg = jnp.any(dnA != dA) | jnp.any(dnB != dB)
            return dnA, dnB, arrA, arrB, sweep + 1, chg

        arrA0 = jnp.where(dA0 < big, 0, -1)
        arrB0 = jnp.where(dB0 < big, 0, -1)
        _dA, _dB, arrivalA, arrivalB, _s, _ = jax.lax.while_loop(
            lambda s: s[5], body_a,
            (dA0, dB0, arrA0, arrB0, jnp.int32(0), jnp.asarray(True)))

        # Freeze sweep per region per distance = its last arrival (the
        # reference breaks out of get_distance then); one row gather
        # broadcasts both back.
        TA = _seg("max", jnp.where(flat, arrivalA, -1).ravel(), lbl_flat,
                  N + 1, -1)
        TB = _seg("max", jnp.where(flat, arrivalB, -1).ravel(), lbl_flat,
                  N + 1, -1)
        tg = jnp.stack([TA, TB], axis=1)[lbl_flat].reshape(n, m, 2)
        TA_px, TB_px = tg[..., 0], tg[..., 1]

        # Phase B (pure stencil): rerun, capturing each pixel's value at its
        # region's freeze sweep.  Unreached regions keep converged values.
        def body_b(state):
            dA, dB, outA, outB, sweep, _chg = state
            dnA = relax(dA, seedA_in, adjA)
            dnB = relax(dB, seedB_in, adjB)
            outA = jnp.where(flat & (TA_px == sweep + 1), dnA, outA)
            outB = jnp.where(flat & (TB_px == sweep + 1), dnB, outB)
            chg = jnp.any(dnA != dA) | jnp.any(dnB != dB)
            return dnA, dnB, outA, outB, sweep + 1, chg

        def out0_of(d0, seed_in, T_px):
            o = jnp.where(flat & (T_px <= 0), d0, jnp.full((n, m), big))
            return jnp.where(seed_in, 0.0, o)

        dAf, dBf, outA, outB, _, _ = jax.lax.while_loop(
            lambda s: s[5], body_b,
            (dA0, dB0, out0_of(dA0, seedA_in, TA_px),
             out0_of(dB0, seedB_in, TB_px), jnp.int32(0),
             jnp.asarray(True)))
        # seedless regions never get a positive T: converged values
        outA = jnp.where(flat & (TA_px < 0), dAf, outA)
        outB = jnp.where(flat & (TB_px < 0), dBf, outB)
        return outA, outB

    def src_seed_out(q_e, q_flat, di, dj):
        # q (shifted view at p) is out-of-region source for p's region:
        # here the roles are inverted — we compute, at region pixel p,
        # whether the neighbor at (di, dj) is a source border pixel.
        cond_ = (~q_flat) & (q_e > e_region) & (q_e <= esrc_of + source_tol)
        return flat & has_src & cond_

    def drain_seed_out(q_e, q_flat, di, dj):
        return flat & has_drain & (~q_flat) & (q_e == e_region)

    src_in = (peak_region & is_centroid)
    drain_in = ((multi & use_edge_drain & edge & edge_drain_ok)
                | (multi & use_pit_drain & is_centroid))
    dH, dL = chamfer_pair(src_seed_out, src_in, drain_seed_out, drain_in)

    interp = active & ~replace
    fill_val = (eH * dL**2 + e_region * dH**2) / (dL**2 + dH**2)
    out = jnp.where(interp, fill_val, out)
    return out


def _fill_pit_artifacts(elev, below_sea, maximum_pit_area):
    """Quantization-pit raise (dem_processing.py:396-426) on device."""
    n, m = elev.shape
    N = n * m
    # NOTE: unlike fill_flats, the reference does NOT exclude corners here
    flat = _flat_mask_no_corner_exclusion(elev, below_sea)
    lbl, rep = _labels(flat, elev)
    lbl_flat = jnp.where(flat, lbl, N).ravel()

    # Inside-out border check (see fill_flats_device): at region pixel r a
    # non-flat IN-GRID neighbor b is 'bad' unless b == rep + 1.  Out-of-grid
    # neighbors contribute nothing (as in the reference, where they don't
    # exist) — regions touching the array edge are excluded by the edge
    # test below anyway.  One scatter instead of eight.
    bad_local = jnp.zeros((n, m), bool)
    for di, dj in NEIGHBOR_OFFSETS:
        b_e = shift(elev, di, dj, jnp.nan)
        b_flat = shift(flat, di, dj, False)
        in_grid = shift(jnp.ones((n, m), bool), di, dj, False)
        nb = ~b_flat & in_grid
        bad_local = bad_local | (nb & ~(b_e - 1 == rep))

    edge = jnp.zeros((n, m), bool)
    edge = edge.at[0, :].set(True).at[-1, :].set(True)
    edge = edge.at[:, 0].set(True).at[:, -1].set(True)

    cnt = _seg("sum", jnp.where(flat, 1, 0).ravel(), lbl_flat, N + 1, 0)
    # bbox touches the array edge (dem_processing.py:413-415) iff some
    # region pixel lies on the edge ring — one scatter replaces the four
    # imin/imax/jmin/jmax reductions
    edge_any = _seg("max", (flat & edge).ravel().astype(jnp.int32),
                    lbl_flat, N + 1, 0)
    bad_any = _seg("max", (flat & bad_local).ravel().astype(jnp.int32),
                   lbl_flat, N + 1, 0)

    raise_region = ((bad_any == 0) & (edge_any == 0)
                    & (cnt <= maximum_pit_area) & (cnt > 0))
    inc = raise_region[lbl_flat].reshape(n, m) & flat
    return elev + inc.astype(elev.dtype)


def _flat_mask_no_corner_exclusion(elev, below_sea):
    mn = elev
    for di, dj in NEIGHBOR_OFFSETS:
        mn = jnp.minimum(mn, shift(elev, di, dj, jnp.inf))
    sea = (elev != 0) if below_sea else (elev > 0)
    return (mn >= elev) & sea
