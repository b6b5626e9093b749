"""Upstream contributing area (UCA) as a dense stencil fixed point.

TPU-native replacement for the reference's sparse CSC wavefront kernel
(``/root/reference/pydem/cyfuncs/cyutils.pyx:78-187`` driven by
``dem_processing.py:864-987``).  Rather than scheduling a serial frontier in
topological order, we exploit that on the pruned drainage DAG the wavefront
result equals the fixed point of the linear accumulation

    area = base + Σ_k scatter_k(W_k ⊙ area) + pit_links(area)

where ``W_k`` are the 8 dense per-neighbor weight planes (``core.receivers``)
and ``pit_links`` is a small sparse scatter for non-adjacent pit drains
(``dem_processing.py:1269-1382``).  Jacobi iteration of this operator
converges *exactly* after L+1 sweeps (L = longest flow path) because the
weight matrix is nilpotent on a DAG; no done/readiness bookkeeping is needed.
Each sweep is pure 3×3 stencil math → fuses into a handful of VPU passes
under XLA, runs inside ``shard_map`` blocks with 1-px halos for multi-chip,
and is the target of the Pallas multi-sweep kernel in ``ops``.

Differences from the reference, by design:

- The reference's circular-reference breaker (``dem_processing.py:951-964``)
  force-drains equal-elevation cycles that survive pruning; Jacobi instead
  converges to the (I - A)⁻¹ solution on such cycles.  Cycles require exactly
  equal elevations with mutually-facing directions and do not occur in the
  reference's own test suite; results differ only there.
- Edge-receiver skipping (``cyutils.pyx:159-161, 207-226``) is a no-op for
  the from-scratch solve on a DAG (an edge pixel is marked done only after
  all its parents drained), so it is not modeled here; the cross-tile
  incremental update that needed it is replaced by the sharded global solve
  (``pydem_tpu.parallel``).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .stencil import NEIGHBOR_OFFSETS, scatter_shift


def base_area(dX2, dY2, shape, dtype=None):
    """Per-pixel self area = dX2·dY2 broadcast along rows
    (dem_processing.py:885-901)."""
    n, m = shape
    a = (jnp.asarray(dX2) * jnp.asarray(dY2)).reshape(n, 1)
    if dtype is not None:
        a = a.astype(dtype)
    return jnp.broadcast_to(a, (n, m))


def flow_sweep(x, W, pit_src=None, pit_dst=None, pit_w=None):
    """One application of the accumulation operator: inflow(x) (no base)."""
    out = jnp.zeros_like(x)
    for k, (di, dj) in enumerate(NEIGHBOR_OFFSETS):
        out = out + scatter_shift(W[k] * x, di, dj, 0.0)
    if pit_src is not None and pit_src.size:
        flat = out.ravel()
        contrib = x.ravel()[pit_src] * pit_w
        out = flat.at[pit_dst].add(contrib).reshape(x.shape)
    return out


@partial(jax.jit, static_argnames=("max_iters", "check_every"))
def accumulate(base, W, pit_src=None, pit_dst=None, pit_w=None,
               max_iters=1_000_000, check_every=4):
    """Solve area = base + A·area by Jacobi sweeps until a fixed point.

    Exact after (longest flow path + 1) sweeps on a DAG.  Returns
    ``(area, n_sweeps)``.
    """
    def body(state):
        x, _prev, it = state
        new = x
        for _ in range(check_every):
            new = base + flow_sweep(new, W, pit_src, pit_dst, pit_w)
        return new, x, it + check_every

    def cond(state):
        x, prev, it = state
        return jnp.logical_and(jnp.any(x != prev), it < max_iters)

    x0 = base
    prev0 = jnp.full_like(base, -1.0)
    x, _, n = jax.lax.while_loop(cond, body, (x0, prev0, jnp.int32(0)))
    return x, n


def finalize_uca(area, flats):
    """Flats carry no defined UCA (dem_processing.py:972)."""
    return jnp.where(flats, jnp.nan, area)


@partial(jax.jit, static_argnames=("max_iters", "check_every"))
def accumulate_update(delta0, W, receive_mask, push_mask=None, pit_src=None,
                      pit_dst=None, pit_w=None, max_iters=1_000_000,
                      check_every=4):
    """Propagate an edge-delta through the drainage graph
    (the ``skip_edge=False`` update pass of cyutils.pyx:119-187 driven by
    dem_processing.py:778-862): like :func:`accumulate` but with no base
    self-area, with receiving suppressed at already-initialized edge pixels
    (``receive_mask`` False there), and with pushing suppressed at seeded
    done-but-not-todo edges (their delta is recorded in-cell but never joins
    the wavefront — they are never activated in the reference since inflow
    to done edge pixels is skipped)."""
    def one(x):
        src = x if push_mask is None else x * push_mask
        return delta0 + receive_mask * flow_sweep(src, W, pit_src, pit_dst, pit_w)

    def body(state):
        x, _prev, it = state
        new = x
        for _ in range(check_every):
            new = one(new)
        return new, x, it + check_every

    def cond(state):
        x, prev, it = state
        return jnp.logical_and(jnp.any(x != prev), it < max_iters)

    x0 = delta0
    prev0 = jnp.full_like(delta0, -1.0)
    x, _, n = jax.lax.while_loop(cond, body, (x0, prev0, jnp.int32(0)))
    return x, n


@jax.jit
def reachability(seed, W, pit_src=None, pit_dst=None, pit_w=None):
    """Boolean flood along drainage edges (drain_connections,
    cyutils.pyx:35-72): all pixels reachable downstream from ``seed``."""
    Wb = W > 0

    def body(state):
        t, _changed = state
        new = t
        for k, (di, dj) in enumerate(NEIGHBOR_OFFSETS):
            new = new | scatter_shift(Wb[k] & t, di, dj, False)
        if pit_src is not None and pit_src.size:
            flat = new.ravel()
            contrib = t.ravel()[pit_src] & (pit_w > 0)
            new = flat.at[pit_dst].max(contrib).reshape(t.shape)
        return new, jnp.any(new != t)

    t, _ = jax.lax.while_loop(lambda s: s[1], body,
                              (seed, jnp.asarray(True)))
    return t


def grid_edge_mask(shape):
    n, m = shape
    e = jnp.zeros((n, m), bool)
    e = e.at[0, :].set(True).at[-1, :].set(True)
    e = e.at[:, 0].set(True).at[:, -1].set(True)
    return e


def seeds_and_edge_todo(W, section, elev, pit_dst=None):
    """Edge inflow bookkeeping for tile-based processing
    (dem_processing.py:909-930): which true-grid-edge pixels still await
    contributions from a neighboring tile.

    ``A[:, edge].sum(0)`` in the reference is the total *outflow* of edge
    pixels; combined with a section test for "flow entering the tile across
    this edge".  Corners additionally act as pass-throughs in 1-px-overlap
    tilings: a corner with outflow OR without inflow is marked todo
    (dem_processing.py:920-930).
    """
    n, m = elev.shape
    TOL = 1e-2
    outflow = jnp.zeros(elev.shape, elev.dtype)
    inflow = jnp.zeros(elev.shape, elev.dtype)
    for k, (di, dj) in enumerate(NEIGHBOR_OFFSETS):
        outflow = outflow + W[k]
        inflow = inflow + scatter_shift(W[k], di, dj, 0.0)

    edge_todo = jnp.zeros((n, m), bool)
    sec = section
    left = (outflow[:, 0] > TOL) & jnp.isin(sec[:, 0], jnp.asarray([6, 7, 0, 1]))
    right = (outflow[:, -1] > TOL) & jnp.isin(sec[:, -1], jnp.asarray([2, 3, 4, 5]))
    top = (outflow[0, :] > TOL) & jnp.isin(sec[0, :], jnp.asarray([4, 5, 6, 7]))
    bottom = (outflow[-1, :] > TOL) & jnp.isin(sec[-1, :], jnp.asarray([0, 1, 2, 3]))
    edge_todo = edge_todo.at[:, 0].set(left)
    edge_todo = edge_todo.at[:, -1].set(right)
    edge_todo = edge_todo.at[0, :].set(top)
    edge_todo = edge_todo.at[-1, :].set(bottom)
    for ci, cj in ((0, 0), (0, m - 1), (n - 1, 0), (n - 1, m - 1)):
        passthrough = (outflow[ci, cj] > TOL) | (inflow[ci, cj] < TOL)
        edge_todo = edge_todo.at[ci, cj].set(edge_todo[ci, cj] | passthrough)
    return edge_todo
