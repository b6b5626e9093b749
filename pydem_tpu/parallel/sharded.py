"""Multi-chip SPMD execution of the terrain pipeline.

The reference scales by tiling the DEM into overlapping GeoTIFFs, processing
tiles in subprocesses, and fixed-point-iterating cross-tile edge updates
through a zarr store (``/root/reference/pydem/process_manager.py:1090-1318``).
Here the whole domain is ONE logical 2-D array laid out over a
``jax.sharding.Mesh('y', 'x')``: every kernel in ``pydem_tpu.core`` is written
as gather-style 3×3 stencils with no global index math, so the identical
jitted programs partition under GSPMD — XLA inserts the 1-px halo exchanges
(collective-permutes over ICI) for each shifted operand, and the UCA
fixed-point's convergence test becomes an all-reduce.  The reference's
multi-round tile edge resolution therefore collapses into the same Jacobi
sweep, just sharded: information crosses shard boundaries every sweep instead
of every tile-round.

Equivalence contract (the reference's own test discipline,
test_end_to_end.py:26-149, translated): sharded results == single-device
results, elementwise.
"""
from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.receivers import receiver_weights, section_proportion
from ..core.slope_direction import find_flats_edges, slopes_directions
from ..core.uca import accumulate, base_area, finalize_uca
from ..core.twi import twi as twi_fn

FLAT_ID_INT = -1


def make_mesh(devices=None, shape=None):
    """2-D ('y', 'x') device mesh.  With no arguments, uses all local devices
    in the most-square factorization."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if shape is None:
        a = int(math.sqrt(n))
        while n % a:
            a -= 1
        shape = (a, n // a)
    devs = np.asarray(devices[: shape[0] * shape[1]]).reshape(shape)
    return Mesh(devs, ("y", "x"))


def canvas_sharding(mesh):
    return NamedSharding(mesh, P("y", "x"))


def replicated(mesh):
    return NamedSharding(mesh, P())


@partial(jax.jit, static_argnames=("n_sweeps", "uca_solver", "fill_flats"))
def terrain_step(elev, dX, dY, dX2, dY2, n_sweeps=None, uca_solver="jacobi",
                 fill_flats=False):
    """The full device-side pipeline as one jittable program:
    slope/direction → flats → section/proportion → receiver weights → UCA
    fixed point → TWI.

    With ``n_sweeps`` set, runs a fixed number of UCA sweeps (fully static —
    useful for benchmarking/stepping); otherwise iterates to the fixed point
    with the chosen solver: ``"jacobi"`` (global sweeps, works everywhere) or
    ``"blocked"`` (Pallas VMEM-resident block relaxation — TPU, single
    device; the canvas is zero-padded to the block grid, which is exact
    since pad pixels carry no weight and no base area).
    """
    if fill_flats:
        from ..core.flats_device import fill_flats_device

        elev = fill_flats_device(elev)

    mag, direction = slopes_directions(elev, dX, dY)
    flats = find_flats_edges(elev, mag, direction)
    direction = jnp.where(flats, FLAT_ID_INT, direction)
    mag = jnp.where(flats, FLAT_ID_INT, mag)

    section, proportion = section_proportion(direction, flats, dX, dY)
    W = receiver_weights(section, proportion, elev)
    base = base_area(dX2, dY2, elev.shape, elev.dtype)

    if n_sweeps is not None:
        from ..core.uca import flow_sweep

        def body(_, x):
            return base + flow_sweep(x, W)

        area = jax.lax.fori_loop(0, n_sweeps, body, base)
        sweeps = jnp.int32(n_sweeps)
    elif uca_solver == "blocked":
        from ..ops.uca_block import accumulate_blocked_gs

        n, m = elev.shape
        B = 256 if min(n, m) >= 256 else 128
        pn, pm = (-n) % B, (-m) % B
        base_p = jnp.pad(base, ((0, pn), (0, pm)))
        W_p = jnp.pad(W, ((0, 0), (0, pn), (0, pm)))
        area, sweeps = accumulate_blocked_gs(base_p, W_p, B=B)
        area = area[:n, :m]
    else:
        area, sweeps = accumulate(base, W)
    uca = finalize_uca(area, flats)

    min_area = jnp.nanmin(base)
    twi = twi_fn(uca, mag, min_area)
    return dict(mag=mag, direction=direction, flats=flats, uca=uca, twi=twi,
                uca_sweeps=sweeps)


def run_sharded(elev, dX, dY, dX2=None, dY2=None, mesh=None, n_sweeps=None):
    """Place the canvas on the mesh and run :func:`terrain_step` SPMD.

    Row-distance vectors are replicated (they are O(rows) scalars); the
    canvas and all outputs are sharded ('y', 'x').
    """
    if mesh is None:
        mesh = make_mesh()
    n = elev.shape[0]
    dt = jnp.asarray(elev).dtype
    dX = jnp.broadcast_to(jnp.asarray(dX, dt), (n - 1,))
    dY = jnp.broadcast_to(jnp.asarray(dY, dt), (n - 1,))
    dX2 = jnp.ones(n, dt) if dX2 is None else jnp.asarray(dX2, dt)
    dY2 = jnp.ones(n, dt) if dY2 is None else jnp.asarray(dY2, dt)

    sh = canvas_sharding(mesh)
    rep = replicated(mesh)
    n_, m_ = elev.shape
    gy, gx = mesh.devices.shape
    pad_n = (-n_) % gy
    pad_m = (-m_) % gx
    elev = jnp.asarray(elev)
    if pad_n or pad_m:
        # NamedSharding requires divisibility; extend the domain with NaN
        # (no-data) rows/cols.  The padded canvas IS the computed domain —
        # callers wanting bit-parity with an unpadded single-device run
        # should supply divisible shapes (the tile manager does).
        elev = jnp.pad(elev, ((0, pad_n), (0, pad_m)),
                       constant_values=jnp.nan)
        dX = jnp.concatenate([dX, jnp.broadcast_to(dX[-1], (pad_n,))])
        dY = jnp.concatenate([dY, jnp.broadcast_to(dY[-1], (pad_n,))])
        dX2 = jnp.concatenate([dX2, jnp.broadcast_to(dX2[-1], (pad_n,))])
        dY2 = jnp.concatenate([dY2, jnp.broadcast_to(dY2[-1], (pad_n,))])
    elev_s = jax.device_put(elev, sh)
    args = [jax.device_put(v, rep) for v in (dX, dY, dX2, dY2)]
    out = terrain_step(elev_s, *args, n_sweeps=n_sweeps)
    if pad_n or pad_m:
        out = {k: (v[:n_, :m_] if getattr(v, "ndim", 0) == 2 else v)
               for k, v in out.items()}
    return out
