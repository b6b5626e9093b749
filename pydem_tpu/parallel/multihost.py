"""Multi-host execution helpers (DCN scaling).

The reference scales across machines only by manually splitting tile
directories; here the global canvas simply spans a multi-host mesh —
``jax.distributed`` coordinates processes, GSPMD keeps the 1-px halo
collectives on ICI within each slice, and the convergence all-reduce crosses
hosts over DCN once per UCA round.

Single-host environments (including this development container, which has
one chip) exercise the same code path through
``xla_force_host_platform_device_count`` CPU meshes; the multi-host pieces
below are thin, standard wrappers so a pod-slice run is:

    multihost.initialize(...)               # once per process
    elev_local = <this host's row band>
    out = multihost.run_global(elev_local, dX, dY, dX2, dY2)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import sharded


def initialize(coordinator_address=None, num_processes=None, process_id=None):
    """Bring up jax.distributed (no-op if already initialized or solo)."""
    if num_processes in (None, 1):
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def global_mesh(shape=None):
    """2-D ('y', 'x') mesh over all global devices, row-major by process so
    each host owns contiguous canvas rows (tile ingest stays host-local)."""
    return sharded.make_mesh(jax.devices(), shape=shape)


def assemble_global(local_rows, mesh):
    """Build the logically-global canvas from this process's row band.

    ``local_rows``: this host's rows of the canvas (equal height across
    hosts).  Returns a jax.Array sharded ('y', 'x') over the mesh.
    """
    n_proc = jax.process_count()
    n_local, m = local_rows.shape
    global_shape = (n_local * n_proc, m)
    sharding = sharded.canvas_sharding(mesh)
    return jax.make_array_from_process_local_data(
        sharding, np.asarray(local_rows), global_shape)


def run_global(local_rows, dX, dY, dX2=None, dY2=None, mesh=None,
               n_sweeps=None, uca_solver="jacobi"):
    """Full pipeline over the multi-host canvas; returns sharded outputs
    (each host can `jax.experimental.multihost_utils` -gather or slice out
    its own rows for export).

    ``uca_solver="blocked"`` runs the production per-shard Pallas
    Gauss-Seidel solver with explicit ppermute halo exchange
    (``sharded.accumulate_sharded``) — halos ride ICI within each host's
    slice, and the per-round convergence psum is the only DCN-crossing
    collective."""
    if mesh is None:
        mesh = global_mesh()
    elev = assemble_global(local_rows, mesh)
    n = elev.shape[0]
    dt = elev.dtype
    dX = jnp.broadcast_to(jnp.asarray(dX, dt), (n - 1,))
    dY = jnp.broadcast_to(jnp.asarray(dY, dt), (n - 1,))
    dX2 = jnp.ones(n, dt) if dX2 is None else jnp.asarray(dX2, dt)
    dY2 = jnp.ones(n, dt) if dY2 is None else jnp.asarray(dY2, dt)
    rep = sharded.replicated(mesh)
    args = [jax.device_put(v, rep) for v in (dX, dY, dX2, dY2)]
    if uca_solver == "blocked" and n_sweeps is None:
        mag, direction, flats, W, base = sharded.terrain_pre(elev, *args,
                                                             mesh=mesh)
        area, rounds = sharded.sharded_uca(base, W, mesh,
                                           uca_solver="blocked")
        uca, twi = sharded.terrain_post(area, flats, mag, base)
        return dict(mag=mag, direction=direction, flats=flats, uca=uca,
                    twi=twi, uca_sweeps=rounds)
    return sharded.terrain_step(elev, *args, n_sweeps=n_sweeps)
