"""Reference-compatible single-tile API: :class:`DEMProcessor`.

Drop-in analog of ``/root/reference/pydem/dem_processing.py:98-1709``'s
``DEMProcessor``: same constructor conventions (file or in-memory array, dX/dY
as scalars or per-row arrays), same public methods (``calc_fill_flats``,
``calc_pit_drain_paths``, ``calc_slopes_directions``, ``calc_uca``,
``calc_twi``, ``find_flats``), same tunables and defaults.  The compute path
is the TPU-native engine: slope/UCA/TWI run as jitted stencil programs
(``pydem_tpu.core``); conditioning runs host-side (``core.conditioning``).

State arrays (`elev`, `mag`, `direction`, `uca`, `twi`, `flats`, `section`,
`proportion`) are exposed as numpy arrays for interoperability.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax.numpy as jnp

import jax

from .core import conditioning as cond
from .core.receivers import receiver_weights, section_proportion
from .core.slope_direction import find_flats_edges, slopes_directions
from .core.uca import (accumulate, accumulate_update, base_area, finalize_uca,
                       grid_edge_mask, reachability, seeds_and_edge_todo)
from .io.raw import read_raster_kwargs

FLAT_ID_INT = -1

# Bench instrumentation hook (bench.bench_hard_stages): when set, called at
# device-chain stage boundaries as hook(name, array_to_sync_through_or_None).
# None in production — the fast chain stays sync-free.
_stage_probe = None


def _probe(name, val=None):
    if _stage_probe is not None:
        _stage_probe(name, val)


@jax.jit
def _slope_program(elev, dX, dY):
    """mag/direction + downstream-extended flats, as one compiled program."""
    mag, direction = slopes_directions(elev, dX, dY)
    flats = find_flats_edges(elev, mag, direction)
    direction = jnp.where(flats, FLAT_ID_INT, direction)
    mag = jnp.where(flats, FLAT_ID_INT, mag)
    return mag, direction, flats


@jax.jit
def _section_program(direction, flats, dX, dY):
    return section_proportion(direction, flats, dX, dY)


@partial(jax.jit, static_argnames=("max_iters", "check_every", "has_pits",
                                   "solver", "block_size", "interpret"))
def _uca_program(elev, section, proportion, flats2, dX2, dY2,
                 pit_src, pit_dst, pit_w, has_pits,
                 max_iters, check_every, solver="jacobi", block_size=None,
                 interpret=False):
    W = receiver_weights(section, proportion, elev)
    base = base_area(dX2, dY2, elev.shape, elev.dtype)
    min_area = jnp.nanmin(base)
    area, n_sweeps = _solve_uca(base, W, elev.shape,
                                pit_src if has_pits else None,
                                pit_dst if has_pits else None,
                                pit_w if has_pits else None,
                                max_iters, check_every, solver, block_size,
                                interpret)
    area = finalize_uca(area, flats2)
    edge_todo = seeds_and_edge_todo(W, section, elev)
    return area, n_sweeps, min_area, edge_todo


def _solve_uca(base, W, shape, pit_src, pit_dst, pit_w, max_iters,
               check_every, solver, block_size, interpret):
    """Shared solver dispatch (inside jit): jacobi global sweeps or Pallas
    blocked Gauss-Seidel (canvas zero-padded to the block grid — exact,
    since pad pixels carry no weight and no base area)."""
    if solver == "blocked":
        from .ops.uca_block import (accumulate_blocked_gs,
                                    accumulate_blocked_pits_gs)

        n, m = shape
        B = block_size or (256 if min(n, m) >= 256 else 128)
        pn, pm = (-n) % B, (-m) % B
        base_p = jnp.pad(base, ((0, pn), (0, pm)))
        W_p = jnp.pad(W, ((0, 0), (0, pn), (0, pm)))
        if pit_src is not None:
            # remap flat indices into the padded canvas
            src_i, src_j = pit_src // m, pit_src % m
            dst_i, dst_j = pit_dst // m, pit_dst % m
            ps = src_i * (m + pm) + src_j
            pd = dst_i * (m + pm) + dst_j
            area, n_sweeps = accumulate_blocked_pits_gs(
                base_p, W_p, ps, pd, pit_w, B=B, interpret=interpret)
        else:
            area, n_sweeps = accumulate_blocked_gs(base_p, W_p, B=B,
                                                   interpret=interpret)
        return area[:n, :m], n_sweeps
    return accumulate(base, W, pit_src, pit_dst, pit_w,
                      max_iters=max_iters, check_every=check_every)


@jax.jit
def _pre_program(elev, dX, dY):
    """slope/direction + flats + section/proportion as ONE device program —
    the device-resident analog of _slope_program + _section_program with no
    host round trip between them."""
    mag, direction = slopes_directions(elev, dX, dY)
    flats = find_flats_edges(elev, mag, direction)
    direction = jnp.where(flats, FLAT_ID_INT, direction)
    mag = jnp.where(flats, FLAT_ID_INT, mag)
    section, proportion = section_proportion(direction, flats, dX, dY)
    return mag, direction, flats, section, proportion


@partial(jax.jit, static_argnames=("has_pits", "has_drained", "max_iters",
                                   "check_every", "solver", "block_size",
                                   "interpret"))
def _uca_chain_program(elev, section, proportion, flats, mag, dX2, dY2,
                       pit_src, pit_dst, pit_w, drained_idx, drained_mag,
                       has_pits, has_drained, max_iters, check_every,
                       solver="jacobi", block_size=None, interpret=False):
    """Device-resident UCA stage: applies the pit-link flats/mag updates on
    device (the host mutations of connectivity_pits,
    dem_processing.py:1360-1371), then solves the accumulation fixed point.
    Everything stays on device; only scalars and the small link triples
    crossed the host boundary."""
    if has_drained:
        # mode="drop": the packed device path marks invalid lanes with an
        # out-of-bounds sentinel (n*m); the host path repeat-pads in-bounds
        # indices (idempotent sets) — both are exact under drop semantics
        flats = (flats.ravel().at[drained_idx].set(False, mode="drop")
                 .reshape(flats.shape))
        mag = (mag.ravel().at[drained_idx]
               .set(drained_mag.astype(mag.dtype), mode="drop")
               .reshape(mag.shape))
    W = receiver_weights(section, proportion, elev)
    base = base_area(dX2, dY2, elev.shape, elev.dtype)
    min_area = jnp.nanmin(base)
    area, n_sweeps = _solve_uca(base, W, elev.shape,
                                pit_src if has_pits else None,
                                pit_dst if has_pits else None,
                                pit_w if has_pits else None,
                                max_iters, check_every, solver, block_size,
                                interpret)
    area = finalize_uca(area, flats)
    edge_todo = seeds_and_edge_todo(W, section, elev)
    return area, n_sweeps, min_area, edge_todo, flats, mag


@jax.jit
def _apply_carve_delta(elev_d, idx, vals):
    """Apply host-carved elevation changes as an index/value scatter —
    bit-identical to re-uploading the carved canvas (unchanged pixels keep
    their device values; changed pixels get the same cast the full upload
    would apply)."""
    return elev_d.ravel().at[idx].set(vals).reshape(elev_d.shape)


@partial(jax.jit, static_argnames=("below_sea",))
def _has_pits_program(elev, below_sea=False):
    """Any pit present? (ring-minimum strictly above center & sea mask —
    the exact pit test of conditioning.drain_pit_paths).  One scalar
    crosses the host boundary; a pit-free canvas then skips the carve's
    two full-canvas transfers.

    NaN-insensitive (fmin): a NaN (no-data) neighbor must count as +inf, not
    poison the ring minimum — the exact host test (scipy minimum_filter in
    drain_pit_paths) ignores non-leading NaNs and does flag pits beside
    no-data holes.  False positives only cost the host round trip, which
    applies the exact test itself."""
    from .core.stencil import NEIGHBOR_OFFSETS, shift

    mn = jnp.full(elev.shape, jnp.inf, elev.dtype)
    for di, dj in NEIGHBOR_OFFSETS:
        mn = jnp.fmin(mn, shift(elev, di, dj, jnp.inf))
    sea = (elev != 0) if below_sea else (elev > 0)
    return jnp.any((mn > elev) & sea)


@partial(jax.jit, static_argnames=("on_uca", "limits"))
def _twi_program(uca, mag, min_area, min_slope, sat_limit, on_uca, limits):
    """TWI on device (dem_processing.py:1647-1677 semantics, x10 stored)."""
    twi = uca
    if on_uca:
        cap = sat_limit * min_area
        twi = jnp.minimum(twi, cap)
    twi = jnp.log(twi / (mag + min_slope))
    if limits:
        sat = jnp.log(sat_limit * min_area / min_slope)
        twi = jnp.minimum(twi, sat)
    return twi * 10


@partial(jax.jit, static_argnames=("has_pits",))
def _edge_flood_program(elev, section, proportion, edge_todo,
                        pit_src, pit_dst, pit_w, has_pits):
    """Flood the initial edge-todo mask downstream through the drainage
    graph — the ``edge_todo[j] += edge_todo[i]*w`` propagation drain_area
    performs during the fresh solve, whose boolean complement is the
    reference's ``edge_done`` (dem_processing.py:973-975).  The fresh call
    runs with skip_edge=0 (cyutils.pyx:89), and on the pruned DAG an edge
    receiver is never `done` before its parents push, so the done-gated
    edge skip (cyutils.pyx:159-161) never fires: the flood is plain
    reachability."""
    W = receiver_weights(section, proportion, elev)
    if has_pits:
        return reachability(edge_todo, W, pit_src, pit_dst, pit_w)
    return reachability(edge_todo, W)


class _Field:
    """State array that can live host-side (numpy) or device-side (jax).

    The reference exposes every state array as numpy
    (dem_processing.py:98-154); on a remote-attached TPU each host↔device
    crossing costs ~0.1 s of tunnel latency, so the device-backend fast path
    keeps intermediates device-resident and this descriptor materializes the
    numpy view lazily on first attribute read (then caches it).  Plain
    assignments behave exactly like before (host array, device copy
    dropped)."""

    def __set_name__(self, owner, name):
        self.name = name
        self._np = "_np_" + name
        self._dev = "_dev_" + name

    def __get__(self, obj, objtype=None):
        if obj is None:
            return self
        val = obj.__dict__.get(self._np)
        if val is None:
            dev = obj.__dict__.get(self._dev)
            if dev is not None:
                val = np.asarray(dev)
                obj.__dict__[self._np] = val
        return val

    def __set__(self, obj, value):
        obj.__dict__[self._np] = value
        obj.__dict__[self._dev] = None


def _bucket_floor(n_px, divisor=256):
    """Canvas-derived padding bucket: compile keys must be a function of
    the canvas SHAPE for typical terrains, not of data-dependent counts —
    counts that jitter across a power-of-two boundary between runs
    (perturbed reruns of the same terrain) would otherwise recompile the
    multi-second Pallas solve per run.  n_px/divisor bounds the typical
    pit/link density with a generous margin; only terrains beyond it pay
    a (rare) data-dependent recompile."""
    cap = 1024
    while cap < n_px // divisor:
        cap *= 2
    return cap


def _pad_pits(pit_src, pit_dst, pit_w, floor=1024):
    """Pad pit-link triples to a power-of-two bucket (>= a canvas-derived
    floor, see _bucket_floor) so the jitted UCA program's compile key is
    shape-stable.  Padding entries have weight 0 (no-ops in the
    scatter)."""
    p = len(pit_src)
    cap = floor
    while cap < p:
        cap *= 2
    pad = cap - p
    return (np.concatenate([pit_src, np.zeros(pad, "int64")]),
            np.concatenate([pit_dst, np.zeros(pad, "int64")]),
            np.concatenate([pit_w, np.zeros(pad, "float64")]))


class DEMProcessor:
    """Compute D∞ slope/aspect, UCA, and TWI for one elevation raster."""

    # state arrays: numpy-facing, lazily fetched from device when the
    # device-resident fast path produced them (see _Field)
    elev = _Field()
    mag = _Field()
    direction = _Field()
    flats = _Field()
    section = _Field()
    proportion = _Field()
    uca = _Field()
    twi = _Field()
    edge_todo = _Field()

    # conditioning tunables (dem_processing.py:105-127 defaults)
    fill_flats = True
    fill_flats_below_sea = False
    fill_flats_source_tol = 1
    fill_flats_peaks = True
    fill_flats_pits = True
    fill_flats_max_iter = 10

    drain_pits = True
    drain_pits_path = True
    drain_pits_min_border = False
    drain_pits_spill = False
    drain_flats = False
    drain_pits_max_iter = 300
    drain_pits_max_dist = 32
    drain_pits_max_dist_XY = None

    apply_uca_limit_edges = False
    apply_twi_limits = False
    apply_twi_limits_on_uca = False

    uca_saturation_limit = 32
    twi_min_slope = 1e-3
    maximum_pit_area = 32
    circular_ref_maxcount = 50

    # UCA solver controls (new; no reference analog)
    uca_check_every = 4
    uca_max_iters = 1_000_000
    # "host" = exact reference semantics (numpy); "device" = on-device
    # label-flood/segment-reduction implementation (core.flats_device)
    conditioning_backend = "host"
    # "host" = serial per-pit growth; "device" = vmapped window growth
    # (ops.pit_growth)
    pit_backend = "host"
    # "jacobi" = global dense sweeps (works everywhere, exact reference
    # semantics); "blocked" = Pallas VMEM-resident Gauss-Seidel block
    # relaxation (compiled on TPU; interpret-mode elsewhere); "auto"
    # (default) = blocked on a TPU backend with a big-enough canvas, else
    # jacobi — on pit/flat-dense terrain the blocked solver converges in
    # ~20 corner-order rounds where jacobi needs ~700 sweeps
    uca_solver = "auto"
    # block size for the blocked solver (None = auto: 256/128); small values
    # only make sense with interpret-mode testing
    uca_block_size = None

    CONFIG_KEYS = [
        "fill_flats", "fill_flats_below_sea", "fill_flats_source_tol",
        "fill_flats_peaks", "fill_flats_pits", "fill_flats_max_iter",
        "drain_pits", "drain_pits_path", "drain_pits_min_border",
        "drain_pits_spill", "drain_flats", "drain_pits_max_iter",
        "drain_pits_max_dist", "drain_pits_max_dist_XY",
        "apply_uca_limit_edges", "apply_twi_limits", "apply_twi_limits_on_uca",
        "uca_saturation_limit", "twi_min_slope", "maximum_pit_area",
        "circular_ref_maxcount", "uca_check_every", "uca_max_iters",
        "conditioning_backend", "pit_backend", "uca_solver",
        "uca_block_size",
    ]

    def _resolved_solver(self, platform=None):
        """Resolve uca_solver="auto": Pallas blocked GS on a TPU backend
        with a big-enough canvas (it converges in ~corner-order rounds
        where jacobi needs ~longest-flow-path sweeps), jacobi elsewhere
        (exact reference semantics; interpret-mode Pallas would be slow)."""
        if self.uca_solver != "auto":
            return self.uca_solver
        if platform is None:
            platform = jax.devices()[0].platform
        arr = self._dev("elev")
        if arr is None:
            arr = self.__dict__.get("_np_elev")
        n, m = arr.shape if arr is not None else (0, 0)
        return "blocked" if platform == "tpu" and min(n, m) >= 256 \
            else "jacobi"

    # -- lazily-forced solve scalars (device fast path) --------------------
    # The UCA program returns (sweeps, min_area) as device scalars; forcing
    # them eagerly would cost a host round trip mid-pipeline.  These
    # properties present the reference's plain-attribute API while folding
    # pending device values on first host read.

    @property
    def uca_sweeps(self):
        v = self.__dict__.get("_uca_sweeps_val")
        if v is None:
            d = self.__dict__.pop("_uca_sweeps_dev", None)
            v = -1 if d is None else int(d)
            self.__dict__["_uca_sweeps_val"] = v
        return v

    @uca_sweeps.setter
    def uca_sweeps(self, v):
        self.__dict__["_uca_sweeps_val"] = int(v)
        self.__dict__.pop("_uca_sweeps_dev", None)

    @property
    def twi_min_area(self):
        d = self.__dict__.pop("_min_area_dev", None)
        if d is not None:
            self.__dict__["_twi_min_area"] = min(
                self.__dict__.get("_twi_min_area", np.inf), float(d))
        return self.__dict__.get("_twi_min_area", np.inf)

    @twi_min_area.setter
    def twi_min_area(self, v):
        self.__dict__["_twi_min_area"] = v

    def _twi_min_area_device(self, dtype):
        """min_area as a device scalar WITHOUT forcing a pending value."""
        host = jnp.asarray(self.__dict__.get("_twi_min_area", np.inf), dtype)
        pend = self.__dict__.get("_min_area_dev")
        if pend is None:
            return host
        return jnp.minimum(host, pend.astype(dtype))

    def _dev(self, name):
        return self.__dict__.get("_dev_" + name)

    def _set_dev(self, name, val):
        self.__dict__["_dev_" + name] = val
        self.__dict__["_np_" + name] = None

    def _has(self, name):
        """Whether the field is populated, without triggering a fetch."""
        return (self.__dict__.get("_np_" + name) is not None
                or self.__dict__.get("_dev_" + name) is not None)

    @property
    def _fast_device(self):
        """The device-resident fast path applies when both conditioning and
        pit backends are on-device and the default drain-pits mode is in
        effect (mode precedence of dem_processing.py:1094-1124)."""
        return (self.conditioning_backend == "device"
                and self.pit_backend == "device"
                and self.drain_pits)

    def _connectivity_pits(self):
        if self.pit_backend == "device":
            from .ops.pit_growth import connectivity_pits_device as fn
        else:
            fn = cond.connectivity_pits
        return fn(self.flats, self.elev, self.mag, self.dX, self.dY,
                  max_iter=self.drain_pits_max_iter,
                  max_dist=self.drain_pits_max_dist,
                  max_dist_XY=self.drain_pits_max_dist_XY,
                  min_border=self.drain_pits_min_border)

    def _drain_links(self):
        """Sparse (src, dst, weight) drain links + updated flats/mag for the
        configured pit/flat mode, with the reference's mode precedence
        (dem_processing.py:1094-1124: drain_pits, elif drain_flats, elif
        drain_pits_spill)."""
        if self.drain_pits:
            return self._connectivity_pits()
        if self.drain_flats:
            return cond.connectivity_flats(self.flats, self.elev, self.mag,
                                           self.dX)
        if self.drain_pits_spill:
            return cond.connectivity_pits_spill(
                self.section, self.flats, self.elev, self.mag,
                self.dX, self.dY,
                max_iter=self.drain_pits_max_iter,
                max_dist=self.drain_pits_max_dist,
                max_dist_XY=self.drain_pits_max_dist_XY)
        z = np.zeros(0)
        return z.astype("int64"), z.astype("int64"), z, self.flats, self.mag

    def __init__(self, elev_fn=None, **kwargs):
        if elev_fn:
            kwds = read_raster_kwargs(elev_fn)
            kwds.update(kwargs)
            kwargs = kwds

        elev = np.asarray(kwargs.pop("elev"))
        if np.ma.isMaskedArray(elev):
            elev = np.ma.filled(elev.astype("float64"), np.nan)
        self.elev = np.asarray(elev, dtype="float64")
        n = self.elev.shape[0]

        dX = kwargs.pop("dX", None)
        dY = kwargs.pop("dY", None)
        dX2 = kwargs.pop("dX2", None)
        dY2 = kwargs.pop("dY2", None)
        if not isinstance(dX, np.ndarray):
            if dX2 is None:
                dX2 = np.ones(n) * (1 if dX is None else dX)
            dX = np.ones(n - 1) * (1 if dX is None else dX)
        if not isinstance(dY, np.ndarray):
            if dY2 is None:
                dY2 = np.ones(n) * (1 if dY is None else dY)
            dY = np.ones(n - 1) * (1 if dY is None else dY)
        if dX2 is None:
            dX2 = np.ones(n)
        if dY2 is None:
            dY2 = np.ones(n)
        self.dX, self.dY = np.asarray(dX, "float64"), np.asarray(dY, "float64")
        self.dX2, self.dY2 = np.asarray(dX2, "float64"), np.asarray(dY2, "float64")

        self.bounds = kwargs.pop("bounds", None)
        self.transform = kwargs.pop("transform", None)

        self.direction = kwargs.pop("direction", None)
        self.mag = kwargs.pop("mag", None)
        self.uca = kwargs.pop("uca", None)
        self.twi = kwargs.pop("twi", None)
        self.flats = kwargs.pop("flats", None)
        self.section = None
        self.proportion = None
        self.edge_todo = None
        self.edge_done = None
        self.twi_min_area = np.inf

        for key, val in kwargs.items():
            if key not in self.CONFIG_KEYS:
                raise TypeError("Unknown DEMProcessor option %r" % key)
            setattr(self, key, val)

        # Two reference options are deliberate no-ops here (docs/PARITY.md):
        # the reference's fill_flats recursion discards its own result
        # (dem_processing.py:389-394 rebinds a dead local) and equal-elevation
        # cycles cannot survive the pruned DAG, so circular_ref_maxcount
        # never triggers.  Accepting a non-default value silently would
        # invite behavior-drift surprises — warn instead.
        import warnings as _warnings
        for key, default in (("circular_ref_maxcount", 50),
                             ("fill_flats_max_iter", 10)):
            if key in kwargs and kwargs[key] != default:
                _warnings.warn(
                    "%s=%r has no effect in pydem_tpu (see docs/PARITY.md): "
                    "the reference behavior it tunes is inert by design"
                    % (key, kwargs[key]), stacklevel=2)

    # -- persistence (dem_processing.py:260-303) ---------------------------

    def get_fn(self, name=None):
        from .geometry import get_fn_from_coords

        if not self.bounds:
            raise ValueError("processor has no bounds (constructed from an "
                             "in-memory array)")
        left, bottom, right, top = self.bounds
        return get_fn_from_coords((bottom, left, top, right), name)

    def get_full_fn(self, name, rootpath="."):
        import os

        return os.path.join(rootpath, name, self.get_fn(name))

    def save_array(self, fn, name):
        np.savez_compressed(fn + ".npz", getattr(self, name))

    def load_array(self, fn, name):
        """Load a previously saved field ('elev', 'mag', 'direction', 'uca',
        'twi') from <fn>.npz."""
        import os

        if not os.path.exists(fn + ".npz"):
            raise RuntimeError("File %s does not exist." % (fn + ".npz"))
        with np.load(fn + ".npz") as arr:
            setattr(self, name, arr["arr_0"])

    def load_elevation(self, fn):
        self.load_array(fn, "elev")

    def load_slope(self, fn):
        self.load_array(fn, "mag")

    def load_direction(self, fn):
        self.load_array(fn, "direction")

    def load_uca(self, fn):
        self.load_array(fn, "uca")

    # -- conditioning ------------------------------------------------------

    def calc_fill_flats(self):
        if self.conditioning_backend == "device":
            from .core.flats_device import fill_flats_device

            self.elev = np.asarray(fill_flats_device(
                jnp.asarray(self.elev),
                source_tol=self.fill_flats_source_tol,
                fill_peaks=self.fill_flats_peaks,
                fill_pits=self.fill_flats_pits,
                below_sea=self.fill_flats_below_sea,
                maximum_pit_area=self.maximum_pit_area,
            ))
            return self.elev
        self.elev = cond.fill_flats(
            self.elev,
            source_tol=self.fill_flats_source_tol,
            fill_peaks=self.fill_flats_peaks,
            fill_pits=self.fill_flats_pits,
            below_sea=self.fill_flats_below_sea,
            maximum_pit_area=self.maximum_pit_area,
        )
        return self.elev

    def calc_pit_drain_paths(self):
        self.elev = cond.drain_pit_paths(
            self.elev, self.dX, self.dY,
            max_iter=self.drain_pits_max_iter,
            max_dist=self.drain_pits_max_dist,
            max_dist_XY=self.drain_pits_max_dist_XY,
            below_sea=self.fill_flats_below_sea,
        )
        return self.elev

    # -- slope / direction -------------------------------------------------

    def calc_slopes_directions(self):
        if self._fast_device:
            self._slopes_device()
            return self.mag, self.direction

        if self.fill_flats:
            self.calc_fill_flats()
        if self.drain_pits_path:
            self.calc_pit_drain_paths()

        mag, direction, flats = _slope_program(
            jnp.asarray(self.elev), jnp.asarray(self.dX), jnp.asarray(self.dY))

        self.mag = np.asarray(mag)
        self.direction = np.asarray(direction)
        self.flats = np.asarray(flats)
        return self.mag, self.direction

    # -- device-resident fast path ----------------------------------------
    #
    # With conditioning_backend=pit_backend="device" the whole chain runs as
    # three device programs (fill-flats, slope+section, UCA+updates) with
    # exactly two unavoidable host crossings: the serial pit-path carver
    # (C++ on host elevation) and the small pit-link triples.  State arrays
    # stay device-resident; the numpy attributes materialize lazily
    # (_Field).  On a remote-attached chip this removes ~6 canvas-sized
    # tunnel round trips per tile.

    def _slopes_device(self):
        """Condition + slope/direction/flats/section on device."""
        elev_d = jnp.asarray(self.elev)
        _probe("elev_upload", elev_d)
        if self.fill_flats:
            from .core.flats_device import fill_flats_device

            elev_d = fill_flats_device(
                elev_d,
                source_tol=self.fill_flats_source_tol,
                fill_peaks=self.fill_flats_peaks,
                fill_pits=self.fill_flats_pits,
                below_sea=self.fill_flats_below_sea,
                maximum_pit_area=self.maximum_pit_area,
            )
            _probe("fill_flats_device", elev_d)
        if self.drain_pits_path and bool(_has_pits_program(
                elev_d, below_sea=self.fill_flats_below_sea)):
            # host carve round trip only when pits actually exist — the
            # scalar pit check costs one RTT.  Downstream: full canvas (the
            # carver needs global elevation); upstream: only the carved
            # DELTA pixels go back as an index/value scatter — the carve
            # touches O(pits · path length) pixels, so this replaces a
            # canvas-sized upload with a ~100 KB one.
            _probe("pit_gate")
            down = np.asarray(elev_d)
            _probe("carve_download")
            elev_np = cond.drain_pit_paths(
                down, self.dX, self.dY,
                max_iter=self.drain_pits_max_iter,
                max_dist=self.drain_pits_max_dist,
                max_dist_XY=self.drain_pits_max_dist_XY,
                below_sea=self.fill_flats_below_sea,
            )
            _probe("carve_host_kernel")
            with np.errstate(invalid="ignore"):
                # NaN != NaN is True; no-data pixels are never carved
                changed = np.flatnonzero((elev_np != down)
                                         & ~np.isnan(down))
            if changed.size:
                vals = elev_np.ravel()[changed].astype(down.dtype)
                # shape-stable bucket; repeated entries are idempotent sets
                cap = _bucket_floor(elev_d.size, divisor=64)
                while cap < changed.size:
                    cap *= 2
                rep = cap - changed.size
                idx = np.concatenate([changed,
                                      np.repeat(changed[-1:], rep)])
                vals = np.concatenate([vals, np.repeat(vals[-1:], rep)])
                elev_d = _apply_carve_delta(elev_d, jnp.asarray(idx),
                                            jnp.asarray(vals))
            _probe("carve_delta_upload", elev_d)
            self.__dict__["_np_elev"] = elev_np
            self.__dict__["_dev_elev"] = elev_d
        else:
            _probe("pit_gate")
            self._set_dev("elev", elev_d)

        mag, direction, flats, section, proportion = _pre_program(
            elev_d, jnp.asarray(self.dX), jnp.asarray(self.dY))
        _probe("pre_program", section)
        for k, v in (("mag", mag), ("direction", direction),
                     ("flats", flats), ("section", section),
                     ("proportion", proportion)):
            self._set_dev(k, v)

    def _calc_uca_device(self, fetch=True):
        import warnings

        from .ops.pit_growth import pit_links_device_packed

        if self._dev("section") is None:
            self._slopes_device()
        elev_d = self._dev("elev")
        if elev_d is None:
            elev_d = jnp.asarray(self.elev)

        kw = dict(max_iter=self.drain_pits_max_iter,
                  max_dist=self.drain_pits_max_dist,
                  max_dist_XY=self.drain_pits_max_dist_XY,
                  min_border=self.drain_pits_min_border)
        packed = pit_links_device_packed(self._dev("flats"), elev_d,
                                         self.dX, self.dY, **kw)
        _probe("pit_links", None if not isinstance(packed, dict)
               else packed["wgt"])
        if isinstance(packed, dict):
            # device-resident links: nothing canvas- or link-sized crossed
            # the host boundary (only the pit coords + a 3-scalar stats
            # fetch inside pit_links_device_packed)
            if packed["n_warn"]:
                warnings.warn("%d pits had no place to drain to in this "
                              "chunk" % packed["n_warn"])
            src, dst, wgt = packed["src"], packed["dst"], packed["wgt"]
            drained_idx = packed["drained_idx"]
            drained_mag = packed["drained_mag"]
            has_pits = has_drained = True
        else:  # packed is None: no pits at all
            z = np.zeros(0, "int64")
            wgt = np.zeros(0, "float64")
            src, dst, wgt = _pad_pits(z, z, wgt,
                                      floor=_bucket_floor(elev_d.size))
            drained_idx, drained_mag = z, np.zeros(0, "float64")
            has_pits = has_drained = False

        area, n_sweeps, min_area, edge_todo, flats2, mag2 = \
            _uca_chain_program(
                elev_d, self._dev("section"), self._dev("proportion"),
                self._dev("flats"), self._dev("mag"),
                jnp.asarray(self.dX2), jnp.asarray(self.dY2),
                jnp.asarray(src), jnp.asarray(dst), jnp.asarray(wgt),
                jnp.asarray(drained_idx), jnp.asarray(drained_mag),
                has_pits, has_drained, self.uca_max_iters,
                self.uca_check_every, solver=self._resolved_solver(),
                block_size=self.uca_block_size,
                interpret=jax.devices()[0].platform != "tpu")
        _probe("uca_solve", area)
        # keep the solve scalars device-resident: forcing them here would
        # stall the dispatch pipeline on a tunnel round trip before TWI can
        # even be enqueued — the lazy properties fold them on first host
        # read (manager metrics etc.)
        self.__dict__["_uca_sweeps_dev"] = n_sweeps
        self.__dict__.pop("_uca_sweeps_val", None)
        # fold any still-pending previous solve's min_area (the reference
        # accumulates min(self.twi_min_area, min_area) per calc_uca call)
        prev_pending = self.__dict__.get("_min_area_dev")
        if prev_pending is not None:
            min_area = jnp.minimum(prev_pending, min_area)
        self.__dict__["_min_area_dev"] = min_area
        self._set_dev("uca", area)
        self._set_dev("mag", mag2)
        self._set_dev("flats", flats2)
        self._set_dev("edge_todo", edge_todo)
        self._edge_done = None
        # min_area stays a device scalar (forced only if edge_done is ever
        # computed — a tile-workflow path, not the hot chain)
        self._edge_flood_args = (self._dev("section"),
                                 self._dev("proportion"),
                                 (jnp.asarray(src), jnp.asarray(dst),
                                  jnp.asarray(wgt)),
                                 has_pits, min_area)
        return self.uca if fetch else None

    def find_flats(self):
        self.flats = self.mag == FLAT_ID_INT

    # -- UCA ---------------------------------------------------------------

    def calc_uca(self, plotflag=False, edge_init_data=None, uca_init=None):
        if (uca_init is None and self._fast_device
                and (not self._has("direction")
                     or self._dev("section") is not None)):
            return self._calc_uca_device()
        if self.direction is None:
            self.calc_slopes_directions()
        if uca_init is not None:
            return self._calc_uca_edge_update(edge_init_data, uca_init)

        section, proportion = _section_program(
            jnp.asarray(self.direction), jnp.asarray(self.flats),
            jnp.asarray(self.dX), jnp.asarray(self.dY))
        self.section = np.asarray(section)
        self.proportion = np.asarray(proportion)

        pit_src, pit_dst, pit_w, flats2, mag2 = self._drain_links()
        keep = pit_w > 1e-8  # adjacency pruning, dem_processing.py:1136
        pit_src, pit_dst, pit_w = pit_src[keep], pit_dst[keep], pit_w[keep]

        has_pits = pit_src.size > 0
        pit_src, pit_dst, pit_w = _pad_pits(
            pit_src, pit_dst, pit_w,
            floor=_bucket_floor(np.asarray(self.elev).size))

        area, n_sweeps, min_area, edge_todo = _uca_program(
            jnp.asarray(self.elev), section, proportion, jnp.asarray(flats2),
            jnp.asarray(self.dX2), jnp.asarray(self.dY2),
            jnp.asarray(pit_src), jnp.asarray(pit_dst), jnp.asarray(pit_w),
            has_pits, self.uca_max_iters, self.uca_check_every,
            solver=self._resolved_solver(), block_size=self.uca_block_size,
            interpret=jax.devices()[0].platform != "tpu")
        self.uca_sweeps = int(n_sweeps)
        self.twi_min_area = min(self.twi_min_area, float(min_area))

        self.uca = np.asarray(area)
        self.mag = np.asarray(mag2)
        self.flats = np.asarray(flats2)

        self.edge_todo = np.asarray(edge_todo)
        # edge_done needs the todo mask flooded downstream through the whole
        # drainage graph (an O(longest-path) sweep).  It only matters for
        # tile-based workflows, so defer it: the property computes it on
        # first access (see :attr:`edge_done`).
        self._edge_done = None
        self._edge_flood_args = (section, proportion,
                                 (jnp.asarray(pit_src), jnp.asarray(pit_dst),
                                  jnp.asarray(pit_w)),
                                 has_pits, float(min_area))
        return self.uca

    @property
    def edge_done(self):
        """Per-pixel "no further cross-tile input pending" mask
        (dem_processing.py:973-980): the complement of the edge-todo mask
        flooded downstream, with masked pixels always done and — under
        ``apply_uca_limit_edges`` — saturated pixels (uca > 2·limit·min_area)
        marked done as the large-domain early-exit.  Computed lazily on
        first access (costs an O(longest-flow-path) on-device flood)."""
        if self._edge_done is None and self._edge_flood_args is not None:
            section, proportion, pits, has_pits, min_area = \
                self._edge_flood_args
            flood = _edge_flood_program(
                jnp.asarray(self.elev), section, proportion,
                jnp.asarray(self.edge_todo), *pits, has_pits)
            done = ~np.asarray(flood)
            # masked (no-data) pixels never await cross-tile input (:975)
            done[np.isnan(self.elev)] = True
            if self.apply_uca_limit_edges:
                # "2x because of bifurcations" (dem_processing.py:977-980)
                with np.errstate(invalid="ignore"):
                    done[self.uca > self.uca_saturation_limit * 2
                         * min_area] = True
            self._edge_done = done
        return self._edge_done

    @edge_done.setter
    def edge_done(self, value):
        self._edge_done = value
        self._edge_flood_args = None

    def _calc_uca_edge_update(self, edge_init_data, uca_init):
        """Incremental cross-tile edge update: propagate only the *delta*
        area attributable to newly-finished neighbor edges.

        Functional port of the reference's tile edge-resolution pass
        (dem_processing.py:682-771 setup, :778-862 propagation) on the dense
        solver: already-initialized edge pixels are blocked from receiving
        (the ``done[row_id] & on_edge`` skip of cyutils.pyx:159-161) and the
        remaining todo-mask is flooded forward (drain_connections).
        """
        shape = self.elev.shape
        edge_data, edge_init_done, edge_init_todo = edge_init_data
        init = np.zeros(shape, "float64")
        done = np.zeros(shape, bool)
        todo = np.zeros(shape, bool)
        sides = {"left": (slice(None), 0), "right": (slice(None), -1),
                 "top": (0, slice(None)), "bottom": (-1, slice(None))}
        for key, val in sides.items():
            done[val] |= np.asarray(edge_init_done[key]).reshape(done[val].shape)
            init[val] += (np.asarray(edge_data[key])
                          * np.asarray(edge_init_done[key])).reshape(init[val].shape)
            todo[val] |= np.asarray(edge_init_todo[key]).reshape(todo[val].shape)
        for key, val in sides.items():
            sel = init[val]
            sel[~done[val]] = 0
            init[val] = sel

        uca0 = np.asarray(uca_init, "float64")

        section, proportion = _section_program(
            jnp.asarray(self.direction), jnp.asarray(self.flats),
            jnp.asarray(self.dX), jnp.asarray(self.dY))
        self.section = np.asarray(section)
        self.proportion = np.asarray(proportion)

        pit_src, pit_dst, pit_w, flats2, mag2 = self._drain_links()
        keep = pit_w > 1e-8
        pit_src, pit_dst, pit_w = pit_src[keep], pit_dst[keep], pit_w[keep]
        has_pits = pit_src.size > 0
        pit_src, pit_dst, pit_w = _pad_pits(pit_src, pit_dst, pit_w)
        pits = ((jnp.asarray(pit_src), jnp.asarray(pit_dst),
                 jnp.asarray(pit_w)) if has_pits else (None, None, None))

        W = receiver_weights(section, proportion, jnp.asarray(self.elev))

        # seed the delta: newly-done edges minus the area already counted
        ids0 = done & todo
        todo_active = todo & ~done
        delta0 = np.zeros(shape, "float64")
        delta0[done[:, 0], 0] = init[done[:, 0], 0] - uca0[done[:, 0], 0]
        delta0[done[:, -1], -1] = init[done[:, -1], -1] - uca0[done[:, -1], -1]
        delta0[-1, done[-1, :]] = init[-1, done[-1, :]] - uca0[-1, done[-1, :]]
        delta0[0, done[0, :]] = init[0, done[0, :]] - uca0[0, done[0, :]]
        delta0[flats2] = np.nan

        # Effective done-state (dem_processing.py:820-833): everything is
        # done except strict descendants of the seed set (drain_connections
        # flood), then the seeds themselves are re-marked done.  Edge pixels
        # that are done never receive (cyutils skip rule); pixels outside
        # seeds ∪ descendants are never activated so they never push.
        from .core.uca import flow_sweep  # boolean one-step via weights

        Wb = np.asarray(W) > 0
        one_step = np.zeros(shape, bool)
        from .core.stencil import NEIGHBOR_OFFSETS
        for k, (di, dj) in enumerate(NEIGHBOR_OFFSETS):
            src = Wb[k] & ids0
            shifted = np.zeros(shape, bool)
            tgt = shifted
            si = slice(max(0, di), shape[0] + min(0, di))
            sj = slice(max(0, dj), shape[1] + min(0, dj))
            oi = slice(max(0, -di), shape[0] + min(0, -di))
            oj = slice(max(0, -dj), shape[1] + min(0, -dj))
            tgt[si, sj] = src[oi, oj]
            one_step |= tgt
        if has_pits:
            flat_one = one_step.ravel()
            seeds_flat = ids0.ravel()
            sel = seeds_flat[np.asarray(pit_src)] & (np.asarray(pit_w) > 0)
            flat_one[np.asarray(pit_dst)[sel]] = True
            one_step = flat_one.reshape(shape)
        reach1 = np.asarray(reachability(jnp.asarray(one_step), W, *pits))

        edge = np.asarray(grid_edge_mask(shape))
        done_eff = ~reach1 | ids0
        fdt = jnp.asarray(delta0).dtype
        receive = jnp.asarray(~(edge & done_eff), fdt)
        push = jnp.asarray(ids0 | reach1, fdt)
        delta, _n = accumulate_update(
            jnp.asarray(delta0), W, receive, push, *pits,
            max_iters=self.uca_max_iters, check_every=self.uca_check_every)
        delta = np.array(delta)
        delta[flats2] = np.nan

        flooded = reachability(jnp.asarray(todo_active), W, *pits)

        self.uca = uca0 + delta
        self.mag = np.asarray(mag2)
        self.flats = np.asarray(flats2)
        self.edge_todo = todo_active
        self.edge_done = ~np.asarray(flooded)
        return self.uca

    # -- TWI ---------------------------------------------------------------

    def calc_twi(self):
        if not self._has("uca"):
            if (self._fast_device and (not self._has("direction")
                                       or self._dev("section") is not None)):
                self._calc_uca_device(fetch=False)
            else:
                self.calc_uca()
        if (self._dev("uca") is not None and self._dev("mag") is not None
                and self.__dict__.get("_np_uca") is None
                and self.__dict__.get("_np_mag") is None):
            # device-resident TWI: uca/mag never leave the chip.  Only taken
            # while the numpy views were never materialized — a fetched
            # numpy array may have been mutated in place, in which case the
            # host formula below (operating on the live numpy state) is the
            # source of truth.
            uca_d, mag_d = self._dev("uca"), self._dev("mag")
            twi10 = _twi_program(
                uca_d, mag_d,
                self._twi_min_area_device(uca_d.dtype),
                jnp.asarray(self.twi_min_slope, uca_d.dtype),
                jnp.asarray(self.uca_saturation_limit, uca_d.dtype),
                self.apply_twi_limits_on_uca, self.apply_twi_limits)
            _probe("twi_program", twi10)
            self._set_dev("twi", twi10)
            out = np.asarray(twi10) / 10
            _probe("twi_download")
            return out
        min_area = self.twi_min_area
        min_slope = self.twi_min_slope
        twi = self.uca.copy()
        if self.apply_twi_limits_on_uca:
            twi[twi > self.uca_saturation_limit * min_area] = \
                self.uca_saturation_limit * min_area
        with np.errstate(invalid="ignore", divide="ignore"):
            twi = np.log(twi / (self.mag + min_slope))
        if self.apply_twi_limits:
            sat = np.log(self.uca_saturation_limit * min_area / min_slope)
            twi[twi > sat] = sat
        # store ×10 for integer-resolution storage, return unscaled — the
        # reference does exactly this (dem_processing.py:1662-1677)
        self.twi = twi * 10
        return twi
