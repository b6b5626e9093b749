"""Pallas TPU kernel: block-resident UCA accumulation sweeps.

The XLA path (``core.uca.accumulate``) pays a full HBM round trip of
x + 8 weight planes per Jacobi sweep (~160 MB/sweep at 2048²), and each sweep
moves information by only one pixel.  This kernel restructures the fixed point
as *block-local relaxation*: the canvas is tiled into B×B blocks; each grid
step DMAs one block (+halo) of x and of the 8 weight planes into VMEM and
iterates the sweep **in VMEM until the block stops changing** (halo frozen),
then writes the block back.  One outer "round" therefore costs the HBM
traffic of a single global sweep but propagates flow across an entire block
(up to ~2B pixels of path) — outer rounds scale with path length in *block*
units, the on-device analog of the reference's tile-by-tile edge resolution
(process_manager.py:1090-1249), with VMEM playing the role of the tile and
the grid loop the role of the scheduler.

TPU alignment: Mosaic requires DMA window offsets/sizes aligned to the
(8, 128) tile, so the canvas is padded by 8 rows / 128 cols on each side and
each block loads an aligned (B+16) × (B+256) window; the 1-px halo lives at
offsets (7, 127) inside it.  B must be a multiple of 128.

Convergence: block-Jacobi / chaotic relaxation on a nilpotent (DAG) operator
reaches the same fixed point as plain Jacobi; each round's per-block changed
flags drive the outer loop.  Converged blocks cost one sweep + DMA.

The kernel runs in interpret mode on CPU (tests) and compiled on TPU.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.stencil import NEIGHBOR_OFFSETS

HR = 8     # row padding (sublane tile)
HC = 128   # col padding (lane tile)


def _block_kernel(x_ref, w_ref, base_ref, out_ref, chg_ref, x_s, x0_s,
                  *, B, inner_max):
    """Iterate one (pre-exploded, halo-carrying) block in VMEM until locally
    converged.  Inputs arrive via BlockSpec auto-pipelining (double-buffered
    contiguous tiles) — no manual DMA."""
    i = pl.program_id(0)
    j = pl.program_id(1)

    x_s[:] = x_ref[0]
    x0_s[:] = x_s[HR: HR + B, HC: HC + B]
    base = base_ref[:]

    def sweep_into_scratch():
        """One Jacobi sweep updating the interior of x_s in place (halo
        frozen); returns whether anything changed."""
        x = x_s[:]
        w = w_ref[0]  # (8, B+2HR, B+2HC) tile for this block
        acc = base
        for k, (di, dj) in enumerate(NEIGHBOR_OFFSETS):
            # receiver p interior at (HR..HR+B, HC..HC+B); source q = p - o_k
            r0, c0 = HR - di, HC - dj
            acc = acc + (w[k, r0: r0 + B, c0: c0 + B]
                         * x[r0: r0 + B, c0: c0 + B])
        changed = jnp.any(acc != x[HR: HR + B, HC: HC + B])
        x_s[HR: HR + B, HC: HC + B] = acc
        return changed

    def cond(state):
        it, changed = state
        return jnp.logical_and(it < inner_max, changed)

    def body(state):
        it, _changed = state
        # batch sweeps per convergence check: the any() reduce costs about
        # as much as a sweep, and extra sweeps past the fixed point are
        # no-ops numerically
        for _ in range(3):
            sweep_into_scratch()
        return it + 4, sweep_into_scratch()

    jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.bool_(True)))

    out_ref[:] = x_s[HR: HR + B, HC: HC + B]
    chg_ref[i, j] = jnp.any(
        x_s[HR: HR + B, HC: HC + B] != x0_s[:]).astype(jnp.int32)


def _explode(xp, nb_i, nb_j, B, planes=None):
    """Gather overlapping halo windows into contiguous per-block tiles:
    (nb_i*nb_j, [planes,] B+2HR, B+2HC)."""
    idx = jnp.arange(nb_i * nb_j)
    ii = (idx // nb_j) * B
    jj = (idx % nb_j) * B
    if planes is None:
        def one(i0, j0):
            return jax.lax.dynamic_slice(xp, (i0, j0),
                                         (B + 2 * HR, B + 2 * HC))
    else:
        def one(i0, j0):
            return jax.lax.dynamic_slice(xp, (0, i0, j0),
                                         (planes, B + 2 * HR, B + 2 * HC))
    return jax.vmap(one)(ii, jj)


def _round(x, w_tiles, base, *, B, inner_max, interpret):
    n, m = x.shape
    nb_i, nb_j = n // B, m // B
    xp = jnp.pad(x, ((HR, HR), (HC, HC)))
    x_tiles = _explode(xp, nb_i, nb_j, B)
    kernel = functools.partial(_block_kernel, B=B, inner_max=inner_max)
    x_new, changed = pl.pallas_call(
        kernel,
        grid=(nb_i, nb_j),
        in_specs=[
            pl.BlockSpec((1, B + 2 * HR, B + 2 * HC),
                         lambda i, j: (i * pl.num_programs(1) + j, 0, 0)),
            pl.BlockSpec((1, 8, B + 2 * HR, B + 2 * HC),
                         lambda i, j: (i * pl.num_programs(1) + j, 0, 0, 0)),
            pl.BlockSpec((B, B), lambda i, j: (i, j)),  # base block
        ],
        out_specs=[
            pl.BlockSpec((B, B), lambda i, j: (i, j)),
            # whole flag array as one SMEM block; each grid step writes [i, j]
            pl.BlockSpec((nb_i, nb_j), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, m), x.dtype),
            jax.ShapeDtypeStruct((nb_i, nb_j), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((B + 2 * HR, B + 2 * HC), x.dtype),
            pltpu.VMEM((B, B), x.dtype),
        ],
        interpret=interpret,
    )(x_tiles, w_tiles, base)
    return x_new, changed


@functools.partial(jax.jit,
                   static_argnames=("B", "inner_max", "max_rounds",
                                    "interpret"))
def accumulate_blocked(base, W, B=256, inner_max=None, max_rounds=100_000,
                       interpret=False):
    """Solve area = base + A·area with block-resident relaxation.

    ``base``: (n, m); ``W``: (8, n, m).  n, m must be multiples of B (the
    caller pads the canvas; pad pixels carry zero weights); B a multiple of
    128 on TPU (any multiple of 8 in interpret mode).  Returns
    ``(area, n_rounds)``.
    """
    n, m = base.shape
    assert n % B == 0 and m % B == 0, "canvas must be padded to block size"
    if inner_max is None:
        inner_max = 2 * B + 4
    nb_i, nb_j = n // B, m // B
    w_pad = jnp.pad(W, ((0, 0), (HR, HR), (HC, HC)))
    w_tiles = _explode(w_pad, nb_i, nb_j, B, planes=8)

    def cond(state):
        _x, changed, rounds = state
        return jnp.logical_and(changed > 0, rounds < max_rounds)

    def body(state):
        x, _c, rounds = state
        x_new, chg = _round(x, w_tiles, base, B=B, inner_max=inner_max,
                            interpret=interpret)
        return x_new, jnp.sum(chg), rounds + 1

    x0, chg0 = _round(base, w_tiles, base, B=B, inner_max=inner_max,
                      interpret=interpret)
    x, _, rounds = jax.lax.while_loop(
        cond, body, (x0, jnp.sum(chg0), jnp.int32(1)))
    return x, rounds


# The 4 fast-sweeping corner orders (SE, NW, SW, NE).  Orientation is a
# STATIC block-visit-order remap, not a data flip: each block relaxes to its
# local fixed point regardless of within-block order, so only the order in
# which blocks observe each other's fresh values matters.  Grid step (i, j)
# therefore processes block (nb_i-1-i, j) under a row flip etc. — no flipped
# canvases, no per-orientation weight copies, no exploded tiles.
_FLIPS = ((False, False), (True, True), (False, True), (True, False))

# Compact receiver encoding: every pixel has at most TWO nonzero outgoing
# weights (its D∞ facet pair, dem_processing.py:1021-1070), so the 8 dense
# weight planes compress to one packed index plane K = k1*16 + k2 (k in 0..7;
# 15 = "no edge") plus ONE weight plane W1 — the slot-2 weight is recovered
# in-kernel as 1 - W1, bitwise identical to the dense plane because the
# slots are ordered so that complement holds (receiver_weights computes the
# facet pair as (proportion, 1.0 - proportion)).  This cuts the GS block
# kernel's HBM traffic from x + 8 weight planes to x + 2 planes per visit.
_NO_EDGE = 15


def compact_from_dense(W):
    """Compress dense (8, n, m) receiver planes to ``(K, W1)``.

    Contract: each pixel has ≤2 nonzero entries across k, and when two exist
    they are complementary (w_a + w_b == 1 with one of them computed as
    ``1.0 - other`` — true for every W built by ``core.receivers``).  The
    two slots are ordered so that ``1 - W1`` reproduces the second weight
    bitwise; pixels violating the complement contract in BOTH orders would
    lose ~1 ulp on the second weight (cannot occur for D∞ facet weights).
    """
    shape = W.shape[1:]
    k1 = jnp.full(shape, _NO_EDGE, jnp.int32)
    k2 = jnp.full(shape, _NO_EDGE, jnp.int32)
    w1 = jnp.zeros(shape, W.dtype)
    w2 = jnp.zeros(shape, W.dtype)
    for k in range(8):
        wk = W[k]
        nz = wk != 0
        t1 = nz & (k1 == _NO_EDGE)
        k1 = jnp.where(t1, k, k1)
        w1 = jnp.where(t1, wk, w1)
        t2 = nz & ~t1 & (k2 == _NO_EDGE)
        k2 = jnp.where(t2, k, k2)
        w2 = jnp.where(t2, wk, w2)
    both = k2 != _NO_EDGE
    one = W.dtype.type(1)
    swap = both & (one - w1 != w2) & (one - w2 == w1)
    k1f = jnp.where(swap, k2, k1)
    w1f = jnp.where(swap, w2, w1)
    k2f = jnp.where(swap, k1, k2)
    K = k1f * 16 + jnp.where(both, k2f, _NO_EDGE)
    return K, w1f


def _expand_compact(K, w1, out_planes):
    """Expand (K, W1) windows into the 8 per-neighbor weight planes, writing
    ``out_planes[k]`` (a VMEM scratch).  Runs once per block visit."""
    k1 = K >> 4
    k2 = K & 15
    w2 = jnp.where(k2 != _NO_EDGE, 1 - w1, jnp.zeros_like(w1))
    for k in range(8):
        out_planes[k] = (jnp.where(k1 == k, w1, 0)
                         + jnp.where(k2 == k, w2, 0))


def _subset_grid(nb_i, nb_j, subset):
    """Grid shape for a GS round restricted to ``subset`` blocks."""
    if subset == "all":
        return (nb_i, nb_j)
    # the frame/interior mappings assume a >=3x3 block grid (the sharded
    # split gate); with nb_i < 3 the boundary frame undercounts and
    # duplicates blocks — refuse rather than relax the wrong blocks
    assert nb_i >= 3 and nb_j >= 3, \
        "subset rounds need a >=3x3 block grid (got %dx%d)" % (nb_i, nb_j)
    if subset == "interior":
        return (nb_i - 2, nb_j - 2)
    return (1, 2 * nb_j + 2 * (nb_i - 2))  # boundary frame, row-major-ish


def _gs_kernel(xp_hbm, k_hbm, w1_hbm, base_hbm, prev_ref, xp_out, chg_ref,
               x_s, k_s, w1_s, base_s, w_s, x0_s, sem_in, sem_k, sem_w,
               sem_b, sem_out, *, B, inner_max, nb_i, nb_j, flip_i, flip_j,
               subset):
    """Gauss-Seidel block step: read the halo window of the LIVE (aliased)
    canvas and the COMPACT receiver windows (packed index plane + one weight
    plane, see :func:`compact_from_dense`) straight from HBM, expand the
    weights to 8 per-neighbor planes in VMEM, relax in VMEM until the block
    stops changing, write the interior back.  ``flip_i/flip_j``
    statically reverse the block visit order (the corner-sweep orientation).

    ``subset`` restricts which blocks relax: "all", "interior" (blocks not
    touching the canvas edge, visited on an (nb_i-2)×(nb_j-2) grid), or
    "boundary" (the frame, visited on a 1×(2·nb_j + 2·(nb_i-2)) grid).  The
    sharded caller runs interior blocks while the next halo ppermute is in
    flight, then boundary blocks after it lands
    (parallel.sharded.accumulate_sharded — the halo/compute overlap).  Each
    call touches ONLY its own blocks — a subset round costs its share of
    the full round, not a predicated full pass.
    """
    del xp_hbm  # aliased with xp_out; read the output ref for fresh values
    i = pl.program_id(0)
    j = pl.program_id(1)
    if subset == "all":
        bi0, bj0 = i, j
    elif subset == "interior":
        bi0, bj0 = i + 1, j + 1
    else:  # boundary: top row, bottom row, then left/right columns
        t = j
        side = t - 2 * nb_j
        bi0 = jnp.where(t < nb_j, 0,
                        jnp.where(t < 2 * nb_j, nb_i - 1, 1 + side // 2))
        bj0 = jnp.where(t < nb_j, t,
                        jnp.where(t < 2 * nb_j, t - nb_j,
                                  (side % 2) * (nb_j - 1)))
    bi = (nb_i - 1 - bi0) if flip_i else bi0
    bj = (nb_j - 1 - bj0) if flip_j else bj0
    # chg flags are written in BLOCK space (not program-id space): rounds
    # at different orientations must agree on which block a flag names for
    # the cross-round frontier to be sound.  The boundary subset's frame
    # mapping is not a 2-D grid, so it keeps program ids (its flags are
    # only ever summed, never used as a frontier).
    if subset == "all":
        ci, cj = bi, bj
    elif subset == "interior":
        ci, cj = bi - 1, bj - 1
    else:
        ci, cj = i, j

    # cross-round frontier: a block whose 3x3 neighborhood reported no
    # change last round (and whose base/pit inflow is unchanged — folded
    # into prev by the driver) would relax to itself; skip the whole visit
    # including its DMA.  prev all-ones disables the skip (first round,
    # callers that do not thread flags).
    dirty = jnp.int32(0)
    for di in (-1, 0, 1):
        for dj in (-1, 0, 1):
            qi = jnp.clip(bi + di, 0, nb_i - 1)
            qj = jnp.clip(bj + dj, 0, nb_j - 1)
            inb = ((bi + di >= 0) & (bi + di < nb_i)
                   & (bj + dj >= 0) & (bj + dj < nb_j))
            dirty = dirty | jnp.where(inb, prev_ref[qi, qj], 0)

    @pl.when(dirty == 0)
    def _skip():
        chg_ref[ci, cj] = 0

    @pl.when(dirty > 0)
    def _visit():
        read = pltpu.make_async_copy(
            xp_out.at[pl.ds(bi * B, B + 2 * HR),
                      pl.ds(bj * B, B + 2 * HC)],
            x_s, sem_in)
        read.start()
        kread = pltpu.make_async_copy(
            k_hbm.at[pl.ds(bi * B, B + 2 * HR), pl.ds(bj * B, B + 2 * HC)],
            k_s, sem_k)
        kread.start()
        wread = pltpu.make_async_copy(
            w1_hbm.at[pl.ds(bi * B, B + 2 * HR),
                      pl.ds(bj * B, B + 2 * HC)],
            w1_s, sem_w)
        wread.start()
        bread = pltpu.make_async_copy(
            base_hbm.at[pl.ds(bi * B, B), pl.ds(bj * B, B)], base_s, sem_b)
        bread.start()
        read.wait()
        kread.wait()
        wread.wait()
        bread.wait()
        _expand_compact(k_s[:], w1_s[:], w_s)
        x0_s[:] = x_s[HR: HR + B, HC: HC + B]
        base = base_s[:]

        def sweep():
            # canonical neighbor order everywhere -> the f32 accumulation
            # is bitwise identical across orientations, so the fixed point
            # is orientation-stable and rounds go quiescent
            x = x_s[:]
            w = w_s[:]
            acc = base
            for k, (di, dj) in enumerate(NEIGHBOR_OFFSETS):
                r0, c0 = HR - di, HC - dj
                acc = acc + (w[k, r0: r0 + B, c0: c0 + B]
                             * x[r0: r0 + B, c0: c0 + B])
            changed = jnp.any(acc != x[HR: HR + B, HC: HC + B])
            x_s[HR: HR + B, HC: HC + B] = acc
            return changed

        def cond(state):
            it, changed = state
            return jnp.logical_and(it < inner_max, changed)

        def body(state):
            it, _changed = state
            for _ in range(3):
                sweep()
            return it + 4, sweep()

        jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.bool_(True)))

        write = pltpu.make_async_copy(
            x_s.at[pl.ds(HR, B), pl.ds(HC, B)],
            xp_out.at[pl.ds(bi * B + HR, B), pl.ds(bj * B + HC, B)],
            sem_out)
        write.start()
        write.wait()
        chg_ref[ci, cj] = jnp.any(
            x_s[HR: HR + B, HC: HC + B] != x0_s[:]).astype(jnp.int32)


def _gs_round(xp, k_pad, w1_pad, base, prev, *, B, inner_max, interpret,
              flips=(False, False), subset="all"):
    """One Gauss-Seidel round over the padded canvas (updated in place via
    aliasing) at the statically-flipped block order.  ``prev`` is the
    per-block changed flags of the previous round ((nb_i, nb_j) int32;
    all-ones disables frontier skipping).  Returns
    (new padded canvas, per-block changed flags)."""
    np_, mp_ = xp.shape
    n, m = np_ - 2 * HR, mp_ - 2 * HC
    nb_i, nb_j = n // B, m // B
    fi, fj = flips
    kernel = functools.partial(_gs_kernel, B=B, inner_max=inner_max,
                               nb_i=nb_i, nb_j=nb_j, flip_i=fi, flip_j=fj,
                               subset=subset)
    grid = _subset_grid(nb_i, nb_j, subset)

    xp_new, changed = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # live canvas (aliased)
            pl.BlockSpec(memory_space=pltpu.ANY),  # packed receiver indices
            pl.BlockSpec(memory_space=pltpu.ANY),  # slot-1 weights
            pl.BlockSpec(memory_space=pltpu.ANY),  # base area
            pl.BlockSpec((nb_i, nb_j), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),  # prev-round flags
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(grid, lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((np_, mp_), xp.dtype),
            jax.ShapeDtypeStruct(grid, jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((B + 2 * HR, B + 2 * HC), xp.dtype),
            pltpu.VMEM((B + 2 * HR, B + 2 * HC), k_pad.dtype),
            pltpu.VMEM((B + 2 * HR, B + 2 * HC), xp.dtype),
            pltpu.VMEM((B, B), xp.dtype),
            pltpu.VMEM((8, B + 2 * HR, B + 2 * HC), xp.dtype),
            pltpu.VMEM((B, B), xp.dtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        input_output_aliases={0: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(xp, k_pad, w1_pad, base, prev)
    return xp_new, changed


def gs_round_oriented(xp, k_pad, w1_pad, base, o, *, B, inner_max, interpret,
                      subset="all", prev=None):
    """One Gauss-Seidel round at orientation ``o`` (0..3, traced) over the
    (HR, HC)-padded canvas ``xp``.  ``k_pad``/``w1_pad`` are the
    (HR, HC)-padded compact receiver planes (:func:`compact_from_dense`);
    orientation selects one of 4 statically-compiled block-visit
    orders (lax.switch), touching no data.  ``prev`` optionally supplies
    the previous round's per-block changed flags ((nb_i, nb_j) int32) for
    cross-round frontier skipping; None visits every block.  Returns
    (new xp, per-block changed flags) — sum the flags for a change count.

    The pad ring of ``xp`` is treated as frozen inflow: zeros for a lone
    canvas, or neighbor-shard halo values written there by a sharded caller
    (parallel.sharded.accumulate_sharded).  ``subset`` restricts the round
    to interior or boundary blocks (see _gs_kernel).
    """
    if prev is None:
        np_, mp_ = xp.shape
        nb_i = (np_ - 2 * HR) // B
        nb_j = (mp_ - 2 * HC) // B
        prev = jnp.ones((nb_i, nb_j), jnp.int32)

    def mk(i):
        def run(ops):
            xp, b_eff, prev = ops
            return _gs_round(xp, k_pad, w1_pad, b_eff, prev, B=B,
                             inner_max=inner_max,
                             interpret=interpret, flips=_FLIPS[i],
                             subset=subset)
        return run
    return jax.lax.switch(o, [mk(i) for i in range(4)], (xp, base, prev))


def _block_any(mask, B):
    """(n, m) bool -> (n//B, m//B) int32: any within each BxB block."""
    n, m = mask.shape
    return jnp.any(mask.reshape(n // B, B, m // B, B),
                   axis=(1, 3)).astype(jnp.int32)


def _gs_driver(base, W, B, inner_max, max_rounds, interpret, fold=None):
    """Shared Gauss-Seidel round driver.

    ``fold(x) -> effective base`` is re-evaluated at the start of every
    round — used to inject the non-adjacent pit-link contributions.  With
    fold-before-relax, the per-block changed flags are a sound convergence
    test: an unchanged round implies an unchanged fold.

    Frontier: each round only visits blocks whose 3×3 neighborhood changed
    last round or whose folded base changed (dirty pit inflow) — the
    converged interior of a mostly-quiescent canvas costs nothing, the
    on-device analog of the reference's metric-driven tile skipping
    (process_manager.py:1090-1249).
    """
    n, m = base.shape
    assert n % B == 0 and m % B == 0, "canvas must be padded to block size"
    if inner_max is None:
        inner_max = 2 * B + 4

    K, W1 = compact_from_dense(W)
    k_pad = jnp.pad(K, ((HR, HR), (HC, HC)),
                    constant_values=_NO_EDGE * 16 + _NO_EDGE)
    w1_pad = jnp.pad(W1, ((HR, HR), (HC, HC)))

    def one_round(o, xp, b_eff, prev):
        return gs_round_oriented(xp, k_pad, w1_pad, b_eff, o, B=B,
                                 inner_max=inner_max, interpret=interpret,
                                 prev=prev)

    def interior(xp):
        return xp[HR: HR + n, HC: HC + m]

    xp0 = jnp.pad(base, ((HR, HR), (HC, HC)))
    b0 = base if fold is None else fold(interior(xp0))
    xp, chg0 = one_round(jnp.int32(0), xp0, b0, None)

    def cond(state):
        _xp, chg, _b, rounds = state
        return jnp.logical_and(jnp.sum(chg) > 0, rounds < max_rounds)

    def body(state):
        xp, chg, b_prev, rounds = state
        if fold is None:
            b, prev = base, chg
        else:
            b = fold(interior(xp))
            prev = chg | _block_any(b != b_prev, B)
        xp, chg = one_round(rounds % 4, xp, b, prev)
        return xp, chg, b, rounds + 1

    xp, _, _, rounds = jax.lax.while_loop(cond, body,
                                          (xp, chg0, b0, jnp.int32(1)))
    return interior(xp), rounds


@functools.partial(jax.jit,
                   static_argnames=("B", "inner_max", "max_rounds",
                                    "interpret"))
def accumulate_blocked_gs(base, W, B=256, inner_max=None, max_rounds=100_000,
                          interpret=False):
    """Gauss-Seidel variant of :func:`accumulate_blocked`.

    Each round processes blocks in grid order reading the *live* canvas, so
    flow aligned with the sweep order crosses the whole canvas in one round;
    rounds cycle through the 4 corner orders (statically-remapped block visit
    orders — no data movement), the fast-sweeping pattern for flow
    accumulation.  Rounds
    scale with the number of flow-direction reversals at block granularity
    instead of canvas-length/B — on large canvases this is the difference
    between ~4-8 rounds and ~n/B rounds.  Same fixed point as plain
    block-Jacobi (chaotic relaxation on a nilpotent nonnegative operator).
    """
    return _gs_driver(base, W, B, inner_max, max_rounds, interpret)


@functools.partial(jax.jit,
                   static_argnames=("B", "inner_max", "max_rounds",
                                    "interpret"))
def accumulate_blocked_pits_gs(base, W, pit_src, pit_dst, pit_w, B=256,
                               inner_max=None, max_rounds=100_000,
                               interpret=False):
    """Gauss-Seidel blocked relaxation with non-adjacent pit links: the pit
    contributions are folded into the effective base at the start of every
    round (see :func:`accumulate_blocked_pits` for why this nested fixed
    point is exact)."""
    def fold(x):
        contrib = x.ravel()[pit_src] * pit_w
        return base.ravel().at[pit_dst].add(contrib).reshape(base.shape)

    return _gs_driver(base, W, B, inner_max, max_rounds, interpret, fold=fold)


@functools.partial(jax.jit,
                   static_argnames=("B", "inner_max", "max_rounds",
                                    "interpret"))
def accumulate_blocked_pits(base, W, pit_src, pit_dst, pit_w, B=256,
                            inner_max=None, max_rounds=100_000,
                            interpret=False):
    """Blocked relaxation with non-adjacent pit links.

    Pit links (dem_processing.py:1269-1382) connect pixels farther than one
    step apart, so they cannot ride the 3×3 stencil.  They are folded into
    the *base* between block rounds: solve x = base + P·x_prev + A·x, update
    the pit contribution, repeat — a nested fixed point that converges to
    x = base + (A+P)·x since both operators are nonnegative and the combined
    graph is the reference's pruned (acyclic) drainage graph.
    """
    n, m = base.shape
    assert n % B == 0 and m % B == 0
    if inner_max is None:
        inner_max = 2 * B + 4
    nb_i, nb_j = n // B, m // B
    w_pad = jnp.pad(W, ((0, 0), (HR, HR), (HC, HC)))
    w_tiles = _explode(w_pad, nb_i, nb_j, B, planes=8)

    def pit_base(x):
        contrib = x.ravel()[pit_src] * pit_w
        return base.ravel().at[pit_dst].add(contrib).reshape(base.shape)

    def body(state):
        x, _chg, rounds = state
        b_eff = pit_base(x)
        x1, chg1 = _round(x, w_tiles, b_eff, B=B, inner_max=inner_max,
                          interpret=interpret)
        changed = jnp.sum(chg1) + jnp.any(x1 != x).astype(jnp.int32)
        return x1, jnp.where(jnp.any(x1 != x), changed, 0), rounds + 1

    def cond(state):
        _x, chg, rounds = state
        return jnp.logical_and(chg > 0, rounds < max_rounds)

    x0, chg0 = _round(base, w_tiles, base, B=B, inner_max=inner_max,
                      interpret=interpret)
    x, _, rounds = jax.lax.while_loop(
        cond, body, (x0, jnp.sum(chg0) + 1, jnp.int32(1)))
    return x, rounds
