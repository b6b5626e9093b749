"""Benchmark: grid-points/sec/chip for the full device chain
(D∞ slope/direction + flats + UCA-to-convergence + TWI).

Runs on whatever platform the environment provides (the driver provides one
real TPU chip via the 'axon' platform; falls back to CPU).  Prints ONE JSON
line:

    {"metric": ..., "value": N, "unit": "px/s", "vs_baseline": R}

vs_baseline is measured against the *reference implementation's* throughput
(numpy pipeline + its Cython wavefront kernel re-created in C++ at -O3 via
tools/oracle.py) on this machine's CPU — on the SAME terrain for each
config: a smooth 1024² cone for the headline chain and a quantized noisy
cone ("hard terrain": pit/flat-dense, the regime real DEMs live in) for the
conditioning-inclusive chain.  The reference publishes no numbers of its own
(BASELINE.md), so these measured baselines are the comparison standard.

Correctness gate: before any timing, the compiled production Pallas blocked
solver must reproduce the XLA jacobi fixed point on the bench terrain
(values + NaN pattern).  A miscompiled kernel fails the bench instead of
producing a fast lie.

Measurement notes (memory: the axon tunnel):
- sync by fetching a scalar the computation produced inside jit;
- the ~28 ms fetch RTT is amortized by running `reps` chained pipeline
  evaluations inside ONE jitted program (each on differently-perturbed
  input, defeating any result caching);
- persistent compile cache cannot capture axon-server compiles, so warmup
  happens per process before timing.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tools"))

N_TPU = int(os.environ.get("PYDEM_BENCH_N", 2048))
N_REF = int(os.environ.get("PYDEM_BENCH_REF_N", 1024))
N_HARD = int(os.environ.get("PYDEM_BENCH_HARD_N", 1024))
BASELINE_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "benchmarks", "baseline_cache.json")


def make_cone(n, dtype="float32"):
    x, y = np.mgrid[-1:1:complex(0, n), -1:1:complex(0, n)]
    elev = 1 - np.sqrt(x**2 + y**2) / np.sqrt(2.0)
    return (elev - elev.min() + 0.05).astype(dtype)


def make_hard_terrain(n, dtype="float64"):
    """Quantized noisy cone: flats + pits from quantization, plus a masked
    below-sea region (the reference's hard-terrain regimes)."""
    rng = np.random.RandomState(7)
    x, y = np.mgrid[-1:1:complex(0, n), -1:1:complex(0, n)]
    elev = 1 - np.sqrt(x**2 + y**2) / np.sqrt(2.0) + rng.randn(n, n) * 0.002
    elev = np.round(elev * 150) / 150  # quantization flats/pits
    elev = elev - elev.min() + 0.05
    elev[(x > 0.8) & (np.abs(y) < 0.1)] = 0.0  # sea notch
    return elev.astype(dtype)


def _enable_compile_cache():
    """Persistent compile cache, keyed by platform.  Never share a cache dir
    across platforms — AOT entries compiled for another host's CPU flags
    mis-execute silently."""
    import jax

    platform = jax.devices()[0].platform
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/pydem_tpu_bench_cache_%s" % platform)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _solver():
    import jax

    return "blocked" if jax.devices()[0].platform == "tpu" else "jacobi"


def gate_blocked_vs_jacobi(n):
    """Production-config correctness gate: the compiled Pallas blocked GS
    solver (B=256, aliased manual DMA, 4 corner orders) must match the XLA
    jacobi fixed point on the bench terrain, values + NaN pattern, BEFORE
    anything is timed.  Also gated on the hard terrain (pit links through
    accumulate_blocked_pits_gs)."""
    import jax
    import jax.numpy as jnp
    from pydem_tpu.parallel.sharded import terrain_step
    from pydem_tpu import DEMProcessor

    if jax.devices()[0].platform not in ("tpu",):
        return "skipped (no TPU: jacobi is the production solver here)"

    elev = jnp.asarray(make_cone(n))
    args = (jnp.ones(n - 1, jnp.float32), jnp.ones(n - 1, jnp.float32),
            jnp.ones(n, jnp.float32), jnp.ones(n, jnp.float32))
    a = terrain_step(elev, *args, uca_solver="jacobi")
    b = terrain_step(elev, *args, uca_solver="blocked")
    ua, ub = np.asarray(a["uca"]), np.asarray(b["uca"])
    if not (np.isnan(ua) == np.isnan(ub)).all():
        raise AssertionError("GATE FAILED: blocked vs jacobi NaN pattern "
                             "differs on %d² cone" % n)
    if not np.allclose(np.nan_to_num(ua), np.nan_to_num(ub),
                       rtol=1e-5, atol=1e-3):
        bad = np.nanmax(np.abs(ua - ub))
        raise AssertionError("GATE FAILED: blocked vs jacobi uca differs "
                             "(max %.3g) on %d² cone" % (bad, n))

    nh = min(512, n)
    eh = make_hard_terrain(nh)
    da = DEMProcessor(elev=eh.copy(), conditioning_backend="device",
                      pit_backend="device", uca_solver="jacobi")
    da.calc_uca()
    db = DEMProcessor(elev=eh.copy(), conditioning_backend="device",
                      pit_backend="device", uca_solver="blocked")
    db.calc_uca()
    if not (np.isnan(da.uca) == np.isnan(db.uca)).all():
        raise AssertionError("GATE FAILED: hard-terrain NaN pattern differs")
    if not np.allclose(np.nan_to_num(da.uca), np.nan_to_num(db.uca),
                       rtol=1e-4, atol=1e-2):
        bad = np.nanmax(np.abs(da.uca - db.uca))
        raise AssertionError("GATE FAILED: hard-terrain blocked vs jacobi "
                             "uca differs (max %.3g)" % bad)
    return "passed (cone %d² + hard %d²)" % (n, nh)


def bench_tpu(n, reps=5):
    """Full-chain throughput; sync amortized by chaining reps inside jit."""
    import functools

    import jax
    import jax.numpy as jnp
    from pydem_tpu.parallel.sharded import terrain_step

    solver = _solver()

    @functools.partial(jax.jit, static_argnames=("reps",))
    def multi(elev, dX, dY, dX2, dY2, reps):
        def body(i, acc):
            # per-rep perturbation > f32 eps so no result can be reused
            e = elev + (i + 1).astype(elev.dtype) * 1e-5
            out = terrain_step(e, dX, dY, dX2, dY2, uca_solver=solver)
            # fold every output in so nothing dead-code-eliminates
            return (acc + out["uca_sweeps"]
                    + jnp.isfinite(out["twi"]).sum().astype(jnp.int32) % 7)
        return jax.lax.fori_loop(0, reps, body, jnp.int32(0))

    elev = jnp.asarray(make_cone(n))
    args = (jnp.ones(n - 1, jnp.float32), jnp.ones(n - 1, jnp.float32),
            jnp.ones(n, jnp.float32), jnp.ones(n, jnp.float32))
    # warm both compiles (reps is a static arg -> two programs)
    int(multi(elev, *args, reps=1))
    int(multi(elev, *args, reps=reps))

    t0 = time.perf_counter()
    sync0 = int(multi(elev, *args, reps=1))
    t_one = time.perf_counter() - t0

    # best-of-3: one tunnel sync per batch (advisor r3: committed numbers
    # were single-run and tunnel-jitter noisy).  Each batch gets a distinct
    # input perturbation — a byte-identical replay on the axon tunnel can
    # spuriously return in ~0.1 ms (advisor r4 / memory: result memoization)
    dt = np.inf
    for b in (1, 2, 3):
        eb = elev + jnp.float32(b * 1e-4)
        t0 = time.perf_counter()
        sync = int(multi(eb, *args, reps=reps))
        dt = min(dt, (time.perf_counter() - t0) / reps)

    out = terrain_step(elev, *args, uca_solver=solver)
    sweeps = int(out["uca_sweeps"])
    return n * n / dt, dt, sweeps, str(jax.devices()[0].platform), t_one


def _link_bandwidth():
    """Measured host->device + device->host MB/s for a 4 MB canvas (the
    axon tunnel's throughput varies day to day and bounds the sync-heavy
    hard-terrain chain)."""
    import jax
    import jax.numpy as jnp

    a = np.random.default_rng(0).random((1024, 1024)).astype("float32")
    d = jnp.asarray(a)
    d.block_until_ready()  # warm path
    t0 = time.perf_counter()
    d = jnp.asarray(a + 1)
    d.block_until_ready()
    np.asarray(d)
    dt = time.perf_counter() - t0
    return round(8.0 / dt, 1)


def bench_hard_terrain(n):
    """Full DEMProcessor chain (device backends) on pit/flat-rich terrain,
    including host orchestration and conditioning — the number that matters
    for real DEMs.  Median of 3 steady-state runs (the axon tunnel adds
    per-dispatch jitter)."""
    import warnings

    from pydem_tpu import DEMProcessor

    def run(eps):
        elev = make_hard_terrain(n)
        elev[1:-1, 1:-1] += eps  # defeat result caching; keep edges/sea
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            t0 = time.perf_counter()
            dp = DEMProcessor(elev=elev, conditioning_backend="device",
                              pit_backend="device")
            dp.calc_twi()
            return time.perf_counter() - t0, dp

    # warm with a NONZERO eps: eps=0 has a (slightly) different pit set, so
    # warming there would leave the timed runs' data-dependent padding
    # bucket cold (a multi-second Pallas recompile inside the timing)
    run(4e-7)
    times = []
    for i in (1, 2, 3):
        dt, dp = run(i * 1e-7)
        times.append(dt)
    dt = float(np.median(times))
    stages = bench_hard_stages(n, run)
    return n * n / dt, dt, dp, stages


def bench_hard_stages(n, run):
    """One instrumented pass of the hard chain: per-stage wall time with a
    host-fetch sync at every boundary (api._stage_probe).  The forced syncs
    add tunnel RTTs the production fused chain does not pay, so the stage
    sum slightly EXCEEDS the headline time — this is attribution, not the
    record."""
    import time as _time

    import jax.numpy as jnp

    from pydem_tpu import api

    rows = []
    state = {"t": None}

    def probe(name, val):
        if val is not None:
            float(jnp.sum(jnp.where(jnp.isfinite(val), val, 0)))
        now = _time.perf_counter()
        rows.append((name, now - state["t"]))
        state["t"] = now

    api._stage_probe = probe
    try:
        # two passes: the probe's own sync programs (a sum per stage
        # shape/dtype) compile on first use — only the second pass is clean
        for eps in (5e-7, 6e-7):
            rows.clear()
            state["t"] = _time.perf_counter()
            run(eps)
    finally:
        api._stage_probe = None
    return rows


def bench_reference(n, hard=False):
    """Reference pipeline throughput on this host, same terrain."""
    import warnings

    import oracle

    if oracle._load_native() is None:
        return None
    if hard:
        elev = make_hard_terrain(n)
        kw = {}
    else:
        elev = make_cone(n, "float64")
        kw = dict(fill_flats=False, drain_pits_path=False)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        ref = oracle.reference_processor(elev, **kw)
        t0 = time.perf_counter()
        ref.calc_slopes_directions()
        ref.calc_uca()
        ref.calc_twi()
        dt = time.perf_counter() - t0
    return n * n / dt


def _baseline(key, fn, *args, **kw):
    """Measured-reference baselines, cached across runs."""
    cache = {}
    if os.path.exists(BASELINE_CACHE):
        try:
            with open(BASELINE_CACHE) as f:
                cache = json.load(f)
        except Exception:
            cache = {}
    if key in cache and cache[key]:
        return cache[key]
    try:
        val = fn(*args, **kw)
    except Exception as e:
        print("baseline %s failed: %r" % (key, e), file=sys.stderr)
        return None
    if val:
        cache[key] = val
        os.makedirs(os.path.dirname(BASELINE_CACHE), exist_ok=True)
        with open(BASELINE_CACHE, "w") as f:
            json.dump(cache, f, indent=1)
    return val


def bench_slope_only(n):
    import jax
    import jax.numpy as jnp
    from pydem_tpu.core.slope_direction import find_flats_edges, slopes_directions

    @jax.jit
    def prog(elev, dX, dY):
        mag, direction = slopes_directions(elev, dX, dY)
        flats = find_flats_edges(elev, mag, direction)
        return mag, direction, flats, jnp.nansum(mag)

    elev = jnp.asarray(make_cone(n))
    dX = jnp.ones(n - 1, jnp.float32)
    # distinct eps per (batch, rep): identical replays on the axon tunnel
    # can return spuriously fast (memoization; advisor r4)
    eps = [jnp.float32(1e-6 * (i + 1)) for i in range(20)]
    out = prog(elev + eps[-1], dX, dX)
    np.asarray(out[0])
    reps = 5
    # best-of-3 batches of 5: one tunnel sync per batch, minimum over
    # batches (advisor r3: single-run numbers committed as the record were
    # dominated by per-dispatch tunnel jitter)
    best = np.inf
    for b in range(3):
        t0 = time.perf_counter()
        for i in range(reps):
            out = prog(elev + eps[b * reps + i], dX, dX)
        float(out[3])
        best = min(best, (time.perf_counter() - t0) / reps)
    dt = best
    return n * n / dt, dt


def bench_stages(n):
    """Per-stage timings + a bytes-moved roofline table for the main chain.

    `min GB` is the analytic lower bound on HBM traffic (inputs read once +
    outputs written once, perfect fusion); `% roofline` is that bound's
    bandwidth over the measured time against the chip's HBM peak.  Numbers
    far below 100% mean the stage is latency/ragged-op bound, not
    bandwidth bound — the optimization signal the report exists to carry.
    """
    import functools

    import jax
    import jax.numpy as jnp
    from pydem_tpu.core.receivers import receiver_weights, section_proportion
    from pydem_tpu.core.slope_direction import (find_flats_edges,
                                                slopes_directions)
    from pydem_tpu.core.uca import base_area

    HBM_PEAK = 819e9  # v5e HBM bandwidth, bytes/s
    elev = jnp.asarray(make_cone(n))
    dX = jnp.ones(n - 1, jnp.float32)
    dX2 = jnp.ones(n, jnp.float32)
    REPS = 5
    MB = n * n * 4 / 1e6  # one f32 canvas in MB

    def chain(stage):
        @jax.jit
        def prog(elev):
            def body(i, acc):
                e = elev + (i + 1).astype(elev.dtype) * 1e-5
                return acc + stage(e)
            return jax.lax.fori_loop(0, REPS, body, jnp.float32(0))
        return prog

    def timeit(prog):
        float(prog(elev))  # compile + warm
        ep = elev + jnp.float32(3e-4)  # not a replay of the warm batch
        t0 = time.perf_counter()
        float(prog(ep))
        return (time.perf_counter() - t0) / REPS

    def s_slope(e):
        mag, d = slopes_directions(e, dX, dX)
        return jnp.nansum(mag) + jnp.nansum(d) % 7

    def s_pre(e):
        mag, d = slopes_directions(e, dX, dX)
        fl = find_flats_edges(e, mag, d)
        d = jnp.where(fl, -1, d)
        sec, prop = section_proportion(d, fl, dX, dX)
        W = receiver_weights(sec, prop, e)
        base = base_area(dX2, dX2, e.shape, e.dtype)
        return jnp.nansum(mag) + W.sum() + base[0, 0]

    t_slope = timeit(chain(s_slope))
    t_pre = timeit(chain(s_pre))

    from pydem_tpu.ops.uca_block import accumulate_blocked_gs
    from pydem_tpu.parallel.sharded import terrain_pre

    W, base = terrain_pre(elev, dX, dX, dX2, dX2)[3:5]

    @jax.jit
    def prog_gs(base, W):
        def body(i, acc):
            b = base + (i + 1).astype(base.dtype) * 1e-7
            area, r = accumulate_blocked_gs(b, W, B=256)
            return acc + area[0, 0] + r.astype(jnp.float32)
        return jax.lax.fori_loop(0, REPS, body, jnp.float32(0))

    float(prog_gs(base, W))
    bp = base + jnp.float32(3e-6)  # not a replay of the warm batch
    t0 = time.perf_counter()
    float(prog_gs(bp, W))
    t_gs = (time.perf_counter() - t0) / REPS
    rounds = int(accumulate_blocked_gs(base, W, B=256)[1])

    # analytic minimum HBM traffic per stage (canvas units, f32)
    rows = [
        ("slope/direction", t_slope, (1 + 2) * MB),
        ("terrain_pre (slope+flats+sec+W+base)", t_pre, (1 + 13) * MB),
        # per GS round: x halo-windows 2.13x + compact K/W1 windows 2x2.13x
        # + base 1x + write 1x (the 8 dense weight planes compress to 2,
        # ops.uca_block.compact_from_dense; frontier-skipped rounds move
        # less — this is the upper bound)
        ("UCA blocked-GS (%d rounds, compact K/W1)" % rounds, t_gs,
         rounds * (2.13 + 2 * 2.13 + 1 + 1) * MB),
    ]
    out = ["", "## Stage roofline (%d², f32, HBM peak %.0f GB/s)"
           % (n, HBM_PEAK / 1e9), "",
           "| stage | time (s) | min GB moved | achieved GB/s | % roofline |",
           "|---|---|---|---|---|",
           "", "Low roofline %% here is NOT unused bandwidth headroom: the "
           "GS kernel is VPU-compute bound (~25-50 in-VMEM sweeps per "
           "block visit vs ~16 µs of DMA — measured by inner_max capping), "
           "so cutting bytes further (done: 8 weight planes → 2 compact "
           "planes) does not move wall time; the bound is the relaxation "
           "math itself.  Directional in-VMEM sweeps were evaluated and "
           "NOT adopted: strip-serialized Gauss-Seidel measured 20% "
           "slower (small-op loop overhead at strip heights short enough "
           "to help), and scan-based line relaxation costs ~1.5 "
           "sweep-equivalents per application (log B steps x 3 ops vs a "
           "sweep's 16), so outer-rounds x (sweep + 2 scans) lands back "
           "in the same 25-50 sweep-equivalent budget the frozen-halo "
           "Jacobi loop already spends.", ""]
    hdr_end = out.index("|---|---|---|---|---|") + 1
    for name, t, mb in rows:
        gbs = mb / 1e3 / t
        out.insert(hdr_end, "| %s | %.4f | %.2f | %.0f | %.1f%% |"
                   % (name, t, mb / 1e3, gbs, 100 * gbs / (HBM_PEAK / 1e9)))
        hdr_end += 1
    return out


def bench_ooc(n=8192, superblock=4096, device_cache_bytes=None):
    """Out-of-core engine throughput at an n² logical canvas (store-backed,
    bounded memory).

    ``device_cache_bytes=None`` uses the real-device-memory default (on a
    16 GB chip an 8192² canvas fits whole → the spill-to-HBM fused path);
    a small explicit budget forces the true streaming regime (super-blocks
    round-tripping through the store every GS round)."""
    import shutil
    import tempfile
    import warnings

    import numpy as np

    from pydem_tpu.io.store import ArrayStore
    from pydem_tpu.outofcore import OutOfCoreEngine

    work = tempfile.mkdtemp(prefix="pydem_ooc_bench_")
    try:
        store = ArrayStore(os.path.join(work, "results.zarr"))
        store.create("elev_src", (n, n), "float64",
                     chunks=(superblock, superblock), fill=np.nan,
                     compress=False)
        S = superblock
        x, y = np.mgrid[-1:1:complex(0, n), -1:1:complex(0, n)]
        for i0 in range(0, n, S):
            for j0 in range(0, n, S):
                blk = (1 - np.sqrt(x[i0:i0 + S, j0:j0 + S] ** 2
                                   + y[i0:i0 + S, j0:j0 + S] ** 2)
                       / np.sqrt(2.0))
                store.write_window("elev_src", blk + 1.05, (i0, j0))
        ones_f = np.ones(n - 1)
        ones_p = np.ones(n)
        from pydem_tpu.profiling import StageTimer

        out = []
        # two passes in one process: axon compiles are not disk-cacheable,
        # so the first pass carries the one-time program compiles; the
        # second is the steady-state number.  Both are reported.
        for attempt in range(2):
            for key in ("elev", "slope", "aspect", "flats", "uca_state",
                        "uca", "twi"):
                store.delete(key)
            timer = StageTimer()
            with warnings.catch_warnings():
                warnings.simplefilter("ignore")
                eng = OutOfCoreEngine(
                    store, (n, n), ones_f, ones_f, ones_p, ones_p,
                    superblock=superblock,
                    dem_proc_kwargs={"fill_flats": False,
                                     "drain_pits_path": False},
                    device_cache_bytes=device_cache_bytes, timer=timer)
                mode = ("spill-to-HBM" if eng._fits_device_resident()
                        else "streaming")
                t0 = time.perf_counter()
                eng.run()
                dt = time.perf_counter() - t0
            out.append((n * n / dt, dt, eng.uca_rounds, mode,
                        timer.report()))
        return out[1] + (out[0][1],)  # warm metrics + cold seconds
    finally:
        shutil.rmtree(work, ignore_errors=True)


def mesh_scaling_table(n=256):
    """CPU-virtual-mesh scaling sweep in a subprocess (needs the cpu
    platform + device-count flags set before jax imports)."""
    import subprocess

    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    r = subprocess.run(
        [sys.executable,
         os.path.join(os.path.dirname(os.path.abspath(__file__)), "tools",
                      "mesh_scaling.py"), str(n)],
        capture_output=True, text=True, env=env, timeout=1800)
    lines = [ln for ln in r.stdout.splitlines() if ln.startswith("|")]
    return lines if r.returncode == 0 and lines else [
        "(mesh scaling sweep failed: rc=%d)" % r.returncode]


def full_report(primary, hard, mark=lambda w: None):
    lines = ["# pydem_tpu benchmark report", "",
             "Regenerated by every `python bench.py` run.  Metrics per "
             "BASELINE.json configs; one TPU v5e chip via the "
             "axon tunnel.  All vs_baseline ratios are measured against the "
             "reference implementation on the SAME terrain (tools/oracle.py "
             "+ its wavefront kernel rebuilt in C++ at -O3).", "",
             "Correctness gate (blocked Pallas == XLA jacobi, values + NaN "
             "pattern, before timing): %s" % primary["detail"]["gate"], ""]
    v, dt = bench_slope_only(N_TPU)
    mark("report: slope-only done")
    lines.append("- slope/aspect only (%d²): **%.1f Mpx/s** (%.4f s)"
                 % (N_TPU, v / 1e6, dt))
    lines.append("- full chain slope+UCA+TWI (%d² cone): **%.1f Mpx/s** "
                 "(%.4f s/run, %d UCA rounds, vs_baseline %.1fx)"
                 % (N_TPU, primary["value"] / 1e6,
                    primary["detail"]["seconds_per_run"],
                    primary["detail"]["uca_sweeps"],
                    primary["vs_baseline"] or 0))
    if N_TPU == 2048:  # scaling point: larger canvas amortizes dispatch/RTT
        try:
            v, dt, sweeps, _p, _t1 = bench_tpu(4096, reps=3)
            lines.append("- full chain (4096² cone): **%.1f Mpx/s** (%.4f s, "
                         "%d UCA rounds)" % (v / 1e6, dt, sweeps))
        except Exception as e:
            lines.append("- full chain (4096²): failed (%r)" % e)
        mark("report: 4096 scaling point done")
    lines.append("- hard terrain full chain incl. conditioning (%d², "
                 "quantized noisy cone + sea notch): **%.2f Mpx/s** "
                 "(%.2f s, vs reference on the same terrain: **%.1fx**)"
                 % (hard["n"], hard["px_per_s"] / 1e6, hard["seconds"],
                    hard["vs_baseline"] or 0))
    if hard.get("stages"):
        lines += ["", "### Hard-terrain per-stage breakdown (%d², one "
                  "instrumented pass; per-stage host-fetch syncs add RTTs "
                  "the fused production chain does not pay, so the sum "
                  "exceeds the headline time)" % hard["n"], "",
                  "| stage | time (s) |", "|---|---|"]
        for name, t in hard["stages"]:
            lines.append("| %s | %.4f |" % (name, t))
        lines.append("| (sum) | %.4f |"
                     % sum(t for _n, t in hard["stages"]))
    def _ooc_line(label, **kw):
        v, dt, r, mode, stages, cold_dt = bench_ooc(**kw)
        st = ", ".join("%s %.0fs" % (k, s) for k, s in stages.items())
        lines.append("- out-of-core engine, %s (8192² logical, 4096² "
                     "super-blocks, store-backed, %s path): **%.1f Mpx/s** "
                     "warm (%.1f s; first run incl. one-time axon program "
                     "compiles: %.1f s; %d UCA rounds; stages: %s)"
                     % (label, mode, v / 1e6, dt, cold_dt, r, st))
        return v

    try:
        # regime 1: real-device-memory budget -> the 8192² canvas fits a
        # 16 GB chip whole (spill-to-HBM fused path, zero per-round host IO)
        oocv = _ooc_line("device-memory budget")
        lines.append("  (1/%.0f of the in-HBM rate — the remaining cost is "
                     "~1.4 GB of canvas traffic over the axon tunnel, not "
                     "engine rounds)"
                     % max(primary["value"] / max(oocv, 1.0), 1.0))
    except Exception as e:
        lines.append("- out-of-core bench (device budget) failed: %r" % e)
    mark("report: out-of-core (device budget) done")
    try:
        # regime 2: 2 GiB budget -> the canvas does NOT fit; true streaming
        # (per-block static windows still device-cached, state rings
        # round-trip through the store each round) — the regime the engine
        # exists for on canvases larger than HBM
        _ooc_line("2 GiB budget (forced streaming)",
                  device_cache_bytes=2 << 30)
    except Exception as e:
        lines.append("- out-of-core bench (streaming) failed: %r" % e)
    mark("report: out-of-core (streaming) done")
    try:
        lines.extend(bench_stages(N_TPU))
    except Exception as e:
        lines.append("(stage roofline failed: %r)" % e)
    mark("report: stage roofline done")
    lines += ["", "## CPU-virtual-mesh scaling (honest multi-chip stand-in; "
              "512² canvas equivalent at 256² here, interpret-mode Pallas "
              "so absolute times are NOT TPU times)", ""]
    try:
        lines.extend(mesh_scaling_table())
    except Exception as e:
        lines.append("(sweep failed: %r)" % e)
    mark("report: mesh scaling done")
    lines.append("")
    lines.append("Multi-chip: single chip available here; sharded-equivalence"
                 " is validated on an 8-device CPU mesh (tests/test_sharded"
                 ".py, tests/test_manager_mesh.py), 2-process jax.distributed"
                 " (tests/test_multihost.py), and the driver's"
                 " dryrun_multichip (ProcessManager(mesh=...)).")
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "benchmarks", "REPORT.md")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines), file=sys.stderr)


def main():
    _enable_compile_cache()
    t_start = time.perf_counter()

    def mark(what):
        print("[bench +%6.1fs] %s" % (time.perf_counter() - t_start, what),
              file=sys.stderr)

    gate = gate_blocked_vs_jacobi(min(N_TPU, 2048))
    print("correctness gate: %s" % gate, file=sys.stderr)
    mark("gate done")

    value, dt, sweeps, platform, t_one = bench_tpu(N_TPU)
    mark("headline done")

    baseline = _baseline("cone_%d_px_per_s" % N_REF, bench_reference, N_REF)
    vs = (value / baseline) if baseline else None

    hard_v, hard_dt, _dp, hard_stages = bench_hard_terrain(N_HARD)
    mark("hard terrain done")
    hard_base = _baseline("hard_%d_px_per_s" % N_HARD, bench_reference,
                          N_HARD, hard=True)
    hard = {"n": N_HARD, "px_per_s": hard_v, "seconds": hard_dt,
            "vs_baseline": (hard_v / hard_base) if hard_base else None,
            "stages": hard_stages}

    primary = {
        "metric": "DEM grid-points/sec/chip, full chain slope+UCA(converged)+TWI, %d^2 cone, %s" % (N_TPU, platform),
        "value": round(value),
        "unit": "px/s",
        "vs_baseline": round(vs, 2) if vs else None,
        "detail": {
            "seconds_per_run": round(dt, 4),
            "uca_sweeps": sweeps,
            "gate": gate,
            "single_run_seconds_incl_sync": round(t_one, 4),
            "reference_px_per_s": round(baseline) if baseline else None,
            "hard_terrain": {
                "n": N_HARD,
                "px_per_s": round(hard_v),
                "seconds_per_run": round(hard_dt, 3),
                "vs_baseline_same_terrain": (round(hard["vs_baseline"], 2)
                                             if hard["vs_baseline"] else None),
                "reference_px_per_s": (round(hard_base) if hard_base
                                       else None),
                # per-stage attribution (instrumented pass; see REPORT.md)
                "stages": [[s, round(t, 4)] for s, t in hard_stages],
                # the hard chain still moves ~8 MB over the tunnel (elev up,
                # carve down, twi down); record the measured link bandwidth
                # so day-to-day tunnel throughput changes are attributable
                "link_MBps": _link_bandwidth(),
            },
        },
    }
    # Regression tripwire: compare against every prior round's recorded
    # bench (the round-2 49.5->28.1 Mpx/s regression went unnoticed for a
    # full round because nothing compared across rounds).
    import glob

    prev = []
    for fn in sorted(glob.glob(os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "BENCH_r*.json"))):
        try:
            with open(fn) as f:
                rec = json.load(f).get("parsed", {})
            if rec.get("value"):
                prev.append((os.path.basename(fn), rec["value"]))
        except Exception:
            pass
    if prev:
        best_fn, best = max(prev, key=lambda kv: kv[1])
        primary["detail"]["vs_best_prior_round"] = round(value / best, 3)
        if value < 0.9 * best:
            print("WARNING: headline %.1f Mpx/s is a REGRESSION vs %s "
                  "(%.1f Mpx/s)" % (value / 1e6, best_fn, best / 1e6),
                  file=sys.stderr)

    if "--skip-report" not in sys.argv:
        try:
            full_report(primary, hard, mark)
        except Exception as e:
            print("report generation failed: %r" % e, file=sys.stderr)
    print(json.dumps(primary))


def _main_with_retry():
    """The axon remote-compile endpoint occasionally drops a response
    mid-read; one transient HTTP failure must not lose the round's bench
    record, so retry the whole run once."""
    try:
        main()
    except Exception as e:
        msg = repr(e)
        if "remote_compile" in msg or "response body" in msg:
            print("transient remote-compile failure (%s); retrying once"
                  % msg[:200], file=sys.stderr)
            time.sleep(20)
            main()
        else:
            raise


if __name__ == "__main__":
    _main_with_retry()
