"""Benchmark: grid-points/sec/chip for the full device chain
(D∞ slope/direction + flats + UCA-to-convergence + TWI).

Runs on whatever platform the environment provides (the driver provides one
real TPU chip via the 'axon' platform; falls back to CPU).  Prints ONE JSON
line:

    {"metric": ..., "value": N, "unit": "px/s", "vs_baseline": R}

vs_baseline is measured against the *reference implementation's* throughput
(numpy pipeline + its Cython wavefront kernel re-created in C++ at -O3 via
tools/oracle.py) on this machine's CPU at 1024², the largest size where the
reference finishes quickly.  Ratio > 1 means pydem_tpu is faster per chip
than pyDEM per CPU.  The reference publishes no benchmark numbers of its own
(BASELINE.md), so this measured baseline is the comparison standard.
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
BASELINE_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "benchmarks", "baseline_cache.json")


def make_cone(n, dtype="float32"):
    x, y = np.mgrid[-1:1:complex(0, n), -1:1:complex(0, n)]
    elev = 1 - np.sqrt(x**2 + y**2) / np.sqrt(2.0)
    return (elev - elev.min() + 0.05).astype(dtype)


def _enable_compile_cache():
    """Persistent compile cache, keyed by platform: XLA compiles of the 4
    Gauss-Seidel kernel orientations dominate cold-start wall clock (~3 min
    at 4096²).  Never share a cache dir across platforms — AOT entries
    compiled for another host's CPU flags mis-execute silently."""
    import jax

    platform = jax.devices()[0].platform
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/pydem_tpu_bench_cache_%s" % platform)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def bench_tpu(n):
    import jax
    import jax.numpy as jnp
    from pydem_tpu.parallel.sharded import terrain_step

    _enable_compile_cache()

    elev = jnp.asarray(make_cone(n))
    dX = jnp.ones(n - 1, jnp.float32)
    dY = jnp.ones(n - 1, jnp.float32)
    dX2 = jnp.ones(n, jnp.float32)
    dY2 = jnp.ones(n, jnp.float32)

    # Measurement notes: each rep perturbs the input (defeats any remote
    # result caching) and syncs on a scalar that depends on the whole UCA
    # loop (uca_sweeps), so timing covers real execution without paying the
    # full device->host canvas transfer per rep.
    dev = jax.devices()[0]
    solver = "blocked" if dev.platform == "tpu" else "jacobi"
    eps = [jnp.float32(1e-6 * (i + 1)) for i in range(8)]
    out = terrain_step(elev + eps[-1], dX, dY, dX2, dY2, uca_solver=solver)
    np.asarray(out["uca"])  # warm compile + one full transfer
    reps = 5
    t0 = time.perf_counter()
    for i in range(reps):
        out = terrain_step(elev + eps[i], dX, dY, dX2, dY2, uca_solver=solver)
        sweeps = int(out["uca_sweeps"])  # scalar sync
    dt = (time.perf_counter() - t0) / reps
    return n * n / dt, dt, sweeps, str(dev.platform)


def bench_reference(n):
    """Reference pipeline throughput on this host (slope + UCA + TWI)."""
    import warnings

    import oracle

    if oracle._load_native() is None:
        return None
    elev = make_cone(n, "float64")
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        ref = oracle.reference_processor(
            elev, fill_flats=False, drain_pits_path=False)
        t0 = time.perf_counter()
        ref.calc_slopes_directions()
        ref.calc_uca()
        ref.calc_twi()
        dt = time.perf_counter() - t0
    return n * n / dt


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


def bench_slope_only(n):
    import jax
    import jax.numpy as jnp
    from pydem_tpu.core.slope_direction import find_flats_edges, slopes_directions

    @jax.jit
    def prog(elev, dX, dY):
        mag, direction = slopes_directions(elev, dX, dY)
        flats = find_flats_edges(elev, mag, direction)
        # scalar sync handle: eager indexing on the axon platform would cost
        # a ~100ms tunnel round trip per rep
        return mag, direction, flats, jnp.nansum(mag)

    elev = jnp.asarray(make_cone(n))
    dX = jnp.ones(n - 1, jnp.float32)
    eps = [jnp.float32(1e-6 * (i + 1)) for i in range(6)]
    out = prog(elev + eps[-1], dX, dX)
    np.asarray(out[0])
    reps = 5
    t0 = time.perf_counter()
    for i in range(reps):
        out = prog(elev + eps[i], dX, dX)
        float(out[3])
    dt = (time.perf_counter() - t0) / reps
    return n * n / dt, dt


def bench_hard_terrain(n):
    """Full DEMProcessor chain (device backends) on pit/flat-rich terrain,
    including host orchestration and conditioning.  Steady-state: the first
    pass warms the XLA compiles (the persistent cache cannot capture remote
    axon-server compiles, which run 30-130s for the conditioning programs);
    the second pass on perturbed terrain is what a production multi-tile
    sweep pays per tile."""
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

    run(0.0)  # warm compiles
    dt, dp = run(1e-7)
    return n * n / dt, dt, dp


def full_report(primary):
    lines = ["# pydem_tpu benchmark report", "",
             "Metrics per BASELINE.json configs; one TPU v5e chip via the "
             "axon tunnel.", ""]
    v, dt = bench_slope_only(N_TPU)
    lines.append("- slope/aspect only (%d²): **%.1f Mpx/s** (%.4f s)"
                 % (N_TPU, v / 1e6, dt))
    lines.append("- full chain slope+UCA+TWI (%d² cone): **%.1f Mpx/s** "
                 "(%.4f s, %d UCA iters, vs_baseline %.1fx)"
                 % (N_TPU, primary["value"] / 1e6,
                    primary["detail"]["seconds_per_run"],
                    primary["detail"]["uca_sweeps"],
                    primary["vs_baseline"] or 0))
    if N_TPU == 2048:  # scaling point: larger canvas amortizes dispatch/RTT
        v, dt, sweeps, _p = bench_tpu(4096)
        lines.append("- full chain (4096² cone): **%.1f Mpx/s** (%.4f s, "
                     "%d UCA rounds)" % (v / 1e6, dt, sweeps))
    n_hard = max(512, N_TPU // 2)
    v, dt, dp = bench_hard_terrain(n_hard)
    lines.append("- hard terrain full chain incl. conditioning (%d², "
                 "quantized noisy cone + sea notch): **%.2f Mpx/s** (%.2f s, "
                 "%d UCA sweeps)" % (n_hard, v / 1e6, dt,
                                     getattr(dp, "uca_sweeps", -1)))
    lines.append("")
    lines.append("Multi-chip: single chip available here; sharded-equivalence"
                 " is validated on an 8-device CPU mesh (tests/test_sharded"
                 ".py) and via the driver's dryrun_multichip.")
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "benchmarks", "REPORT.md")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines), file=sys.stderr)


def main():
    value, dt, sweeps, platform = bench_tpu(N_TPU)

    baseline = None
    try:
        if os.path.exists(BASELINE_CACHE):
            with open(BASELINE_CACHE) as f:
                baseline = json.load(f)["reference_px_per_s"]
    except Exception:
        baseline = None
    if baseline is None:
        try:
            baseline = bench_reference(N_REF)
            if baseline:
                os.makedirs(os.path.dirname(BASELINE_CACHE), exist_ok=True)
                with open(BASELINE_CACHE, "w") as f:
                    json.dump({"reference_px_per_s": baseline,
                               "reference_n": N_REF}, f)
        except Exception as e:
            print("baseline measurement failed: %r" % e, file=sys.stderr)
            baseline = None

    vs = (value / baseline) if baseline else None
    primary = {
        "metric": "DEM grid-points/sec/chip, full chain slope+UCA(converged)+TWI, %d^2 cone, %s" % (N_TPU, platform),
        "value": round(value),
        "unit": "px/s",
        "vs_baseline": round(vs, 2) if vs else None,
        "detail": {"seconds_per_run": round(dt, 4), "uca_sweeps": sweeps,
                   "reference_px_per_s": round(baseline) if baseline else None},
    }
    if "--full" in sys.argv:
        full_report(primary)
    print(json.dumps(primary))


if __name__ == "__main__":
    main()
