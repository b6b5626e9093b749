"""Instrumented per-stage timing of the hard-terrain device chain (1024²).

Replays DEMProcessor's device fast path step by step with explicit syncs so
each component's cost (device compute vs host work vs tunnel transfer) is
attributable.  Forced syncs add RTTs the fused chain doesn't pay, so the sum
slightly exceeds the unsynced end-to-end time — this is a diagnostic, not
the bench.
"""
import os
import sys
import time
import warnings

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from bench import make_hard_terrain

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1024

jax.config.update("jax_compilation_cache_dir",
                  "/tmp/pydem_tpu_bench_cache_%s" % jax.devices()[0].platform)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def t(label, f):
    t0 = time.perf_counter()
    out = f()
    dt = time.perf_counter() - t0
    print("  %-38s %8.4f s" % (label, dt))
    return out, dt


def run(eps, label):
    from pydem_tpu import DEMProcessor
    from pydem_tpu.api import (_has_pits_program, _pre_program, _twi_program,
                               _uca_chain_program, _bucket_floor, _pad_pits)
    from pydem_tpu.core import conditioning as cond
    from pydem_tpu.core.flats_device import fill_flats_device
    from pydem_tpu.ops.pit_growth import pit_links_device

    print("=== %s (eps=%g) ===" % (label, eps))
    elev = make_hard_terrain(N)
    elev[1:-1, 1:-1] += eps
    dp = DEMProcessor(elev=elev, conditioning_backend="device",
                      pit_backend="device")
    total0 = time.perf_counter()

    (elev_d,), t_up = t("elev upload (4MB f32)", lambda: (
        jax.block_until_ready(jnp.asarray(dp.elev)),))
    (elev_d,), t_ff = t("fill_flats_device", lambda: (
        jax.block_until_ready(fill_flats_device(
            elev_d, source_tol=1, fill_peaks=True, fill_pits=True,
            below_sea=False, maximum_pit_area=32)),))
    (hp,), t_gate = t("pit gate (scalar RTT)", lambda: (
        bool(_has_pits_program(elev_d)),))
    print("    has_pits:", hp)
    if hp:
        (elev_np,), t_down = t("carve: download canvas", lambda: (
            np.asarray(elev_d),))
        (elev_np2,), t_carve = t("carve: native host kernel", lambda: (
            cond.drain_pit_paths(elev_np, dp.dX, dp.dY, max_iter=300,
                                 max_dist=32),))
        (elev_d,), t_up2 = t("carve: upload canvas", lambda: (
            jax.block_until_ready(jnp.asarray(elev_np2)),))
    out, t_pre = t("_pre_program (slope+flats+sec)", lambda: tuple(
        jax.block_until_ready(
            _pre_program(elev_d, jnp.asarray(dp.dX), jnp.asarray(dp.dY)))))
    mag, direction, flats, section, proportion = out

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        links, t_links = t("pit_links_device (incl. fetches)", lambda:
                           pit_links_device(flats, elev_d, dp.dX, dp.dY))
    src, dst, wgt, drained_idx, drained_mag = links
    print("    n_links=%d n_drained=%d" % (len(src), len(drained_idx)))

    def assemble():
        keep = wgt > 1e-8
        s, d, w = src[keep], dst[keep], wgt[keep]
        floor = _bucket_floor(elev_d.size)
        s, d, w = _pad_pits(s, d, w, floor=floor)
        di, dm = drained_idx, drained_mag
        if di.size:
            cap = floor
            while cap < di.size:
                cap *= 2
            rep = cap - di.size
            di = np.concatenate([di, np.repeat(di[-1:], rep)])
            dm = np.concatenate([dm, np.repeat(dm[-1:], rep)])
        return s, d, w, di, dm

    (packed,), t_asm = t("host link bucket/pad", lambda: (assemble(),))
    s, d, w, di, dm = packed

    def solve():
        return tuple(jax.block_until_ready(_uca_chain_program(
            elev_d, section, proportion, flats, mag,
            jnp.asarray(dp.dX2), jnp.asarray(dp.dY2),
            jnp.asarray(s), jnp.asarray(d), jnp.asarray(w),
            jnp.asarray(di), jnp.asarray(dm),
            len(s) > 0, len(di) > 0, dp.uca_max_iters, dp.uca_check_every,
            solver="blocked", block_size=None, interpret=False)))

    out, t_uca = t("_uca_chain_program (blocked GS)", lambda: solve())
    area, n_sweeps, min_area, edge_todo, flats2, mag2 = out

    def twi():
        t10 = _twi_program(area, mag2, min_area,
                           jnp.asarray(1e-3, area.dtype),
                           jnp.asarray(32, area.dtype), False, False)
        return jax.block_until_ready(t10)

    (twi10,), t_twi = t("_twi_program", lambda: (twi(),))
    (_twi_np,), t_fetch = t("twi download (4MB)", lambda: (
        np.asarray(twi10),))
    total = time.perf_counter() - total0
    print("  %-38s %8.4f s" % ("TOTAL (sum of synced stages)", total))
    print("    uca rounds: %d" % int(n_sweeps))
    return total


def link_probe():
    a = np.random.default_rng(0).random((1024, 1024)).astype("float32")
    d = jax.block_until_ready(jnp.asarray(a))
    # RTT: tiny scalar round trip
    s = jnp.float32(1.0)
    for lbl, f in (
        ("RTT (scalar up+down)", lambda: float(jnp.asarray(
            np.float32(time.time() % 1)) + 0)),
        ("upload 4MB", lambda: jax.block_until_ready(
            jnp.asarray(a + np.float32(np.random.rand())))),
    ):
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            f()
            ts.append(time.perf_counter() - t0)
        print("  %-24s %s" % (lbl, " ".join("%.4f" % x for x in ts)))
    dd = jax.block_until_ready(jnp.asarray(a) * 2)
    ts = []
    for i in range(3):
        dd = jax.block_until_ready(dd + np.float32(1))
        t0 = time.perf_counter()
        np.asarray(dd)
        ts.append(time.perf_counter() - t0)
    print("  %-24s %s" % ("download 4MB", " ".join("%.4f" % x for x in ts)))


if __name__ == "__main__":
    print("platform:", jax.devices()[0].platform)
    print("-- link probe --")
    link_probe()
    run(4e-7, "warmup (compiles)")
    run(1e-7, "timed 1")
    run(2e-7, "timed 2")
