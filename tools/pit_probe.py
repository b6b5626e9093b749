"""Probe pit_links_device component costs on the TPU (hard terrain 1024²)."""
import os
import sys
import time
import warnings

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from bench import make_hard_terrain

jax.config.update("jax_compilation_cache_dir",
                  "/tmp/pydem_tpu_bench_cache_%s" % jax.devices()[0].platform)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1024

from pydem_tpu.api import _pre_program
from pydem_tpu.core import conditioning as cond
from pydem_tpu.core.flats_device import fill_flats_device
from pydem_tpu.ops.pit_growth import (_grow_and_extract, grow_pits,
                                      pit_links_device)

# build the exact chain state pit_links_device sees (per eps variant)


def chain(eps):
    elev = make_hard_terrain(N)
    elev[1:-1, 1:-1] += eps
    elev_d = fill_flats_device(jnp.asarray(elev))
    elev_np = cond.drain_pit_paths(np.asarray(elev_d), np.ones(N - 1),
                                   np.ones(N - 1))
    elev_d = jnp.asarray(elev_np)
    mag, direction, flats, section, proportion = _pre_program(
        elev_d, jnp.asarray(np.ones(N - 1)), jnp.asarray(np.ones(N - 1)))
    float(jnp.sum(flats))
    return elev_d, flats


with warnings.catch_warnings():
    warnings.simplefilter("ignore")
    states = [chain(i * 1e-7) for i in (1, 2, 3, 4)]

# fetch cost: bool canvas download + argwhere
for elev_d, flats in states[:1]:
    pits_bool = flats & (elev_d > 0)
    for i in range(3):
        t0 = time.perf_counter()
        pits = np.argwhere(np.asarray(pits_bool))
        print("  argwhere fetch: %.4f s (P=%d)" % (time.perf_counter() - t0,
                                                   len(pits)))

# grow_pits alone (device compute, synced via scalar)
cdX = np.concatenate([[0.0], np.cumsum(np.ones(N - 1))])


def time_grow(W, label):
    ts = []
    for k, (elev_d, flats) in enumerate(states):
        pits_bool = flats & (elev_d > 0)
        pits = np.argwhere(np.asarray(pits_bool))
        P = len(pits)
        PB = 512
        while PB < min(P, 2048):
            PB *= 2
        batch = pits[:PB]
        if len(batch) < PB:
            batch = np.concatenate(
                [batch, np.repeat(batch[-1:], PB - len(batch), axis=0)])
        pi = jnp.asarray(batch[:, 0])
        pj = jnp.asarray(batch[:, 1])
        t0 = time.perf_counter()
        oi, oj, drain, found, _clip = grow_pits(elev_d, pits_bool, pi, pj,
                                                W=W)
        s = float(jnp.sum(found)) + float(jnp.sum(drain))
        dt = time.perf_counter() - t0
        if k:  # first is compile
            ts.append(dt)
    print("  %-30s %s" % (label, " ".join("%.4f" % t for t in ts)))


time_grow(96, "grow_pits W=96 (PB batch)")
time_grow(32, "grow_pits W=32 (PB batch)")

# full pit_links_device (host-visible cost incl all fetches)
for k, (elev_d, flats) in enumerate(states):
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        t0 = time.perf_counter()
        out = pit_links_device(flats, elev_d, np.ones(N - 1), np.ones(N - 1))
        dt = time.perf_counter() - t0
    print("  pit_links_device full: %.4f s (links=%d)" % (dt, len(out[0])))
