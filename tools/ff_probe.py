"""Probe fill_flats_device phase costs on the TPU (diagnostic).

Sync discipline: block_until_ready does NOT reliably block on the axon
tunnel — every timed phase ends with a host fetch of a scalar that the
phase's output feeds (the bench.py discipline).  Inputs perturb per rep.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from bench import make_hard_terrain

jax.config.update("jax_compilation_cache_dir",
                  "/tmp/pydem_tpu_bench_cache_%s" % jax.devices()[0].platform)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1024

from pydem_tpu.core.flats_device import (_fill_pit_artifacts, _flat_mask,
                                         fill_flats_device)
from pydem_tpu.core.slope_direction import label_flood

elev = make_hard_terrain(N)


def variants(k):
    out = []
    for i in range(k):
        e = elev.copy()
        e[1:-1, 1:-1] += (i + 1) * 1e-7
        d = jnp.asarray(e)
        float(jnp.sum(d))  # force upload completion
        out.append(d)
    return out


EV = variants(4)


def timeit(label, f, inputs):
    float(jnp.sum(f(inputs[-1])))  # compile + warm, synced
    ts = []
    for i in range(3):
        t0 = time.perf_counter()
        float(jnp.sum(f(inputs[i])))
        ts.append(time.perf_counter() - t0)
    print("  %-34s %s" % (label, " ".join("%.4f" % t for t in ts)))


pa = jax.jit(lambda e: _fill_pit_artifacts(e, False, 32))
timeit("fill_pit_artifacts", pa, EV)

fm = jax.jit(lambda e: _flat_mask(_fill_pit_artifacts(e, False, 32),
                                  False).astype(jnp.float32))
timeit("artifacts+flat_mask", fm, EV)

lf = jax.jit(lambda e: label_flood(
    _flat_mask(_fill_pit_artifacts(e, False, 32), False),
    _fill_pit_artifacts(e, False, 32))[0].astype(jnp.float32))
timeit("artifacts+mask+label_flood", lf, EV)

full = jax.jit(lambda e: fill_flats_device(e))
timeit("fill_flats_device (full)", full, EV)
