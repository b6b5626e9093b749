"""Microbench: segment scatter / gather / stencil-sweep costs at 1024² on
the axon TPU.  Sync = host fetch of a dependent scalar."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  "/tmp/pydem_tpu_bench_cache_%s" % jax.devices()[0].platform)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N = 1024
NN = N * N
rng = np.random.default_rng(0)
ids_np = rng.integers(0, NN, NN).astype(np.int32)
vals_np = rng.random(NN).astype(np.float32)

ids = jnp.asarray(ids_np)
float(jnp.sum(ids))
vals = jnp.asarray(vals_np)
float(jnp.sum(vals))


def timeit(label, f, k=10):
    float(jnp.sum(f(vals, jnp.float32(0))))
    ts = []
    for i in range(3):
        t0 = time.perf_counter()
        float(jnp.sum(f(vals, jnp.float32(i + 1))))
        ts.append(time.perf_counter() - t0)
    print("  %-34s %s  (/op: %.2f ms)" % (
        label, " ".join("%.4f" % t for t in ts), min(ts) / k * 1e3))


K = 10


@jax.jit
def seg_max(v, eps):
    v = v + eps
    acc = jnp.float32(0)
    for i in range(K):
        s = jax.ops.segment_max(v + i, ids, num_segments=NN + 1)
        acc = acc + s[0]
    return acc


@jax.jit
def seg_sum(v, eps):
    v = v + eps
    acc = jnp.float32(0)
    for i in range(K):
        s = jax.ops.segment_sum(v + i, ids, num_segments=NN + 1)
        acc = acc + s[0]
    return acc


@jax.jit
def gath(v, eps):
    v = v + eps
    acc = jnp.float32(0)
    for i in range(K):
        g = (v + i)[jnp.clip(ids + i, 0, NN - 1)]
        acc = acc + g[0]
    return acc


@jax.jit
def gath_rows(v, eps):
    # packed row gather: (NN+1, 8) table, one gather of NN rows
    v = v + eps
    tbl = jnp.stack([v + i for i in range(8)], axis=1)
    tbl = jnp.concatenate([tbl, tbl[:1]], axis=0)
    acc = jnp.float32(0)
    g = tbl[jnp.clip(ids, 0, NN - 1)]
    acc = acc + g.sum()
    return acc


@jax.jit
def sweeps(v, eps):
    x = (v + eps).reshape(N, N)
    from pydem_tpu.core.stencil import NEIGHBOR_OFFSETS, shift

    for i in range(K):
        mn = x
        for di, dj in NEIGHBOR_OFFSETS:
            mn = jnp.minimum(mn, shift(x, di, dj, jnp.inf))
        x = mn + jnp.float32(1e-8)
    return x[0, 0]


@jax.jit
def sort_based(v, eps):
    # sort+segmented scan alternative to scatter
    v = v + eps
    acc = jnp.float32(0)
    for i in range(2):
        order = jnp.argsort(ids + i)
        acc = acc + v[order[0]]
    return acc


timeit("segment_max x10", seg_max)
timeit("segment_sum x10", seg_sum)
timeit("gather 1M x10", gath)
timeit("row-gather 1Mx8 x1", gath_rows, k=1)
timeit("8-neighbor min sweep x10", sweeps)
timeit("argsort 1M x2", sort_based, k=2)
