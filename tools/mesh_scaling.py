"""CPU-virtual-mesh scaling sweep (BASELINE.md metric #1, multi-host column).

Real multi-chip hardware is unavailable in this environment; the honest
stand-in is a measured scaling curve on an N-virtual-device CPU mesh: UCA
rounds to convergence, exchanged halo bytes per round, measured
exchange/relax/full-round times and the overlap fraction, per mesh size.

Run standalone (prints a markdown table):
    python tools/mesh_scaling.py [canvas_n]
bench.py --full invokes it in a subprocess (the CPU platform + device-count
flags must be set before jax imports).
"""
import os
import sys

N = int(sys.argv[1]) if len(sys.argv) > 1 else 512

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main():
    from jax.sharding import Mesh

    from pydem_tpu.parallel.sharded import (measure_halo_overlap,
                                            sharded_uca, terrain_pre)

    x, y = np.mgrid[-1:1:complex(0, N), -1:1:complex(0, N)]
    elev = (1 - np.sqrt(x**2 + y**2) / np.sqrt(2.0)).astype("float32")
    elev = jnp.asarray(elev - elev.min() + 0.05)
    ones_f = jnp.ones(N - 1, jnp.float32)
    ones_p = jnp.ones(N, jnp.float32)
    _mag, _d, _f, W, base = terrain_pre(elev, ones_f, ones_f, ones_p, ones_p)

    devs = jax.devices()
    rows = []
    for nd in (1, 2, 4, 8):
        shape = {1: (1, 1), 2: (1, 2), 4: (2, 2), 8: (2, 4)}[nd]
        mesh = Mesh(np.asarray(devs[:nd]).reshape(shape), ("y", "x"))
        _area, rounds = sharded_uca(base, W, mesh, uca_solver="blocked")
        n_l, m_l = N // shape[0], N // shape[1]
        ring_px = 2 * (n_l + 2) + 2 * m_l
        t = measure_halo_overlap(base, W, mesh, rounds=4)
        rows.append((nd, shape, int(rounds), ring_px * 4 * nd,
                     t["t_exchange_per_round"], t["t_relax_per_round"],
                     t["t_full_per_round"], t["overlap_fraction"]))

    print("| devices | mesh | UCA rounds | halo B/round | t_exch (s) "
          "| t_relax (s) | t_round (s) | overlap |")
    print("|---|---|---|---|---|---|---|---|")
    for nd, shape, r, hb, te, tr, tf, ov in rows:
        print("| %d | %dx%d | %d | %d | %.4f | %.4f | %.4f | %s |"
              % (nd, shape[0], shape[1], r, hb, te, tr, tf,
                 "n/a" if ov is None else "%.2f" % ov))

    # label_flood under sharding (the one non-stencil op in the pipeline:
    # its hook/compress phases lower to cross-shard scatter/gathers on
    # flats-heavy canvases — measured here so the cost is a number, not a
    # caveat).  Quantized terrain -> ~half the canvas is flat regions.
    import time

    from jax.sharding import NamedSharding, PartitionSpec as P

    from pydem_tpu.core.flats_device import _flat_mask
    from pydem_tpu.core.slope_direction import label_flood

    from pydem_tpu.parallel.sharded import label_flood_sharded

    eq = jnp.floor(elev * 8.0) / 8.0  # quantize -> flats-heavy
    print()
    print("| devices | mesh | flat px | flood impl | label_flood (s) |")
    print("|---|---|---|---|---|")
    for nd in (1, 8):
        shape = {1: (1, 1), 8: (2, 4)}[nd]
        mesh = Mesh(np.asarray(devs[:nd]).reshape(shape), ("y", "x"))
        e_s = jax.device_put(eq, NamedSharding(mesh, P("y", "x")))
        if nd == 1:  # production: the global flood on one device
            prog = jax.jit(lambda e: label_flood(_flat_mask(e, False),
                                                 e)[0])
            impl = "global"
        else:  # production: terrain_pre(mesh=...) routes to the sharded
            # local-CC + halo-adoption flood (no cross-shard scatters)
            prog = jax.jit(lambda e: label_flood_sharded(
                _flat_mask(e, False), e, mesh)[0])
            impl = "sharded"
        out = prog(e_s)
        jax.block_until_ready(out)
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(prog(e_s))
            best = min(best, time.perf_counter() - t0)
        nflat = int(_flat_mask(eq, False).sum())
        print("| %d | %dx%d | %d | %s | %.4f |"
              % (nd, shape[0], shape[1], nflat, impl, best))


if __name__ == "__main__":
    main()
