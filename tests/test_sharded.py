"""Sharded == single-device equivalence (the reference's multi-tile test
philosophy, test_end_to_end.py:26-149, without files: same canvas, 1 device
vs an 8-device mesh)."""
import jax
import numpy as np
import pytest

from pydem_tpu import fixtures
from pydem_tpu.parallel import sharded


@pytest.mark.parametrize("testnum", [33, 5, 13])
@pytest.mark.parametrize("mesh_shape", [(2, 4), (4, 2), (1, 8)])
def test_sharded_matches_single(testnum, mesh_shape):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    elev, _ang, _uca = fixtures.get_test_case(testnum, 32)

    single = sharded.terrain_step(
        jax.numpy.asarray(elev), jax.numpy.ones(31), jax.numpy.ones(31),
        jax.numpy.ones(32), jax.numpy.ones(32))

    mesh = sharded.make_mesh(shape=mesh_shape)
    multi = sharded.run_sharded(elev, np.ones(31), np.ones(31),
                                np.ones(32), np.ones(32), mesh=mesh)

    for key in ("mag", "direction", "uca", "twi"):
        np.testing.assert_array_almost_equal(
            np.asarray(single[key]), np.asarray(multi[key]), decimal=10,
            err_msg="%s mismatch on mesh %s" % (key, mesh_shape))


def test_uneven_shard_shapes():
    """Canvas not divisible by mesh dims runs via NaN-domain padding; the
    sharded result matches a single-device run on the same padded domain."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    jnp = jax.numpy
    elev, _ang, _uca = fixtures.get_test_case(33, 30)  # 30 not divisible by 4
    # run_sharded pads each dim only to the next multiple of its mesh axis:
    # rows 30 % 2 == 0 (no pad), cols -> 32.
    elev_pad = np.pad(elev.astype("float64"), ((0, 0), (0, 2)),
                      constant_values=np.nan)
    single = sharded.terrain_step(
        jnp.asarray(elev_pad), jnp.ones(29), jnp.ones(29),
        jnp.ones(30), jnp.ones(30))
    mesh = sharded.make_mesh(shape=(2, 4))
    multi = sharded.run_sharded(elev, np.ones(29), np.ones(29),
                                np.ones(30), np.ones(30), mesh=mesh)
    a = np.asarray(single["uca"])[:30, :30]
    b = np.asarray(multi["uca"])
    both_nan = np.isnan(a) & np.isnan(b)
    np.testing.assert_array_almost_equal(
        np.where(both_nan, 0, a), np.where(both_nan, 0, b), decimal=10)


@pytest.mark.parametrize("testnum", [33, 5])
@pytest.mark.parametrize("mesh_shape", [(2, 4), (4, 2)])
def test_sharded_blocked_solver(testnum, mesh_shape):
    """The production multi-chip UCA path — per-shard VMEM-resident
    Gauss-Seidel blocks + explicit 1-px ppermute halo exchange per round —
    matches the single-device result (the SPMD analog of the reference's
    cross-tile edge fixed point, process_manager.py:1090-1249)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    elev, _ang, _uca = fixtures.get_test_case(testnum, 32)

    single = sharded.terrain_step(
        jax.numpy.asarray(elev), jax.numpy.ones(31), jax.numpy.ones(31),
        jax.numpy.ones(32), jax.numpy.ones(32))

    mesh = sharded.make_mesh(shape=mesh_shape)
    multi = sharded.run_sharded(elev, np.ones(31), np.ones(31),
                                np.ones(32), np.ones(32), mesh=mesh,
                                uca_solver="blocked")
    for key in ("uca", "twi"):
        np.testing.assert_array_almost_equal(
            np.asarray(single[key]), np.asarray(multi[key]), decimal=10,
            err_msg="%s mismatch on mesh %s" % (key, mesh_shape))


@pytest.mark.parametrize("mesh_shape", [(2, 4), (2, 2), (1, 2)])
def test_label_flood_sharded_matches_global(mesh_shape):
    """label_flood_sharded (local CC + halo id-adoption rounds) must produce
    the exact labels and reps of the global label_flood on a flats-heavy
    quantized canvas — including regions spanning many shards."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from pydem_tpu.core.flats_device import _flat_mask
    from pydem_tpu.core.slope_direction import label_flood

    n = 64
    x, y = np.mgrid[-1:1:complex(0, n), -1:1:complex(0, n)]
    elev = 1 - np.hypot(x, y) / np.sqrt(2.0)
    elev = np.floor((elev - elev.min() + 0.05) * 8.0) / 8.0  # ring flats
    elev_d = jnp.asarray(elev)
    mask = _flat_mask(elev_d, False)

    lbl_g, rep_g = label_flood(mask, elev_d)

    mesh = sharded.make_mesh(shape=mesh_shape)
    mask_s = jax.device_put(mask, NamedSharding(mesh, P("y", "x")))
    elev_s = jax.device_put(elev_d, NamedSharding(mesh, P("y", "x")))
    lbl_s, rep_s = sharded.label_flood_sharded(mask_s, elev_s, mesh)

    np.testing.assert_array_equal(np.asarray(lbl_g), np.asarray(lbl_s))
    np.testing.assert_array_equal(np.nan_to_num(np.asarray(rep_g)),
                                  np.nan_to_num(np.asarray(rep_s)))


def test_terrain_pre_sharded_flood_matches():
    """terrain_pre(mesh=...) (sharded flood inside find_flats_edges) ==
    terrain_pre without a mesh, elementwise."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    n = 64
    elev, _a, _u = fixtures.get_test_case(16, n)  # flats-bearing fixture
    elev_d = jnp.asarray(np.asarray(elev))
    ones_f = jnp.ones(n - 1, elev_d.dtype)
    ones_p = jnp.ones(n, elev_d.dtype)
    ref = sharded.terrain_pre(elev_d, ones_f, ones_f, ones_p, ones_p)

    mesh = sharded.make_mesh(shape=(2, 4))
    elev_s = jax.device_put(elev_d, NamedSharding(mesh, P("y", "x")))
    rep = [jax.device_put(v, NamedSharding(mesh, P()))
           for v in (ones_f, ones_f, ones_p, ones_p)]
    out = sharded.terrain_pre(elev_s, *rep, mesh=mesh)
    for a, b, name in zip(ref, out, ("mag", "dir", "flats", "W", "base")):
        np.testing.assert_array_equal(np.isnan(np.asarray(a)),
                                      np.isnan(np.asarray(b)), err_msg=name)
        np.testing.assert_array_almost_equal(
            np.nan_to_num(np.asarray(a)), np.nan_to_num(np.asarray(b)),
            err_msg=name)
