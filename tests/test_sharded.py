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
