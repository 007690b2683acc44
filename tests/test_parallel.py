"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from plonky2_bn254_tpu.field import goldilocks as gl, ntt as ntt_mod
from plonky2_bn254_tpu.parallel import mesh as mesh_mod
from plonky2_bn254_tpu.parallel import ntt as pntt


def cpu_mesh(n=8):
    return mesh_mod.make_mesh(n, devices=jax.local_devices(backend="cpu"))


def test_distributed_ntt_matches_single_device():
    rng = np.random.default_rng(61)
    n1, n2 = 64, 128
    x = rng.integers(0, gl.P, size=(n1, n2), dtype=np.uint64)
    m = cpu_mesh(8)
    got = np.asarray(pntt.distributed_ntt(jnp.asarray(x), m))
    want = np.asarray(pntt.single_device_reference(jnp.asarray(x)))
    np.testing.assert_array_equal(got, want)


def test_sharded_column_commit():
    """Column-sharded LDE: each device extends its own polynomials."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    rng = np.random.default_rng(62)
    vals = rng.integers(0, gl.P, size=(16, 256), dtype=np.uint64)
    m = cpu_mesh(8)
    sharded = jax.device_put(jnp.asarray(vals), NamedSharding(m, P("dp", None)))
    lde = jax.jit(lambda v: ntt_mod.coset_lde(v, 1))(sharded)
    want = np.asarray(ntt_mod.coset_lde(jnp.asarray(vals), 1))
    np.testing.assert_array_equal(np.asarray(lde), want)
    # result keeps the column sharding (no resharding inserted)
    assert len(lde.sharding.device_set) == 8
