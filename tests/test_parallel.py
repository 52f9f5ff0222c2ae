"""GSPMD sharding tests on the virtual 8-device CPU mesh (SURVEY.md §4e)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from a2m.config import MeshConfig
from a2m.parallel import (batch_sharding, host_interval_slice, make_mesh,
                          param_spec, shard_batch)


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8, (
        'conftest must provide 8 virtual CPU devices')


def test_make_mesh_shapes():
    mesh = make_mesh(MeshConfig(data=-1, model=1))
    assert mesh.shape == {'data': 8, 'model': 1}
    mesh2 = make_mesh(MeshConfig(data=4, model=2))
    assert mesh2.shape == {'data': 4, 'model': 2}
    with pytest.raises(AssertionError):
        make_mesh(MeshConfig(data=3, model=2))


def test_shard_batch_places_on_data_axis(rng):
    mesh = make_mesh(MeshConfig(data=8, model=1))
    batch = {'pose/data': rng.standard_normal((16, 64, 104)).astype(np.float32),
             'meta': {'interval_id': ['x'] * 16}}
    sharded = shard_batch(batch, mesh)
    arr = sharded['pose/data']
    assert arr.sharding.spec == jax.sharding.PartitionSpec('data')
    # each device holds 16/8 = 2 rows
    assert arr.addressable_shards[0].data.shape[0] == 2
    assert sharded['meta']['interval_id'][0] == 'x'


def test_param_spec_rules():
    spec = param_spec('unet/bottleneck/conv/kernel', (3, 1024, 2048))
    assert spec == jax.sharding.PartitionSpec(None, None, 'model')
    spec2 = param_spec('generator/some/other/kernel', (3, 8, 8))
    assert spec2 == jax.sharding.PartitionSpec()
    spec3 = param_spec('conv3_attn/query/kernel', (2048, 256))
    assert spec3 == jax.sharding.PartitionSpec('model', None)


def test_host_interval_slice():
    ids = [str(i) for i in range(10)]
    s0 = host_interval_slice(ids, 0, 4)
    s1 = host_interval_slice(ids, 1, 4)
    assert s0 == ['0', '4', '8'] and s1 == ['1', '5', '9']
    everything = sorted(sum((host_interval_slice(ids, i, 4)
                             for i in range(4)), []))
    assert everything == sorted(ids)


def test_data_parallel_psum_equivalence(rng):
    """A sharded jitted grad step equals the single-device result — GSPMD's
    inserted psum reproduces the full-batch gradient."""
    mesh = make_mesh(MeshConfig(data=8, model=1))
    w = jnp.asarray(rng.standard_normal((16, 4)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((32, 16)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((32, 4)), jnp.float32)

    def loss(w, x, y):
        return jnp.mean((x @ w - y) ** 2)

    g_single = jax.grad(loss)(w, x, y)
    bs = batch_sharding(mesh)
    rep = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
    g_fn = jax.jit(jax.grad(loss), in_shardings=(rep, bs, bs))
    g_sharded = g_fn(w, jax.device_put(x, bs), jax.device_put(y, bs))
    np.testing.assert_allclose(np.asarray(g_single), np.asarray(g_sharded),
                               atol=1e-5)


def test_dryrun_multichip_full_train_step():
    """The driver contract: full GAN train step over an 8-device mesh with
    dp + tp shardings compiles and executes."""
    import __graft_entry__ as graft
    graft.dryrun_multichip(8)


# NOTE: __graft_entry__.entry() is the FULL-SIZE generator — compiling it on
# the CPU test backend takes minutes, so the driver's own single-chip
# compile check covers it rather than this suite.
