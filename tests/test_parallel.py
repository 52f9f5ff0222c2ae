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


def test_gan_step_sharding_equivalence(rng):
    """The sharded GAN g/d steps reproduce the UNSHARDED losses and updated
    parameters on identical inputs, for dp-only (8x1) and dp x tp (4x2)
    (VERDICT r1 #2: equivalence, not finiteness)."""
    from a2m.config import (DiscriminatorConfig, GeneratorConfig, MeshConfig,
                            TrainConfig)
    from a2m.models import Discriminator, Generator
    from a2m.parallel import (make_sharded_train_steps, param_shardings,
                              replicated)
    from a2m.train.train_step import init_states, make_train_steps

    g_cfg = GeneratorConfig(in_channels=16, out_channels=16, joint_feat_dim=8,
                            gat_heads=2, dropout=0.1)
    d_cfg = DiscriminatorConfig(out_channels=8, joint_feat_dim=8, gat_heads=2,
                                dropout=0.1)
    train_cfg = TrainConfig(donate_buffers=False)
    g_model, d_model = Generator(g_cfg), Discriminator(d_cfg)
    batch = 8
    g0, d0 = init_states(g_model, d_model, jax.random.PRNGKey(0),
                         batch_size=batch)
    audio = jnp.asarray(rng.standard_normal((batch, 64, 128)), jnp.float32)
    pose = jnp.asarray(rng.standard_normal((batch, 64, 104)) * 10 + 300,
                       jnp.float32)
    mean, std = jnp.zeros(104), jnp.ones(104)
    mask = jnp.ones(batch)
    key = jax.random.PRNGKey(1)
    sr, nz, sf = jnp.float32(0.93), jnp.float32(0.01), jnp.float32(0.07)

    def run(steps, put=lambda x: x, ctx=None):
        import contextlib
        g_step, d_step, _ = steps
        with (ctx or contextlib.nullcontext()):
            new_g, new_d_bs, gm = g_step(put(g0), put(d0), audio, pose,
                                         mean, std, sr, nz, key, None, mask)
            new_d, new_g2, dm = d_step(new_g,
                                       put(d0)._replace(
                                           batch_stats=new_d_bs),
                                       audio, pose, mean, std, sr, sf, nz,
                                       key, None, mask)
        jax.block_until_ready((new_g2, new_d))
        return float(gm['g_loss']), float(dm['d_loss']), new_g2, new_d

    # unsharded golden (jit_steps=False + plain jit keeps signatures equal)
    raw = make_train_steps(g_model, d_model, train_cfg, jit_steps=False)
    golden = run(tuple(jax.jit(f) for f in raw))

    for data_ax, model_ax in ((8, 1), (4, 2)):
        mesh = make_mesh(MeshConfig(data=data_ax, model=model_ax))
        tp = model_ax > 1

        def put(state, mesh=mesh, tp=tp):
            return state._replace(
                params=jax.device_put(
                    state.params,
                    param_shardings(state.params, mesh, tensor_parallel=tp)),
                batch_stats=jax.device_put(state.batch_stats,
                                           replicated(mesh)),
                opt_state=jax.device_put(state.opt_state, replicated(mesh)))

        steps = make_sharded_train_steps(g_model, d_model, train_cfg, mesh,
                                         tensor_parallel=tp)
        gl, dl, g2, d2 = run(steps, put, mesh)
        # f32 reduction-order noise through BN->conv chains accumulates to
        # ~1e-4 relative over a g-fwd + two d-fwd + backward graph; anything
        # beyond 1e-3 would indicate a real sharding bug
        assert gl == pytest.approx(golden[0], rel=1e-3)
        assert dl == pytest.approx(golden[1], rel=1e-3)
        # Adam normalizes gradients, so a near-zero-gradient param can move
        # by O(lr) under tiny numeric noise — bound per-param diffs by the
        # learning-rate scale and the AVERAGE drift much tighter
        for got, want in ((g2.params, golden[2].params),
                          (d2.params, golden[3].params)):
            diffs = [np.abs(np.asarray(a) - np.asarray(b))
                     for a, b in zip(jax.tree_util.tree_leaves(got),
                                     jax.tree_util.tree_leaves(want))]
            assert max(d.max() for d in diffs) < 2.1e-3   # ~2 * d_lr
            total = sum(d.sum() for d in diffs)
            count = sum(d.size for d in diffs)
            assert total / count < 2e-5


def test_dryrun_multichip_full_train_step():
    """The driver contract: full GAN train step over an 8-device mesh with
    dp + tp shardings compiles and executes."""
    import __graft_entry__ as graft
    graft.dryrun_multichip(8)


# NOTE: __graft_entry__.entry() is the FULL-SIZE generator — compiling it on
# the CPU test backend takes minutes, so the driver's own single-chip
# compile check covers it rather than this suite.


def test_balanced_host_slices():
    """LPT interval balancing: disjoint-complete with near-equal window
    totals (VERDICT r3 item 3)."""
    from a2m.parallel import balanced_host_slices
    ids = [f'i{k}' for k in range(9)]
    weights = [100, 90, 10, 10, 10, 10, 10, 10, 10]
    slices = balanced_host_slices(ids, weights, 2)
    assert len(slices) == 2
    flat = sorted(slices[0] + slices[1])
    assert flat == sorted(ids)                            # disjoint-complete
    w = {i: wt for i, wt in zip(ids, weights)}
    totals = [sum(w[i] for i in s) for s in slices]
    # striding would give 140 vs 120; LPT lands 130/130
    assert abs(totals[0] - totals[1]) <= 10
    # deterministic: every host computes the same assignment
    assert balanced_host_slices(ids, weights, 2) == slices
