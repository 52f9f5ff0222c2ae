"""MFU accounting tests (SURVEY §5 tracing/profiling rebuild)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from a2m.utils import mfu


def test_jaxpr_flops_dot():
    f = jax.jit(lambda a, b: (a @ b).sum())
    a, b = jnp.ones((128, 256)), jnp.ones((256, 512))
    assert mfu.jaxpr_flops(f.trace(a, b).jaxpr) == 2 * 128 * 256 * 512


def test_jaxpr_flops_conv_grouped():
    import flax.linen as nn
    conv = nn.Conv(12, (3,), padding='SAME', feature_group_count=4)
    x = jnp.ones((2, 16, 8))
    v = conv.init(jax.random.PRNGKey(0), x)
    g = jax.jit(lambda v, x: conv.apply(v, x).sum())
    # per output elem: k_spatial(3) * cin_per_group(2)
    expect = 2 * (2 * 16 * 12) * 3 * 2
    assert mfu.jaxpr_flops(g.trace(v, x).jaxpr) == expect


def test_jaxpr_flops_recurses_into_grad():
    b = jnp.ones((256, 512))
    h = jax.jit(jax.grad(lambda a: (a @ b).sum()))
    a = jnp.ones((128, 256))
    # fwd dot + one bwd dot
    assert mfu.jaxpr_flops(h.trace(a).jaxpr) == 2 * 2 * 128 * 256 * 512


def test_compiled_flops_never_raises():
    f = jax.jit(lambda a: a * 2)   # no matmul: cost model may report 0
    out = mfu.compiled_flops(f, jnp.ones(4))
    assert out is None or out >= 0


def test_mfu_math():
    assert mfu.mfu(0, 1.0) == 0.0
    val = mfu.mfu(1e12, 1.0, 'bf16')
    assert val == pytest.approx(1e12 / mfu.peak_flops('bf16'))
    line = mfu.format_mfu_line('g_step', 1e12, 0.1, 'bf16')
    assert 'MFU' in line and 'TFLOP' in line
    assert 'no XLA cost model' in mfu.format_mfu_line('x', None, 0.1)


def test_gan_step_flops_order_of_magnitude():
    """The full-size g_step should be in the TFLOP range at batch 128 —
    sanity anchor for the README MFU table."""
    from a2m.config import DiscriminatorConfig, GeneratorConfig, TrainConfig
    from a2m.models import Discriminator, Generator
    from a2m.train.train_step import init_states, make_train_steps
    g_cfg = GeneratorConfig(in_channels=16, out_channels=16, joint_feat_dim=8,
                            gat_heads=2)
    d_cfg = DiscriminatorConfig(out_channels=8, joint_feat_dim=8, gat_heads=2)
    g_model, d_model = Generator(g_cfg), Discriminator(d_cfg)
    gs, ds = init_states(g_model, d_model, jax.random.PRNGKey(0),
                         batch_size=4)
    g_step, _, _ = make_train_steps(g_model, d_model, TrainConfig(),
                                    donate=False)
    audio = jnp.zeros((4, 64, 128))
    pose = jnp.zeros((4, 64, 104))
    fl = mfu.compiled_flops(g_step, gs, ds, audio, pose, jnp.zeros(104),
                            jnp.ones(104), 0.93, 0.01, jax.random.PRNGKey(1))
    assert fl is not None and fl > 1e8   # tiny config, still >100 MFLOP
