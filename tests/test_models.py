"""Model + loss tests (tiny configs for fast CPU compiles)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from a2m import constants
from a2m.config import DiscriminatorConfig, GeneratorConfig
from a2m.models import Discriminator, Generator, forward_with_losses
from a2m.models import losses as L

KEY = jax.random.PRNGKey(0)

TINY_G = GeneratorConfig(in_channels=16, out_channels=16, joint_feat_dim=8,
                         gat_heads=2, dropout=0.1)
TINY_D = DiscriminatorConfig(out_channels=8, joint_feat_dim=8, gat_heads=2,
                             dropout=0.1)


@pytest.fixture(scope='module')
def gen_and_vars():
    audio = jnp.zeros((2, 64, 128), jnp.float32)
    g = Generator(TINY_G)
    return g, g.init({'params': KEY, 'dropout': KEY}, audio)


@pytest.fixture(scope='module')
def disc_and_vars():
    motion = jnp.zeros((2, 63, 104), jnp.float32)
    d = Discriminator(TINY_D)
    return d, d.init({'params': KEY, 'dropout': KEY}, motion)


# ---------------------------------------------------------------------------
# losses (block layout)
# ---------------------------------------------------------------------------

def test_pos_to_motion(rng):
    pose = jnp.asarray(rng.standard_normal((2, 64, 104)), jnp.float32)
    motion = L.pos_to_motion(pose)
    assert motion.shape == (2, 63, 104)
    np.testing.assert_allclose(np.asarray(motion),
                               np.diff(np.asarray(pose), axis=1), atol=1e-6)


def test_smoothness_and_jerk_zero_for_linear_motion():
    t = jnp.arange(64, dtype=jnp.float32)[None, :, None]
    pose = jnp.broadcast_to(t, (2, 64, 104)) * 3.0  # constant velocity
    motion = L.pos_to_motion(pose)
    assert float(L.temporal_smoothness_loss(motion)) == pytest.approx(0.0)
    assert float(L.jerk_loss(motion)) == pytest.approx(0.0)


def test_bone_length_loss_zero_for_identical():
    rng = np.random.default_rng(0)
    pose = jnp.asarray(rng.standard_normal((2, 8, 104)), jnp.float32)
    assert float(L.bone_length_loss(pose, pose)) == pytest.approx(0.0)
    other = pose * 2.0
    assert float(L.bone_length_loss(pose, other)) > 0.0


def test_bone_lengths_translation_invariant(rng):
    pose = rng.standard_normal((2, 8, 104)).astype(np.float32)
    shifted = pose.reshape(2, 8, 2, 52) + np.array([5.0, -3.0])[None, None, :,
                                                                None]
    b1 = np.asarray(L.bone_lengths(jnp.asarray(pose)))
    b2 = np.asarray(L.bone_lengths(jnp.asarray(shifted.reshape(2, 8, 104))))
    np.testing.assert_allclose(b1, b2, atol=1e-4)


def test_angle_losses_penalize_reflex():
    # straight chain: angle 0 at every joint -> inside [0, pi] -> no penalty
    pose = np.zeros((1, 2, 2, 52), dtype=np.float32)
    pose[..., 0, :] = np.arange(52)  # x increases along chain
    flat = jnp.asarray(pose.reshape(1, 2, 104))
    assert float(L.hand_joint_angle_loss(flat)) == pytest.approx(0.0)
    # body range [-pi/2, pi] also satisfied
    assert float(L.body_joint_angle_loss(flat)) == pytest.approx(0.0)


def test_comprehensive_angle_weighting(rng):
    pose = jnp.asarray(rng.standard_normal((2, 4, 104)), jnp.float32)
    total = float(L.comprehensive_angle_loss(pose))
    hand = float(L.hand_joint_angle_loss(pose))
    body = float(L.body_joint_angle_loss(pose))
    assert total == pytest.approx(0.7 * hand + 0.3 * body, rel=1e-5)


def test_masked_mean():
    x = jnp.asarray([[1.0, 1.0], [5.0, 5.0], [9.0, 9.0]])
    mask = jnp.asarray([1.0, 1.0, 0.0])
    assert float(L.masked_mean(x, mask)) == pytest.approx(3.0)


# ---------------------------------------------------------------------------
# generator
# ---------------------------------------------------------------------------

def test_generator_output_shape(gen_and_vars, rng):
    g, variables = gen_and_vars
    audio = jnp.asarray(rng.standard_normal((2, 64, 128)), jnp.float32)
    pose = g.apply(variables, audio)
    assert pose.shape == (2, 64, 104)
    assert pose.dtype == jnp.float32


def test_generator_with_losses_interface(gen_and_vars, rng):
    g, variables = gen_and_vars
    audio = jnp.asarray(rng.standard_normal((2, 64, 128)), jnp.float32)
    real = jnp.asarray(rng.standard_normal((2, 64, 104)), jnp.float32)
    pose, internal = forward_with_losses(g, variables, audio, real_pose=real)
    assert len(internal) == 2  # [bone, angle]
    assert all(np.isfinite(float(v)) for v in internal)
    pose, internal = forward_with_losses(g, variables, audio)
    assert len(internal) == 1  # [angle] only without real_pose


def test_generator_train_mode_updates_bn(gen_and_vars, rng):
    g, variables = gen_and_vars
    audio = jnp.asarray(rng.standard_normal((2, 64, 128)), jnp.float32)
    out, mutated = g.apply(variables, audio, train=True,
                           rngs={'dropout': KEY}, mutable=['batch_stats'])
    leaves_new = jax.tree.leaves(mutated['batch_stats'])
    leaves_old = jax.tree.leaves(variables['batch_stats'])
    changed = any(not np.allclose(a, b)
                  for a, b in zip(leaves_old, leaves_new))
    assert changed


def test_generator_block_layout_heads(gen_and_vars, rng):
    """Body head feeds x[0:10] & y[52:62]; hand head x[10:52] & y[62:104]:
    zeroing the body head's bias+kernel zeroes exactly those columns."""
    import flax
    g, variables = gen_and_vars
    audio = jnp.asarray(rng.standard_normal((1, 64, 128)), jnp.float32)
    params = flax.core.unfreeze(variables['params'])
    params['body_decoder']['logits']['kernel'] = jnp.zeros_like(
        params['body_decoder']['logits']['kernel'])
    params['body_decoder']['logits']['bias'] = jnp.zeros_like(
        params['body_decoder']['logits']['bias'])
    pose = np.asarray(g.apply(
        {'params': params, 'batch_stats': variables['batch_stats']}, audio))
    body_cols = np.r_[0:10, 52:62]
    hand_cols = np.r_[10:52, 62:104]
    assert np.abs(pose[..., body_cols]).max() == 0.0
    assert np.abs(pose[..., hand_cols]).max() > 0.0


# ---------------------------------------------------------------------------
# discriminator
# ---------------------------------------------------------------------------

def test_discriminator_output_shape(disc_and_vars, rng):
    d, variables = disc_and_vars
    motion = jnp.asarray(rng.standard_normal((2, 63, 104)), jnp.float32)
    scores, aux = d.apply(variables, motion)
    assert scores.shape == (2, 4)   # reference (B, 4) shape trace
    assert aux.shape == (2, TINY_D.aux_classes)


def test_discriminator_tiny_time_padding(disc_and_vars, rng):
    d = Discriminator(TINY_D)
    motion = jnp.asarray(rng.standard_normal((2, 3, 104)), jnp.float32)
    variables = d.init({'params': KEY, 'dropout': KEY}, motion)
    scores, _ = d.apply(variables, motion)
    assert np.isfinite(np.asarray(scores)).all()


def test_discriminator_gradient_flows(disc_and_vars, rng):
    d, variables = disc_and_vars
    motion = jnp.asarray(rng.standard_normal((2, 63, 104)), jnp.float32)

    def loss(params):
        s, _ = d.apply({'params': params,
                        'batch_stats': variables['batch_stats']}, motion)
        return jnp.mean((s - 1.0) ** 2)

    grads = jax.grad(loss)(variables['params'])
    gnorm = sum(float(jnp.sum(g ** 2)) for g in jax.tree.leaves(grads))
    assert gnorm > 0
    # graph-branch params receive gradient too (dense GAT path is live)
    assert float(jnp.sum(grads['body_gat']['lin']['kernel'] ** 2)) > 0
