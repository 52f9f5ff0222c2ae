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


def test_loss_gradients_finite_at_degenerate_poses(rng):
    """d||x||/dx and grad(atan2) NaN at exact zeros — constant/degenerate
    poses (bf16 quantization produces them) must still give finite grads."""
    const_pose = jnp.ones((2, 8, 104), jnp.float32) * 5.0   # zero motion,
    real = jnp.asarray(rng.standard_normal((2, 8, 104)), jnp.float32)

    def total(pose):
        motion = L.pos_to_motion(pose)
        return (L.temporal_smoothness_loss(motion) + L.jerk_loss(motion)
                + L.bone_length_loss(real, pose)
                + L.comprehensive_angle_loss(pose))

    g_const = jax.grad(total)(const_pose)
    assert np.isfinite(np.asarray(g_const)).all()
    # all joints coincident -> zero bones AND degenerate angles
    g_zero = jax.grad(total)(jnp.zeros((2, 8, 104), jnp.float32))
    assert np.isfinite(np.asarray(g_zero)).all()
    # primal values unchanged where non-degenerate
    normal = jnp.asarray(rng.standard_normal((2, 8, 104)) * 10, jnp.float32)
    motion = L.pos_to_motion(normal)
    golden = np.linalg.norm(np.diff(np.asarray(motion), axis=1),
                            axis=-1).mean()
    np.testing.assert_allclose(float(L.temporal_smoothness_loss(motion)),
                               golden, rtol=1e-5)


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

def test_generator_style_conditioning(rng):
    """Opt-in speaker-style embedding: different ids -> different poses
    (the reference's Style module is a stub; model_layers.py:913-923)."""
    import dataclasses
    g = Generator(dataclasses.replace(TINY_G, num_style_speakers=4))
    audio = jnp.asarray(rng.standard_normal((2, 64, 128)), jnp.float32)
    ids_a = jnp.asarray([0, 1], jnp.int32)
    variables = g.init({'params': KEY, 'dropout': KEY}, audio,
                       speaker_ids=ids_a)
    assert 'style_emb' in variables['params']
    out_a = g.apply(variables, audio, speaker_ids=ids_a)
    out_b = g.apply(variables, audio, speaker_ids=jnp.asarray([2, 3]))
    assert float(jnp.abs(out_a - out_b).max()) > 0
    # default config: no style params, speaker_ids ignored
    g0 = Generator(TINY_G)
    v0 = g0.init({'params': KEY, 'dropout': KEY}, audio)
    assert 'style_emb' not in v0['params']


def test_discriminator_aux_gating(rng):
    """use_aux_classifier=False (default) skips the head entirely; True
    restores the reference capability (real_motion_model.py:572-578)."""
    import dataclasses
    motion = jnp.asarray(rng.standard_normal((2, 63, 104)), jnp.float32)
    d_off = Discriminator(TINY_D)
    v_off = d_off.init({'params': KEY, 'dropout': KEY}, motion)
    scores, aux = d_off.apply(v_off, motion)
    assert aux is None
    assert 'aux_fc1' not in v_off['params']
    d_on = Discriminator(dataclasses.replace(TINY_D,
                                             use_aux_classifier=True))
    v_on = d_on.init({'params': KEY, 'dropout': KEY}, motion)
    scores, aux = d_on.apply(v_on, motion)
    assert aux.shape == (2, TINY_D.aux_classes)


def test_d_step_aux_cross_entropy(rng):
    """lambda_aux > 0 + style labels adds the aux CE to the D loss."""
    import dataclasses
    from a2m.config import TrainConfig
    from a2m.train.train_step import init_states, make_train_steps
    d_cfg = dataclasses.replace(TINY_D, use_aux_classifier=True,
                                aux_classes=4)
    g_model, d_model = Generator(TINY_G), Discriminator(d_cfg)
    g_state, d_state = init_states(g_model, d_model, jax.random.PRNGKey(0),
                                   batch_size=4)
    cfg = TrainConfig(lambda_aux=0.5)
    _, d_step, _ = make_train_steps(g_model, d_model, cfg, donate=False)
    audio = jnp.asarray(rng.standard_normal((4, 64, 128)), jnp.float32)
    pose = jnp.asarray(rng.standard_normal((4, 64, 104)) * 10 + 300,
                       jnp.float32)
    style = jnp.asarray([0, 1, 2, 3], jnp.int32)
    _, _, dm = d_step(g_state, d_state, audio, pose, jnp.zeros(104),
                      jnp.ones(104), 0.93, 0.07, 0.01, jax.random.PRNGKey(1),
                      style, jnp.ones(4))
    assert 'd_aux' in dm and np.isfinite(float(dm['d_aux']))
    assert float(dm['d_loss']) == pytest.approx(
        float(dm['d_real']) + cfg.lambda_d * float(dm['d_fake'])
        + 0.5 * float(dm['d_aux']), rel=1e-5)


def test_discriminator_output_shape(disc_and_vars, rng):
    d, variables = disc_and_vars
    motion = jnp.asarray(rng.standard_normal((2, 63, 104)), jnp.float32)
    scores, aux = d.apply(variables, motion)
    assert scores.shape == (2, 4)   # reference (B, 4) shape trace
    assert aux is None              # aux head gated off by default


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


def test_discriminator_audio_fusion_branches(rng):
    """Both audio-fusion branches (real_motion_model.py:624-628): audio
    already at D's time resolution (a.shape[1] == t) and the adaptive-pool
    path (T_a a multiple of t)."""
    d = Discriminator(DiscriminatorConfig(out_channels=8, joint_feat_dim=8,
                                          gat_heads=2, dropout=0.1,
                                          audio_fusion=True))
    motion = jnp.asarray(rng.standard_normal((2, 63, 104)), jnp.float32)
    audio64 = jnp.asarray(rng.standard_normal((2, 64, 128)), jnp.float32)
    variables = d.init({'params': KEY, 'dropout': KEY}, motion,
                       audio=audio64)

    s_pool, _ = d.apply(variables, motion, audio=audio64)   # 64 -> t pooled
    assert s_pool.shape == (2, 4)
    assert np.isfinite(np.asarray(s_pool)).all()

    t = s_pool.shape[1]
    audio_t = jnp.asarray(rng.standard_normal((2, t, 128)), jnp.float32)
    s_eq, _ = d.apply(variables, motion, audio=audio_t)     # equal branch
    assert s_eq.shape == (2, 4)
    assert np.isfinite(np.asarray(s_eq)).all()

    # the fusion is live: different audio changes the scores
    s_eq2, _ = d.apply(variables, motion, audio=audio_t + 1.0)
    assert float(jnp.abs(s_eq2 - s_eq).max()) > 0

    # pooled path == manually pooled audio through the equal branch
    pooled = audio64.reshape(2, t, 64 // t, 128).mean(axis=2)
    s_manual, _ = d.apply(variables, motion, audio=pooled)
    np.testing.assert_allclose(np.asarray(s_pool), np.asarray(s_manual),
                               rtol=1e-5, atol=1e-5)


def test_discriminator_audio_fusion_gradient(rng):
    d = Discriminator(DiscriminatorConfig(out_channels=8, joint_feat_dim=8,
                                          gat_heads=2, dropout=0.1,
                                          audio_fusion=True))
    motion = jnp.asarray(rng.standard_normal((2, 63, 104)), jnp.float32)
    audio = jnp.asarray(rng.standard_normal((2, 64, 128)), jnp.float32)
    variables = d.init({'params': KEY, 'dropout': KEY}, motion, audio=audio)

    def loss(params):
        s, _ = d.apply({'params': params,
                        'batch_stats': variables['batch_stats']}, motion,
                       audio=audio)
        return jnp.mean((s - 1.0) ** 2)

    grads = jax.grad(loss)(variables['params'])
    assert float(jnp.sum(grads['audio_fusion']['kernel'] ** 2)) > 0


def test_adaptive_pool_matrix_matches_torch():
    """adaptive_pool_matrix == torch.adaptive_avg_pool1d for arbitrary
    (in_len, out_len), including non-divisible and upsampling ratios
    (VERDICT r3 item 7; real_motion_model.py:624-628)."""
    import torch
    import torch.nn.functional as F
    from a2m.nn.layers import adaptive_pool_matrix
    rng = np.random.default_rng(0)
    for in_len, out_len in ((64, 4), (63, 4), (7, 4), (5, 8), (3, 4),
                            (89, 6), (6, 6)):
        x = rng.standard_normal((2, in_len, 3)).astype(np.float32)
        w = np.asarray(adaptive_pool_matrix(in_len, out_len))
        got = np.einsum('os,bsc->boc', w, x)
        want = F.adaptive_avg_pool1d(
            torch.from_numpy(x).permute(0, 2, 1), out_len
        ).permute(0, 2, 1).numpy()
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_discriminator_audio_fusion_nondivisible_time():
    """D audio fusion pools ANY (T_audio, t) pair — non-divisible and
    shorter-than-t audio included (the old integer-ratio reshape broke)."""
    import jax
    from a2m.config import DiscriminatorConfig
    from a2m.models import Discriminator
    cfg = DiscriminatorConfig(out_channels=8, joint_feat_dim=8, gat_heads=2,
                              dropout=0.1, audio_fusion=True)
    model = Discriminator(cfg)
    motion = jnp.zeros((2, 63, 104), jnp.float32)
    key = jax.random.PRNGKey(0)
    for t_audio in (64, 63, 7, 3):
        audio = jnp.ones((2, t_audio, 128), jnp.float32)
        variables = jax.jit(model.init)({'params': key, 'dropout': key},
                                        motion, audio=audio)
        scores, _ = model.apply(variables, motion, audio=audio, train=False)
        assert scores.shape == (2, 4)
        assert np.isfinite(np.asarray(scores)).all()


def test_fused_edge_rejected_at_config_time():
    """VERDICT r3 item 6: generator.fused_edge is rejected by config
    validation on a TPU backend (the kernel is CPU-interpret-only) instead
    of crashing at first on-device forward."""
    import pytest
    from a2m.config import Config, GeneratorConfig, validate
    cfg = Config(generator=GeneratorConfig(fused_edge=True))
    with pytest.raises(ValueError, match='fused_edge'):
        validate(cfg, backend='tpu')
    # CPU (interpret mode) keeps working — it is a recorded design study
    assert validate(cfg, backend='cpu') is cfg
    assert validate(Config(), backend='tpu') is not None
