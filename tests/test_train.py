"""Controller + train-step + single-epoch loop tests (SURVEY.md §4d)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from a2m.config import (Config, ControllerConfig, DataConfig,
                        DiscriminatorConfig, GeneratorConfig, TrainConfig)
from a2m.train.controller import DynamicGANTraining
from a2m.train.train_step import (init_states, make_train_steps, set_lr,
                                  smooth_labels)

TINY_G = GeneratorConfig(in_channels=16, out_channels=16, joint_feat_dim=8,
                         gat_heads=2, dropout=0.1)
TINY_D = DiscriminatorConfig(out_channels=8, joint_feat_dim=8, gat_heads=2,
                             dropout=0.1)


# ---------------------------------------------------------------------------
# DynamicGANTraining parity (reference version5_model_train.py:12-180)
# ---------------------------------------------------------------------------

def make_ctrl(**kw):
    return DynamicGANTraining(ControllerConfig(**kw))


def test_history_cap():
    c = make_ctrl()
    for i in range(150):
        c.update_loss_history(float(i), float(i))
    assert len(c.d_loss_history) == 100
    assert c.d_loss_history[0] == 50.0


def test_skip_discriminator_when_strong():
    c = make_ctrl()
    assert c.should_train_discriminator()  # empty history -> train
    for _ in range(20):
        c.update_loss_history(0.1, 0.9)    # D strong, G weak
    assert not c.should_train_discriminator()
    c2 = make_ctrl()
    for _ in range(20):
        c2.update_loss_history(0.5, 0.5)
    assert c2.should_train_discriminator()


def test_frequency_adaptation_bounds():
    c = make_ctrl()
    # D too strong -> G freq up to max 6, D freq down to min 1
    for _ in range(20):
        c.update_loss_history(0.01, 1.0)
    for epoch in range(10):
        g, d = c.adjust_training_frequency(epoch)
    assert g == 6 and d == 1
    # G too strong (ratio > 2.5) -> D up to max 2, G down to min 2
    c2 = make_ctrl()
    for _ in range(20):
        c2.update_loss_history(1.0, 0.2)
    for epoch in range(10):
        g, d = c2.adjust_training_frequency(epoch)
    assert g == 2 and d == 2


def test_lr_adaptation():
    c = make_ctrl(g_lr=5e-4, d_lr=1e-3)
    # short history -> initial LRs
    g, d = c.adjust_learning_rates(0)
    assert g == 5e-4 and d == 1e-3
    for _ in range(20):
        c.update_loss_history(0.1, 0.9)    # D strong
    g1, d1 = c.adjust_learning_rates(1)
    assert g1 == pytest.approx(5e-4 * 1.05)
    assert d1 == pytest.approx(1e-3 * 0.9)
    c2 = make_ctrl(g_lr=5e-4, d_lr=1e-3)
    for _ in range(20):
        c2.update_loss_history(0.7, 0.2)   # G strong
    g2, d2 = c2.adjust_learning_rates(1)
    assert g2 == pytest.approx(5e-4 * 0.9)
    assert d2 == pytest.approx(1e-3 * 1.05)


def test_lr_clamps():
    """a2m extension: g_lr_max / d_lr_min bound the multiplicative law.

    Parity default (0.0) stays unbounded — LEARNING.md run B measured the
    reference law compounding g_lr 26x over 80 epochs at full scale."""
    # unbounded by default: 40 "D strong" epochs compound without limit
    c = make_ctrl(g_lr=5e-4, d_lr=1e-3)
    for _ in range(20):
        c.update_loss_history(0.1, 0.9)
    for epoch in range(40):
        g, d = c.adjust_learning_rates(epoch)
    assert g == pytest.approx(5e-4 * 1.05 ** 40)
    assert d == pytest.approx(1e-3 * 0.9 ** 40)
    # clamped: growth stops at g_lr_max, decay floors at d_lr_min
    c2 = make_ctrl(g_lr=5e-4, d_lr=1e-3, g_lr_max=1e-3, d_lr_min=5e-4)
    for _ in range(20):
        c2.update_loss_history(0.1, 0.9)
    for epoch in range(40):
        g, d = c2.adjust_learning_rates(epoch)
    assert g == 1e-3 and d == 5e-4


def test_label_annealing():
    c = make_ctrl()
    lp0 = c.label_params(0, is_real=True)
    lp60 = c.label_params(60, is_real=True)
    lp100 = c.label_params(100, is_real=True)
    # early epochs: extra smoothing offset, more noise
    assert lp0.smooth_real == pytest.approx(0.98 - 0.05)
    assert lp0.noise_std == pytest.approx(0.01)
    assert lp60.smooth_real == pytest.approx(0.98)
    assert lp60.noise_std == pytest.approx(0.002)
    assert lp100.smooth_real == pytest.approx(0.98)
    f0 = c.label_params(0, is_real=False)
    assert f0.smooth_fake == pytest.approx(0.02 + 0.05)


def test_smooth_labels_device():
    key = jax.random.PRNGKey(0)
    real = np.asarray(smooth_labels(key, 16, 4, 0.93, 0.01, is_real=True))
    fake = np.asarray(smooth_labels(key, 16, 4, 0.07, 0.01, is_real=False))
    assert real.shape == (16, 4) and fake.shape == (16, 4)
    assert real.min() >= 0.85 and real.max() <= 1.0
    assert fake.min() >= 0.0 and fake.max() <= 0.15
    assert real.std() > 0  # noise applied


def test_controller_state_roundtrip():
    c = make_ctrl()
    for i in range(30):
        c.update_loss_history(0.3 + i * 0.01, 0.6)
    c.adjust_training_frequency(5)
    c.adjust_learning_rates(5)
    state = c.state_dict()
    c2 = make_ctrl()
    c2.load_state_dict(state)
    assert c2.g_lr_current == c.g_lr_current
    assert c2.d_loss_history == c.d_loss_history
    assert c2.g_train_freq == c.g_train_freq


# ---------------------------------------------------------------------------
# train steps
# ---------------------------------------------------------------------------

@pytest.fixture(scope='module')
def steps_and_states():
    from a2m.models import Discriminator, Generator
    cfg = TrainConfig()
    g_model, d_model = Generator(TINY_G), Discriminator(TINY_D)
    g_state, d_state = init_states(g_model, d_model, jax.random.PRNGKey(0),
                                   batch_size=4)
    g_step, d_step, eval_step = make_train_steps(g_model, d_model, cfg,
                                                 donate=False)
    return g_step, d_step, eval_step, g_state, d_state


def _fake_batch(rng, b=4):
    audio = jnp.asarray(rng.standard_normal((b, 64, 128)), jnp.float32)
    pose = jnp.asarray(rng.standard_normal((b, 64, 104)) * 10 + 300,
                       jnp.float32)
    return audio, pose


def test_g_step_finite_and_updates(steps_and_states, rng):
    g_step, _, _, g_state, d_state = steps_and_states
    audio, pose = _fake_batch(rng)
    mean = jnp.zeros(104)
    std = jnp.ones(104)
    new_g, new_d_bs, metrics = g_step(g_state, d_state, audio, pose, mean,
                                      std, 0.93, 0.01, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics['g_loss']))
    for k in ('g_gan', 'smooth', 'jerk', 'bone', 'angle'):
        assert np.isfinite(float(metrics[k]))
    # params changed
    diff = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                        g_state.params, new_g.params)
    assert max(jax.tree.leaves(diff)) > 0


def test_d_step_finite_and_updates(steps_and_states, rng):
    _, d_step, _, g_state, d_state = steps_and_states
    audio, pose = _fake_batch(rng)
    mean, std = jnp.zeros(104), jnp.ones(104)
    new_d, new_g, metrics = d_step(g_state, d_state, audio, pose, mean, std,
                                   0.93, 0.07, 0.01, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics['d_loss']))
    diff = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                        d_state.params, new_d.params)
    assert max(jax.tree.leaves(diff)) > 0
    # G params untouched by the D step (only its BN stats may change)
    diff_g = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                          g_state.params, new_g.params)
    assert max(jax.tree.leaves(diff_g)) == 0


def test_fused_gcn_eval_hybrid_matches_plain(steps_and_states, rng):
    """train.fused_gcn_eval routes ONLY gradient-free G forwards (d_step's
    no-grad fake generation, eval_step) through the fused Pallas GCN eval
    kernel; outputs match the XLA path within the kernel's bf16-matmul
    tolerance and the shared g_state is reused verbatim (identical param
    tree).  g_step keeps the XLA backward (measured faster on v5e)."""
    from a2m.models import Discriminator, Generator
    _, d_step, eval_step, g_state, d_state = steps_and_states
    g_model, d_model = Generator(TINY_G), Discriminator(TINY_D)
    _, d_step_h, eval_step_h = make_train_steps(
        g_model, d_model, TrainConfig(fused_gcn_eval=True), donate=False)
    audio, pose = _fake_batch(rng)
    mean, std = jnp.zeros(104), jnp.ones(104)
    key = jax.random.PRNGKey(2)
    _, _, m_ref = d_step(g_state, d_state, audio, pose, mean, std,
                         0.93, 0.07, 0.01, key)
    _, _, m_hyb = d_step_h(g_state, d_state, audio, pose, mean, std,
                           0.93, 0.07, 0.01, key)
    ref, hyb = float(m_ref['d_loss']), float(m_hyb['d_loss'])
    assert np.isfinite(hyb)
    assert abs(ref - hyb) < 0.05 * abs(ref) + 1e-3
    mask = jnp.ones(4)
    e_ref = eval_step(g_state, d_state, audio, pose, mean, std, mask)
    e_hyb = eval_step_h(g_state, d_state, audio, pose, mean, std, mask)
    for k in ('val_g', 'reg'):
        r, h = float(e_ref[k]), float(e_hyb[k])
        assert abs(r - h) < 0.05 * abs(r) + 1e-3, k


def test_ragged_batch_trains_with_masked_losses(steps_and_states, rng):
    """A wrap-padded ragged batch contributes gradient and its masked
    losses equal the dense small-batch semantics (VERDICT r1 #5: the
    reference trains ragged final batches, version5_model_train.py:300)."""
    g_step, d_step, _, g_state, d_state = steps_and_states
    audio, pose = _fake_batch(rng)          # batch 4
    # rows 0-2 real, row 3 a wrap-repeat of row 0, masked out
    audio = audio.at[3].set(audio[0])
    pose = pose.at[3].set(pose[0])
    mask = jnp.asarray([1.0, 1.0, 1.0, 0.0])
    mean, std = jnp.zeros(104), jnp.ones(104)
    key = jax.random.PRNGKey(3)

    new_g, _, gm = g_step(g_state, d_state, audio, pose, mean, std,
                          0.93, 0.0, key, None, mask)
    assert np.isfinite(float(gm['g_loss']))
    diff = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                        g_state.params, new_g.params)
    assert max(jax.tree.leaves(diff)) > 0   # ragged batch still trains

    new_d, _, dm = d_step(g_state, d_state, audio, pose, mean, std,
                          0.93, 0.07, 0.0, key, None, mask)
    assert np.isfinite(float(dm['d_loss']))

    # the padded row is EXACTLY inert: losses are mask-weighted AND BN
    # moments are mask-aware (a2m/nn/masking.py), so corrupting it changes
    # nothing — bit-identical losses (the reference trains true ragged
    # batches, version5_model_train.py:300; this is the equivalent)
    pose_bad = pose.at[3].set(pose[3] + 1000.0)
    audio_bad = audio.at[3].set(audio[3] * 50.0)
    _, _, gm_bad = g_step(g_state, d_state, audio_bad, pose_bad, mean, std,
                          0.93, 0.0, key, None, mask)
    assert float(gm_bad['g_loss']) == float(gm['g_loss'])
    _, _, dm_bad = d_step(g_state, d_state, audio_bad, pose_bad, mean, std,
                          0.93, 0.07, 0.0, key, None, mask)
    assert float(dm_bad['d_loss']) == float(dm['d_loss'])


def test_batcher_wrap_pads_final_batch(rng):
    """Batcher fills the ragged final batch by repeating real samples (so
    BN statistics see no zero rows) and masks the repeats."""
    from a2m.data.dataset import Batcher

    class _DS:
        def __len__(self):
            return 5

        def __getitem__(self, i):
            return {'pose/data': np.full((3, 4), i, np.float32), 'idx': i}

    batches = list(Batcher(_DS(), batch_size=4))
    assert len(batches) == 2
    last = batches[1]
    np.testing.assert_array_equal(last['mask'], [1.0, 0.0, 0.0, 0.0])
    # wrap-padding repeats row 0 of the ragged batch (sample idx 4)
    assert last['pose/data'].shape == (4, 3, 4)
    np.testing.assert_array_equal(last['pose/data'][1],
                                  last['pose/data'][0])
    assert last['idx'].tolist() == [4, 4, 4, 4]


def test_eval_step_masked(steps_and_states, rng):
    _, _, eval_step, g_state, d_state = steps_and_states
    audio, pose = _fake_batch(rng)
    mean, std = jnp.zeros(104), jnp.ones(104)
    mask = jnp.asarray([1.0, 1.0, 1.0, 0.0])
    metrics = eval_step(g_state, d_state, audio, pose, mean, std, mask)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k


def test_set_lr():
    import optax
    from a2m.train.train_step import make_optimizer
    tx = make_optimizer(1e-3)
    params = {'w': jnp.ones(3)}
    state = tx.init(params)
    state = set_lr(state, 5e-4)
    assert float(state.hyperparams['learning_rate']) == pytest.approx(5e-4)
    # update still works after LR override
    grads = {'w': jnp.ones(3)}
    updates, _ = tx.update(grads, state, params)
    assert np.isfinite(np.asarray(updates['w'])).all()


# ---------------------------------------------------------------------------
# one-epoch end-to-end loop on synthetic data
# ---------------------------------------------------------------------------

def test_trainer_one_epoch(tmp_path, rng):
    from a2m.data import DataLoader, make_synthetic_pats
    from a2m.train.loop import Trainer

    root = make_synthetic_pats(tmp_path / 'pats', speakers=('oliver',),
                               intervals_per_speaker=4, duration_s=8.0)
    cfg = Config(
        generator=TINY_G, discriminator=TINY_D,
        data=DataConfig(path2data=str(root), speakers=('oliver',),
                        batch_size=4, window_hop=30),
        train=TrainConfig(n_epochs=1, save_dir=str(tmp_path / 'save'),
                          log_every_batches=1000, donate_buffers=False),
    )
    dl = DataLoader(path2data=root, speaker=['oliver'],
                    modalities=['pose/data', 'audio/log_mel_512'],
                    fs_new=[15, 15], batch_size=4, window_hop=30)
    trainer = Trainer(cfg, dl, log_fn=lambda s: None)
    history = trainer.fit(1)
    assert len(history['val_g']) == 1
    assert np.isfinite(history['val_g'][0])

    # resume: a new trainer picks up epoch 1
    trainer2 = Trainer(cfg, dl, log_fn=lambda s: None)
    assert trainer2.start_epoch == 1


def test_trainer_rbg_rng_impl(tmp_path, rng):
    """train.rng_impl='rbg' (TPU hardware RNG; -4.9 ms/g_step on v5e):
    typed keys thread through split/dropout/label-noise unchanged."""
    from a2m.data import DataLoader, make_synthetic_pats
    from a2m.train.loop import Trainer

    root = make_synthetic_pats(tmp_path / 'pats', speakers=('oliver',),
                               intervals_per_speaker=2, duration_s=8.0)
    cfg = Config(
        generator=TINY_G, discriminator=TINY_D,
        data=DataConfig(path2data=str(root), speakers=('oliver',),
                        batch_size=4, window_hop=30),
        train=TrainConfig(n_epochs=1, save_dir=str(tmp_path / 'save'),
                          log_every_batches=1000, donate_buffers=False,
                          rng_impl='rbg'),
    )
    dl = DataLoader(path2data=root, speaker=['oliver'],
                    modalities=['pose/data', 'audio/log_mel_512'],
                    fs_new=[15, 15], batch_size=4, window_hop=30)
    trainer = Trainer(cfg, dl, log_fn=lambda s: None)
    history = trainer.fit(1)
    assert np.isfinite(history['val_g'][0])


def test_trainer_deferred_drain_exact_loss_sequence(tmp_path, rng):
    """The deferred metric drain (one-batch-lagged d2h fetch) must feed the
    controller exactly one (d, g) update per batch, with each g equal to
    that same batch's g_step metric — i.e. identical information to a fully
    synchronous loop, just fetched later."""
    from a2m.data import DataLoader, make_synthetic_pats
    from a2m.train.loop import Trainer

    root = make_synthetic_pats(tmp_path / 'pats', speakers=('oliver',),
                               intervals_per_speaker=4, duration_s=8.0)
    cfg = Config(
        generator=TINY_G, discriminator=TINY_D,
        data=DataConfig(path2data=str(root), speakers=('oliver',),
                        batch_size=4, window_hop=30),
        train=TrainConfig(n_epochs=1, save_dir=str(tmp_path / 'save'),
                          log_every_batches=1000, donate_buffers=False,
                          log_mfu=False, resume=False),
    )
    dl = DataLoader(path2data=root, speaker=['oliver'],
                    modalities=['pose/data', 'audio/log_mel_512'],
                    fs_new=[15, 15], batch_size=4, window_hop=30)
    trainer = Trainer(cfg, dl, log_fn=lambda s: None)

    g_losses, d_losses, updates = [], [], []
    raw_g, raw_d = trainer.g_step, trainer.d_step
    raw_update = trainer.controller.update_loss_history

    def rec_g(*a, **k):
        out = raw_g(*a, **k)
        g_losses.append(float(out[2]['g_loss']))
        return out

    def rec_d(*a, **k):
        out = raw_d(*a, **k)
        d_losses.append(float(out[2]['d_loss']))
        return out

    trainer.g_step, trainer.d_step = rec_g, rec_d
    trainer.controller.update_loss_history = (
        lambda d, g: (updates.append((d, g)), raw_update(d, g)))
    trainer.train_epoch(0)

    n_batches = sum(1 for _ in dl.train)
    assert len(updates) == n_batches        # one history entry per batch
    # g_freq may be >1: the history records the LAST g_step of each batch
    g_per_batch = len(g_losses) // n_batches
    assert g_per_batch >= 1
    assert [g for _, g in updates] == g_losses[g_per_batch - 1::g_per_batch]
    # every d in the history is either a real d_step loss or a carry-over
    # of the previous d (the skip-D rule, version5_model_train.py:407-411)
    seen_d = [d for d, _ in updates]
    for j, d in enumerate(seen_d):
        assert d in d_losses or (j > 0 and d == seen_d[j - 1]) or d == 0.0


def test_train_steps_with_audio_fusion(rng):
    """d_step/g_step/eval_step with discriminator.audio_fusion: the batch
    audio conditions every D forward (VERDICT r2 item 5)."""
    from a2m.models import Discriminator, Generator
    from a2m.config import DiscriminatorConfig
    d_cfg = DiscriminatorConfig(out_channels=8, joint_feat_dim=8,
                                gat_heads=2, dropout=0.1, audio_fusion=True)
    g_model, d_model = Generator(TINY_G), Discriminator(d_cfg)
    g_state, d_state = init_states(g_model, d_model, jax.random.PRNGKey(0),
                                   batch_size=4)
    g_step, d_step, eval_step = make_train_steps(g_model, d_model,
                                                 TrainConfig(), donate=False)
    audio, pose = _fake_batch(rng)
    mean, std = jnp.zeros(104), jnp.ones(104)
    new_g, _, gm = g_step(g_state, d_state, audio, pose, mean, std,
                          0.93, 0.01, jax.random.PRNGKey(1))
    assert np.isfinite(float(gm['g_loss']))
    new_d, _, dm = d_step(g_state, d_state, audio, pose, mean, std,
                          0.93, 0.07, 0.01, jax.random.PRNGKey(2))
    assert np.isfinite(float(dm['d_loss']))
    # audio_fusion params trained by the D step
    diff = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                        d_state.params['audio_fusion'],
                        new_d.params['audio_fusion'])
    assert max(jax.tree.leaves(diff)) > 0
    ev = eval_step(g_state, d_state, audio, pose, mean, std,
                   jnp.ones(4))
    assert np.isfinite(float(ev['val_d']))
    # and the conditioning is live end-to-end: different audio, different D
    ev2 = eval_step(g_state, d_state, audio + 1.0, pose, mean, std,
                    jnp.ones(4))
    assert float(ev2['val_d']) != float(ev['val_d'])


def test_lambda_pos_extension(steps_and_states, rng):
    """train.lambda_pos (a2m extension, default 0 = reference objective)
    adds masked L1 on absolute normalized pose to the G total, so PCK-style
    position tracking becomes trainable (LEARNING.md round-3 campaign)."""
    from a2m.models import Discriminator, Generator
    _, _, eval_step, g_state, d_state = steps_and_states
    audio, pose = _fake_batch(rng)
    mean, std = jnp.zeros(104), jnp.ones(104)
    ev = eval_step(g_state, d_state, audio, pose, mean, std, jnp.ones(4))
    assert np.isfinite(float(ev['pos'])) and float(ev['pos']) > 0

    g_model, d_model = Generator(TINY_G), Discriminator(TINY_D)
    g_step0, _, _ = make_train_steps(g_model, d_model,
                                     TrainConfig(), donate=False,
                                     jit_steps=False)
    g_step1, _, _ = make_train_steps(g_model, d_model,
                                     TrainConfig(lambda_pos=10.0),
                                     donate=False, jit_steps=False)
    _, _, m0 = g_step0(g_state, d_state, audio, pose, mean, std, 0.93,
                       0.01, jax.random.PRNGKey(1))
    _, _, m1 = g_step1(g_state, d_state, audio, pose, mean, std, 0.93,
                       0.01, jax.random.PRNGKey(1))
    # same inputs/key: totals differ by exactly the pos term's weight
    assert float(m1['g_loss']) > float(m0['g_loss'])
    assert np.isfinite(float(m1['g_loss']))


def test_derived_label_width_nondefault_downsampling(rng):
    """VERDICT r3 item 4: D label width derives from the D output shape —
    a non-default n_downsampling (T_out != 4) must train, not broadcast-
    break."""
    from a2m.models import Discriminator, Generator
    d_cfg = dataclasses.replace(TINY_D, n_downsampling=1)
    g_model, d_model = Generator(TINY_G), Discriminator(d_cfg)
    g_state, d_state = init_states(g_model, d_model, jax.random.PRNGKey(0),
                                   batch_size=4)
    g_step, d_step, eval_step = make_train_steps(g_model, d_model,
                                                 TrainConfig(),
                                                 donate=False)
    audio, pose = _fake_batch(rng)
    mean, std = jnp.zeros(104), jnp.ones(104)
    # D output is wider than the default stack's 4
    motion = jnp.zeros((4, 63, 104), jnp.float32)
    scores, _ = d_model.apply({'params': d_state.params,
                               'batch_stats': d_state.batch_stats},
                              motion, train=False)
    assert scores.shape[-1] != 4 and scores.shape[0] == 4
    new_g, _, gm = g_step(g_state, d_state, audio, pose, mean, std,
                          jnp.float32(0.93), jnp.float32(0.01),
                          jax.random.PRNGKey(1), style=None, mask=None)
    new_d, _, dm = d_step(new_g, d_state, audio, pose, mean, std,
                          jnp.float32(0.93), jnp.float32(0.07),
                          jnp.float32(0.01), jax.random.PRNGKey(2),
                          style=None, mask=None)
    ev = eval_step(new_g, new_d, audio, pose, mean, std, jnp.ones(4))
    assert np.isfinite(float(gm['g_loss']))
    assert np.isfinite(float(dm['d_loss']))
    assert np.isfinite(float(ev['val_d']))


def test_eval_step_reports_val_pck(steps_and_states, rng):
    """eval_step's val_pck is the PCK@0.2 of the generated poses in the
    denormalized space — same math as the harness metric."""
    from a2m.eval.metrics import compute_pck
    from a2m.train.train_step import NetState, normalize_pose_device
    from a2m.models import Generator
    _, _, eval_step, g_state, d_state = steps_and_states
    audio, pose = _fake_batch(rng)
    mean, std = jnp.zeros(104), jnp.ones(104) * 2.0
    ev = eval_step(g_state, d_state, audio, pose, mean, std, jnp.ones(4))
    assert 0.0 <= float(ev['val_pck']) <= 1.0
    # cross-check against the harness metric applied to the same forward
    g_model = Generator(TINY_G)
    fake = g_model.apply({'params': g_state.params,
                          'batch_stats': g_state.batch_stats},
                         audio, train=False)
    gen = np.asarray(fake * std + mean).reshape(-1, 2, 52)
    real = np.asarray(normalize_pose_device(pose, mean, std) * std
                      + mean).reshape(-1, 2, 52)
    want = float(np.asarray(compute_pck(jnp.asarray(gen), jnp.asarray(real),
                                        alpha=0.2)).reshape(4, -1)
                 .mean(axis=1).mean())
    assert float(ev['val_pck']) == pytest.approx(want, abs=1e-5)


def test_best_metric_selection(tmp_path, rng):
    """train.best_metric: val_pck is maximized (negated score), unknown
    metrics fail loudly, and the saved best_gen carries mean/std."""
    from a2m.data import DataLoader, make_synthetic_pats
    from a2m.train.loop import Trainer
    from a2m.train.checkpoint import load_generator_ckpt

    root = make_synthetic_pats(tmp_path / 'pats', speakers=('oliver',),
                               intervals_per_speaker=4, duration_s=8.0)
    cfg = Config(
        generator=TINY_G, discriminator=TINY_D,
        data=DataConfig(path2data=str(root), speakers=('oliver',),
                        batch_size=4, window_hop=30),
        train=TrainConfig(n_epochs=1, save_dir=str(tmp_path / 'save'),
                          log_every_batches=1000, donate_buffers=False,
                          log_mfu=False, best_metric='val_pck'),
    )
    dl = DataLoader(path2data=root, speaker=['oliver'],
                    modalities=['pose/data', 'audio/log_mel_512'],
                    fs_new=[15, 15], batch_size=4, window_hop=30)
    trainer = Trainer(cfg, dl, log_fn=lambda s: None)
    assert trainer.best_score({'val_pck': 0.7, 'val_g': 1.0}) == -0.7
    with pytest.raises(KeyError):
        trainer.best_score({'val_g': 1.0})
    trainer.fit(1)
    # best_gen was saved (first epoch always beats +inf) WITH the stats
    best = load_generator_ckpt(tmp_path / 'save' / 'ckpt' / 'best_gen',
                               trainer.g_state)
    assert best is not None and 'mean' in best
    np.testing.assert_allclose(best['mean'], np.asarray(trainer.mean),
                               rtol=1e-6)
    np.testing.assert_allclose(best['std'], np.asarray(trainer.std),
                               rtol=1e-6)
    # config validation rejects unknown metrics up front
    from a2m.config import validate
    bad = Config(train=TrainConfig(best_metric='nope'))
    with pytest.raises(ValueError):
        validate(bad, backend='cpu')


def test_trainer_mesh_matches_single_device(tmp_path, rng):
    """VERDICT r3 item 2: Trainer with cfg.mesh spanning the 8 virtual CPU
    devices reproduces the single-device loss sequence (GSPMD psum ==
    full-batch gradient), and best_gen/checkpoints still work."""
    from a2m.config import MeshConfig
    from a2m.data import DataLoader, make_synthetic_pats
    from a2m.train.loop import Trainer

    root = make_synthetic_pats(tmp_path / 'pats', speakers=('oliver',),
                               intervals_per_speaker=4, duration_s=8.0)

    def run(mesh, save):
        cfg = Config(
            generator=TINY_G, discriminator=TINY_D,
            data=DataConfig(path2data=str(root), speakers=('oliver',),
                            batch_size=8, window_hop=30),
            train=TrainConfig(n_epochs=1, save_dir=str(tmp_path / save),
                              log_every_batches=1000, donate_buffers=False,
                              log_mfu=False, resume=False),
            mesh=mesh,
        )
        dl = DataLoader(path2data=root, speaker=['oliver'],
                        modalities=['pose/data', 'audio/log_mel_512'],
                        fs_new=[15, 15], batch_size=8, window_hop=30)
        trainer = Trainer(cfg, dl, log_fn=lambda s: None)
        if mesh.data != 1:
            assert trainer.mesh is not None, 'mesh path must engage'
        else:
            assert trainer.mesh is None
        trainer.fit(1)
        return (trainer.controller.g_loss_history,
                trainer.controller.d_loss_history,
                trainer.loss_history['val_g'][0])

    g1, d1, v1 = run(MeshConfig(data=1), 'save_single')
    g8, d8, v8 = run(MeshConfig(data=-1), 'save_mesh')
    assert len(g1) == len(g8) >= 1
    # FIRST-step equivalence is tight (no compounding yet): a ~1% sharding
    # bug in the forward/backward/psum cannot hide here (VERDICT r4 item 8).
    # Legitimate 8-way-psum reduction-order drift through the deep GAN loss
    # measures ~2e-3 relative on CPU, so the bound is 5e-3, not 1e-4.
    np.testing.assert_allclose(g8[0], g1[0], rtol=5e-3, atol=1e-4)
    np.testing.assert_allclose(d8[0], d1[0], rtol=5e-3, atol=1e-4)
    # per-STEP sharded-vs-single equivalence is 1e-4 (asserted in
    # test_parallel.py::test_gan_step_sharding_equivalence); over an epoch
    # the reduction-order float drift compounds through Adam + BatchNorm
    # chains (g_freq sequential updates per batch), so the sequence-level
    # tolerance is looser — observed ~2e-3 relative after one epoch.
    # (Trainer-level SEQUENCE equivalence at 1e-4 is asserted where the
    # program is identical on both sides: the 2-process-vs-1-process run,
    # tests/test_distributed.py::test_two_process_cpu_launch.)
    np.testing.assert_allclose(g8, g1, rtol=1e-2, atol=1e-3)
    np.testing.assert_allclose(d8, d1, rtol=1e-2, atol=1e-3)
    assert v8 == pytest.approx(v1, rel=1e-2, abs=1e-3)


def test_trainer_mesh_batch_divisibility(tmp_path):
    """Batch sizes not divisible by the data axis fail loudly at init."""
    from a2m.config import MeshConfig
    from a2m.data import DataLoader, make_synthetic_pats
    from a2m.train.loop import Trainer

    root = make_synthetic_pats(tmp_path / 'pats', speakers=('oliver',),
                               intervals_per_speaker=2, duration_s=8.0)
    cfg = Config(
        generator=TINY_G, discriminator=TINY_D,
        data=DataConfig(path2data=str(root), speakers=('oliver',),
                        batch_size=6, window_hop=30),
        train=TrainConfig(save_dir=str(tmp_path / 'save')),
        mesh=MeshConfig(data=4),
    )
    dl = DataLoader(path2data=root, speaker=['oliver'],
                    modalities=['pose/data', 'audio/log_mel_512'],
                    fs_new=[15, 15], batch_size=6, window_hop=30)
    with pytest.raises(ValueError, match='not divisible'):
        Trainer(cfg, dl, log_fn=lambda s: None)


def test_best_gen_npz_roundtrip_preserves_large_bn_var(tmp_path):
    """Packed .npz best-G: params quantize to f16, but batch_stats stay
    f32 — GAN-trained BN variances exceed f16 max (65504) and an f16
    pack turned them inf, silently breaking the restored model (round-5
    flagship packed at PCK 0.363 instead of 0.763).  Out-of-range params
    must also survive."""
    import numpy as np
    from a2m.train.checkpoint import (load_best_generator_npz,
                                      save_best_generator_npz)
    best = dict(
        params={'enc': {'kernel': np.linspace(-1, 1, 12, dtype=np.float32)
                        .reshape(3, 4),
                        'huge': np.array([1e5, -2e5], np.float32)}},
        batch_stats={'bn': {'var': np.array([1.5e5, 1e-6, 3.0], np.float32),
                            'mean': np.array([0.5, -2.0, 7e4], np.float32)}},
        mean=np.zeros(104, np.float32), std=np.ones(104, np.float32))
    path = tmp_path / 'g.npz'
    save_best_generator_npz(best, path)
    out = load_best_generator_npz(path)
    # batch_stats: exact f32 round-trip, no inf/overflow
    np.testing.assert_array_equal(out['batch_stats']['bn']['var'],
                                  best['batch_stats']['bn']['var'])
    np.testing.assert_array_equal(out['batch_stats']['bn']['mean'],
                                  best['batch_stats']['bn']['mean'])
    # in-range params: f16-grade closeness; out-of-range: exact (kept f32)
    np.testing.assert_allclose(out['params']['enc']['kernel'],
                               best['params']['enc']['kernel'], rtol=1e-3)
    np.testing.assert_array_equal(out['params']['enc']['huge'],
                                  best['params']['enc']['huge'])
    assert all(np.isfinite(v).all() for v in
               (out['params']['enc']['huge'],
                out['batch_stats']['bn']['var']))
    np.testing.assert_array_equal(out['mean'], best['mean'])
