"""Jitted GAN train/eval steps.

Reference semantics (`version5_model_train.py:325-495`) restructured for XLA:

* two fixed jitted steps (``g_step``, ``d_step``) with static shapes and
  donated state — the controller's data-dependent branching (skip-D,
  variable frequencies, LR mutation) stays host-side and only feeds traced
  scalars, so nothing ever recompiles;
* pose normalization happens on-device inside the step (given train-set
  stats), fixing the reference's pairing-by-batch-index fragility
  (version5_model_train.py:298-337);
* label smoothing/noise is sampled on-device from controller scalars;
* learning rates are optax ``inject_hyperparams`` scalars the controller
  overwrites between epochs (multiplicative adaptation preserved);
* BatchNorm parity: all forwards inside a train step run in train mode and
  update running statistics — exactly what the reference's
  ``model.train()``-mode forwards do, including the D forward inside the G
  loss and the no-grad G forward inside the D step.  BN moments are
  mask-aware (``a2m/nn/masking.py``): wrap-padded rows of the ragged final
  batch are exactly inert, matching the reference's true ragged batches
  (version5_model_train.py:300) without recompiling.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax
from flax.core import FrozenDict

from a2m.config import TrainConfig
from a2m.models import Discriminator, Generator
from a2m.nn import masking
from a2m.models import losses as L
from a2m.models.discriminator import aux_cross_entropy
from a2m.eval.metrics import pck_radius


class NetState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any


def make_optimizer(lr: float, grad_clip_norm: float = 0.0
                   ) -> optax.GradientTransformation:
    """Adam with an injectable learning rate (torch defaults: betas (0.9,
    0.999), eps 1e-8 — version5_model_train.py:285-286), optionally preceded
    by global-norm gradient clipping (bf16 stability; off by default for
    reference parity)."""
    if grad_clip_norm and grad_clip_norm > 0:
        @optax.inject_hyperparams
        def tx(learning_rate):
            return optax.chain(optax.clip_by_global_norm(grad_clip_norm),
                               optax.adam(learning_rate))
        return tx(learning_rate=lr)
    return optax.inject_hyperparams(optax.adam)(learning_rate=lr)


def set_lr(opt_state, lr):
    """Overwrite the injected learning-rate hyperparam."""
    opt_state.hyperparams['learning_rate'] = jnp.asarray(lr, jnp.float32)
    return opt_state


def init_states(g_model: Generator, d_model: Discriminator, key,
                batch_size: int, time_steps: int = 64,
                audio_feats: int = 128, g_lr: float = 5e-4,
                d_lr: float = 1e-3, grad_clip_norm: float = 0.0
                ) -> tuple[NetState, NetState]:
    kg, kd, kdrop = jax.random.split(key, 3)
    audio = jnp.zeros((batch_size, time_steps, audio_feats), jnp.float32)
    motion = jnp.zeros((batch_size, time_steps - 1, 104), jnp.float32)
    # jit the inits: eager-mode init dispatches hundreds of tiny per-primitive
    # compiles, which is pathological on remote-compile TPU backends
    gv = jax.jit(g_model.init)({'params': kg, 'dropout': kdrop}, audio)
    # init D with audio iff the train steps will condition it on audio —
    # otherwise the fusion params would not exist at apply time
    d_audio = audio if d_model.config.audio_fusion else None
    dv = jax.jit(d_model.init)({'params': kd, 'dropout': kdrop}, motion,
                               audio=d_audio)
    g_opt = make_optimizer(g_lr, grad_clip_norm).init(gv['params'])
    d_opt = make_optimizer(d_lr, grad_clip_norm).init(dv['params'])
    return (NetState(gv['params'], gv.get('batch_stats', FrozenDict({})),
                     g_opt),
            NetState(dv['params'], dv.get('batch_stats', FrozenDict({})),
                     d_opt))


def normalize_pose_device(pose, mean, std):
    """Neck-sub + standardize on device (block layout)."""
    b, t, f = pose.shape
    p = pose.reshape(b, t, 2, -1)
    p = p - p[..., 0:1]
    return (p.reshape(b, t, f) - mean) / std


def smooth_labels(key, batch_size: int, out_dim: int, smooth: jnp.ndarray,
                  noise_std: jnp.ndarray, is_real: bool) -> jnp.ndarray:
    """On-device annealed smooth labels (version5_model_train.py:160-180)."""
    base = jnp.full((batch_size, out_dim), smooth, jnp.float32)
    noisy = base + noise_std * jax.random.normal(key, base.shape)
    if is_real:
        return jnp.clip(noisy, 0.85, 1.0)
    return jnp.clip(noisy, 0.0, 0.15)


def _maybe_remat(loss_fn, policy_name: str):
    """Optionally rematerialize the G loss forward (``train.remat``).

    The step is bandwidth-bound (README roofline: ~15 FLOP/byte, 4x below
    the v5e f32 ridge), so trading idle MXU FLOPs for fewer residual
    reads/writes can pay.  'dots' keeps matmul outputs resident and
    recomputes the elementwise chains (BN/LeakyReLU/dropout) in the
    backward; 'full' recomputes the entire forward.  Numerics are
    unchanged — remat replays the SAME ops with the SAME PRNG keys.
    """
    if not policy_name:
        return loss_fn
    if policy_name == 'full':
        return jax.checkpoint(loss_fn)
    if policy_name == 'dots':
        return jax.checkpoint(
            loss_fn,
            policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable)
    raise ValueError(f'train.remat={policy_name!r}: use "", "full" or '
                     f'"dots"')


def _apply_g(g_model, params, batch_stats, audio, key, train,
             speaker_ids=None):
    variables = {'params': params, 'batch_stats': batch_stats}
    if train:
        out, mutated = g_model.apply(
            variables, audio, train=True, rngs={'dropout': key},
            mutable=['batch_stats'], speaker_ids=speaker_ids)
        return out, mutated['batch_stats']
    return (g_model.apply(variables, audio, train=False,
                          speaker_ids=speaker_ids), batch_stats)


def _apply_d(d_model, params, batch_stats, motion, key, train, audio=None):
    """``audio``: optional (B, T_a, F) conditioning — passed iff the config's
    ``audio_fusion`` is on (real_motion_model.py:624-628)."""
    variables = {'params': params, 'batch_stats': batch_stats}
    if train:
        (scores, aux), mutated = d_model.apply(
            variables, motion, audio=audio, train=True,
            rngs={'dropout': key}, mutable=['batch_stats'])
        return scores, aux, mutated['batch_stats']
    scores, aux = d_model.apply(variables, motion, audio=audio, train=False)
    return scores, aux, batch_stats


def _per_sample_angles(pose, hand: bool):
    """Per-sample mean angle range penalty (for masked eval breakdowns)."""
    from a2m import constants
    if hand:
        joints = L.to_joints(pose)[..., 10:52, :]
        triples, lo = constants.hand_triples(), 0.0
    else:
        joints = L.to_joints(pose)[..., :10, :]
        triples, lo = constants.body_triples(), -jnp.pi / 2
    angles = L._signed_angles(joints, triples)
    pen = jax.nn.relu(lo - angles) + jax.nn.relu(angles - jnp.pi)
    return pen.reshape(pose.shape[0], -1).mean(axis=1)


def masked_motion_losses(real_pose, real_motion, fake_pose, fake_motion,
                         mask):
    """Masked kinematic loss breakdown (L1 motion, smoothness, jerk, bone,
    angle) — the SINGLE definition shared by g_step and eval_step so train
    and validation metrics can never diverge.

    Mirrors version5_model_train.py:216-248,467-492 with per-sample means
    weighted by ``mask`` (all-ones == the reference's global means).
    """
    def mm(x):
        return L.masked_mean(x, mask)

    accel = fake_motion[:, 1:] - fake_motion[:, :-1]
    jerk = accel[:, 1:] - accel[:, :-1]
    return dict(
        reg=mm(jnp.abs(real_motion - fake_motion)),
        pos=mm(jnp.abs(real_pose - fake_pose)),
        smooth=mm(L.safe_norm(accel, axis=-1)),
        jerk=mm(L.safe_norm(jerk, axis=-1)),
        bone=mm((L.bone_lengths(fake_pose) - L.bone_lengths(real_pose)) ** 2),
        angle=mm(0.7 * _per_sample_angles(fake_pose, hand=True)
                 + 0.3 * _per_sample_angles(fake_pose, hand=False)),
    )


def make_train_steps(g_model: Generator, d_model: Discriminator,
                     cfg: TrainConfig, donate: bool = True,
                     jit_steps: bool = True):
    """Build (g_step, d_step, eval_step) closures; ``jit_steps=False``
    returns the raw traceable functions (for custom sharding wrappers)."""

    g_tx = make_optimizer(cfg.controller.g_lr, cfg.grad_clip_norm)
    d_tx = make_optimizer(cfg.controller.d_lr, cfg.grad_clip_norm)
    # hybrid fused-GCN split (train.fused_gcn_eval): gradient-free G
    # forwards (fake generation in d_step, eval_step) run the fused Pallas
    # eval kernel (1.4x faster d_step measured on v5e); g_step keeps the
    # XLA path whose backward beats the fused backward kernel.  The fused
    # twin shares g_state verbatim — identical param tree
    # (tests/test_pallas_gcn.py::test_generator_fused_flag_matches_unfused).
    fused_eval = cfg.fused_gcn_eval
    if fused_eval is None:
        # auto: the fused eval kernel is profitable on the real chip
        # (d_step 1.4x); CPU (tests, interpret-mode Pallas) and the
        # sharded wrappers (jit_steps=False) keep the XLA path
        fused_eval = jit_steps and jax.default_backend() == 'tpu'
    g_nograd_model = g_model
    if fused_eval and not g_model.config.fused_gcn:
        import dataclasses
        g_nograd_model = type(g_model)(
            dataclasses.replace(g_model.config, fused_gcn=True,
                                fused_rolled=True),
            dtype=g_model.dtype, precision=g_model.precision)
    if cfg.lambda_aux > 0:
        assert d_model.config.use_aux_classifier, (
            'train.lambda_aux > 0 requires discriminator.use_aux_classifier')
    # audio conditioning of D (discriminator.audio_fusion): feed the batch
    # audio into every D forward; None keeps the unconditioned graph
    d_audio = (lambda audio: audio) if d_model.config.audio_fusion \
        else (lambda audio: None)

    def g_step(g_state: NetState, d_state: NetState, audio, pose,
               mean, std, smooth, noise_std, key, style=None, mask=None):
        """One generator update (version5_model_train.py:350-379).

        Returns (new_g_state, new_d_batch_stats, metrics).  D's running BN
        stats update because its forward runs in train mode, matching torch.
        ``style``: optional (B,) int32 speaker ids for style conditioning.
        ``mask``: optional (B,) 1/0 weights — wrap-padded final-batch rows
        are zero-weighted so ragged batches train exactly like the
        reference's (version5_model_train.py:300) without recompiling.
        """
        k_label, k_gdrop, k_ddrop = jax.random.split(key, 3)
        real_pose = normalize_pose_device(pose, mean, std)
        real_motion = L.pos_to_motion(real_pose)

        def loss_fn(g_params):
            # batch_mask: wrap-padded rows are excluded from BN moments in
            # every train-mode forward (a2m/nn/masking.py)
            with masking.batch_mask(mask):
                fake_pose, new_g_bs = _apply_g(g_model, g_params,
                                               g_state.batch_stats, audio,
                                               k_gdrop, True,
                                               speaker_ids=style)
                fake_motion = L.pos_to_motion(fake_pose)
                fake_d, _, new_d_bs = _apply_d(d_model, d_state.params,
                                               d_state.batch_stats,
                                               fake_motion, k_ddrop, True,
                                               audio=d_audio(audio))
            # label width derives from the D output (T_out of its conv
            # stack) so non-default n_downsampling / time_steps configs get
            # correctly-shaped smooth labels (shapes are static under jit)
            valid = smooth_labels(k_label, audio.shape[0], fake_d.shape[-1],
                                  smooth, noise_std, is_real=True)

            kin = masked_motion_losses(real_pose, real_motion, fake_pose,
                                       fake_motion, mask)
            g_loss = (kin['reg'] + cfg.lambda_gan
                      * L.masked_mean((fake_d - valid) ** 2, mask))
            total = (g_loss + cfg.lambda_smooth * kin['smooth']
                     + cfg.lambda_jerk * kin['jerk'] + kin['bone']
                     + kin['angle'] + cfg.lambda_pos * kin['pos'])
            metrics = dict(g_loss=total, g_gan=g_loss, smooth=kin['smooth'],
                           jerk=kin['jerk'], bone=kin['bone'],
                           angle=kin['angle'])
            return total, (new_g_bs, new_d_bs, metrics)

        grads, (new_g_bs, new_d_bs, metrics) = jax.grad(
            _maybe_remat(loss_fn, cfg.remat), has_aux=True)(g_state.params)
        updates, new_opt = g_tx.update(grads, g_state.opt_state,
                                       g_state.params)
        new_params = optax.apply_updates(g_state.params, updates)
        return (NetState(new_params, new_g_bs, new_opt), new_d_bs, metrics)

    def d_step(g_state: NetState, d_state: NetState, audio, pose,
               mean, std, smooth_r, smooth_f, noise_std, key, style=None,
               mask=None):
        """One discriminator update (version5_model_train.py:385-405).

        With ``cfg.lambda_aux > 0`` and ``style`` labels, the aux
        classifier CE on the real branch is added
        (real_motion_model.py:635-640 — optional there too).
        ``mask``: see :func:`g_step`.
        """
        k_lr, k_lf, k_gdrop, k_d1, k_d2 = jax.random.split(key, 5)
        real_pose = normalize_pose_device(pose, mean, std)
        real_motion = L.pos_to_motion(real_pose)

        # no-grad G forward in train mode (version5_model_train.py:391-393)
        with masking.batch_mask(mask):
            fake_pose, new_g_bs = _apply_g(g_nograd_model, g_state.params,
                                           g_state.batch_stats, audio,
                                           k_gdrop, True, speaker_ids=style)
        fake_motion = jax.lax.stop_gradient(L.pos_to_motion(fake_pose))

        def loss_fn(d_params):
            with masking.batch_mask(mask):
                fake_d, _, bs1 = _apply_d(d_model, d_params,
                                          d_state.batch_stats, fake_motion,
                                          k_d1, True, audio=d_audio(audio))
                real_d, aux_real, bs2 = _apply_d(d_model, d_params, bs1,
                                                 real_motion, k_d2, True,
                                                 audio=d_audio(audio))
            # label width from the D output shape (see g_step)
            valid = smooth_labels(k_lr, audio.shape[0], real_d.shape[-1],
                                  smooth_r, noise_std, is_real=True)
            fake = smooth_labels(k_lf, audio.shape[0], fake_d.shape[-1],
                                 smooth_f, noise_std, is_real=False)

            def mm(x):
                return L.masked_mean(x, mask)

            real_loss = mm((real_d - valid) ** 2)
            fake_loss = mm((fake_d - fake) ** 2)
            total = real_loss + cfg.lambda_d * fake_loss
            metrics = dict(d_loss=total, d_real=real_loss, d_fake=fake_loss)
            if cfg.lambda_aux > 0 and style is not None:
                aux_l = aux_cross_entropy(aux_real, style, mask)
                total = total + cfg.lambda_aux * aux_l
                metrics = dict(metrics, d_loss=total, d_aux=aux_l)
            return total, (bs2, metrics)

        grads, (new_d_bs, metrics) = jax.grad(loss_fn, has_aux=True)(
            d_state.params)
        updates, new_opt = d_tx.update(grads, d_state.opt_state,
                                       d_state.params)
        new_params = optax.apply_updates(d_state.params, updates)
        return (NetState(new_params, new_d_bs, new_opt),
                g_state._replace(batch_stats=new_g_bs), metrics)

    def eval_step(g_state: NetState, d_state: NetState, audio, pose,
                  mean, std, mask, style=None):
        """Validation pass with the reference's loss breakdown
        (version5_model_train.py:425-495); eval mode, hard 1/0 labels,
        masked means over the padded final batch.  Also reports ``val_pck``
        (PCK@0.2 in the denormalized pose space, motion_evaluation.py:4-23
        semantics) so best-checkpoint selection can target the quality
        metric directly instead of the GAN-drifting total loss."""
        real_pose = normalize_pose_device(pose, mean, std)
        real_motion = L.pos_to_motion(real_pose)
        fake_pose, _ = _apply_g(g_nograd_model, g_state.params,
                                g_state.batch_stats, audio, None, False,
                                speaker_ids=style)
        fake_motion = L.pos_to_motion(fake_pose)
        fake_d, _, _ = _apply_d(d_model, d_state.params, d_state.batch_stats,
                                fake_motion, None, False,
                                audio=d_audio(audio))
        real_d, _, _ = _apply_d(d_model, d_state.params, d_state.batch_stats,
                                real_motion, None, False,
                                audio=d_audio(audio))
        valid = jnp.ones_like(fake_d)
        fake_lab = jnp.zeros_like(fake_d)

        kin = masked_motion_losses(real_pose, real_motion, fake_pose,
                                   fake_motion, mask)
        g_gan = L.masked_mean((fake_d - valid) ** 2, mask)
        d_loss = (L.masked_mean((real_d - valid) ** 2, mask)
                  + cfg.lambda_d * L.masked_mean((fake_d - fake_lab) ** 2,
                                                 mask))
        # PCK@0.2 on denormalized keypoints (the harness's metric,
        # a2m/eval/metrics.py; denormalize(normalized) == neck-sub space)
        b, t, f = pose.shape
        gen_kp = (fake_pose * std + mean).reshape(b * t, 2, f // 2)
        gt_kp = (real_pose * std + mean).reshape(b * t, 2, f // 2)
        radius = pck_radius(gt_kp, 0.2)[:, None]
        dist = jnp.sqrt(jnp.sum((gt_kp - gen_kp) ** 2, axis=1))
        per_clip = ((dist <= radius).astype(jnp.float32)
                    .mean(axis=1).reshape(b, t).mean(axis=1))
        val_pck = L.masked_mean(per_clip, mask)
        return dict(val_g=kin['reg'] + cfg.lambda_gan * g_gan, val_d=d_loss,
                    reg=kin['reg'], pos=kin['pos'], gan=g_gan,
                    bone=kin['bone'], angle=kin['angle'],
                    smooth=kin['smooth'], jerk=kin['jerk'],
                    val_pck=val_pck)

    if not jit_steps:
        return g_step, d_step, eval_step
    g_step_j = jax.jit(g_step, donate_argnums=(0,) if donate else ())
    d_step_j = jax.jit(d_step, donate_argnums=(1,) if donate else ())
    eval_step_j = jax.jit(eval_step)
    return g_step_j, d_step_j, eval_step_j
