"""Single-batch overfit probe (full-size generator, TPU).

LEARNING.md E1/E1': the flagship generator stays pinned at the zero-motion
L1 floor on a frame-locked, provably-learnable fixture (oracle probe
R^2 0.95).  The decisive split between "optimization is slow" and
"gradients are structurally broken": can the model OVERFIT one batch?

Trains g_step on a single fixed batch and logs the motion-L1 (``reg``)
trajectory.  Variants sweep LR and dropout via the same step functions the
campaign uses.

Usage: python scripts/overfit_probe.py [lr5e-4 lr2e-3_nodrop ...] [--steps N]
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

DATA = '/tmp/a2m_data_det'


def run(name: str, steps: int) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from a2m.config import (DiscriminatorConfig, GeneratorConfig,
                            TrainConfig)
    from a2m.data import DataLoader, get_mean_std_necksub
    from a2m.models import Discriminator, Generator
    from a2m.train.train_step import init_states, make_train_steps

    lr = 5e-4
    for tok in name.split('_'):
        if tok.startswith('lr'):
            lr = float(tok[2:])
    drop = 0.0 if 'nodrop' in name else 0.2

    gcfg = GeneratorConfig(dropout=drop)
    g_model = Generator(gcfg)
    d_model = Discriminator(DiscriminatorConfig())
    # 'nosj' zeroes the smooth/jerk norm penalties: at zero acceleration
    # their subgradient has CONSTANT magnitude ~lambda*sqrt(F) per
    # coordinate (L2 norms are 1-homogeneous), comparable to the motion-L1
    # pull — the static-pose subgradient trap hypothesis (LEARNING.md)
    sj = 0.0 if 'nosj' in name else None
    tcfg = TrainConfig(lambda_gan=0.0,
                       **({'lambda_smooth': 0.0, 'lambda_jerk': 0.0}
                          if sj == 0.0 else {}))

    dl = DataLoader(path2data=DATA, speaker=['oliver'],
                    modalities=['pose/data', 'audio/log_mel_512'],
                    fs_new=[15, 15], batch_size=128, window_hop=5,
                    shuffle=True, seed=0)
    mean, std = get_mean_std_necksub(dl.train)
    mean_j, std_j = jnp.asarray(mean), jnp.asarray(std)
    batch = next(iter(dl.train))
    audio = jnp.asarray(batch['audio/log_mel_512'])
    pose = jnp.asarray(batch['pose/data'])
    mask = jnp.asarray(batch['mask'], jnp.float32)

    g_state, d_state = init_states(g_model, d_model, jax.random.PRNGKey(0),
                                   batch_size=128, g_lr=lr)
    g_step, _, eval_step = make_train_steps(g_model, d_model, tcfg,
                                            donate=False)

    key = jax.random.PRNGKey(1)
    smooth, noise = jnp.float32(0.98), jnp.float32(0.01)
    traj = []
    t0 = time.perf_counter()
    for step in range(steps):
        key, k = jax.random.split(key)
        g_state, _, metrics = g_step(g_state, d_state, audio, pose,
                                     mean_j, std_j, smooth, noise, k,
                                     None, mask)
        if step % 25 == 0 or step == steps - 1:
            ev = eval_step(g_state, d_state, audio, pose, mean_j, std_j,
                           mask)
            traj.append(dict(step=step, reg=round(float(ev['val_g']), 4),
                             smooth=round(float(ev['smooth']), 4),
                             train_g=round(float(metrics['g_loss']), 4)))
            print(json.dumps(dict(variant=name, **traj[-1])), flush=True)
    return dict(variant=name, lr=lr, dropout=drop, steps=steps, traj=traj,
                wall_s=round(time.perf_counter() - t0, 1))


if __name__ == '__main__':
    args = [a for a in sys.argv[1:] if not a.startswith('--')]
    steps = 400
    if '--steps' in sys.argv:
        steps = int(sys.argv[sys.argv.index('--steps') + 1])
        args = [a for a in args if a != str(steps)]
    for v in (args or ['lr5e-4']):
        print(json.dumps(run(v, steps)), flush=True)
