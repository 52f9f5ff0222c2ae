"""Supervised-only learnability probe on the det synthetic data (CPU-able).

LEARNING.md run E1 found the full-size generator pinned at the static-output
motion-L1 floor (~0.094): zero learning of a mapping that is linear by
construction.  This probe isolates why, cheaply: tiny config, one speaker,
G-step only (lambda_gan=0), sweeping one knob per variant.

Usage: python scripts/sup_probe.py [variant ...] [--epochs N]
Variants: lr5e-4 (baseline) lr2e-3 lr5e-3 nodrop lr2e-3_nodrop ...
Each prints one JSON line: val reg trajectory + floor.
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

DATA = '/tmp/a2m_data_det'


def run(name: str, epochs: int) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from a2m.config import (Config, DiscriminatorConfig, GeneratorConfig,
                            TrainConfig)
    from a2m.data import DataLoader, get_mean_std_necksub
    from a2m.models import Discriminator, Generator
    from a2m.train.train_step import (init_states, make_train_steps,
                                      normalize_pose_device, set_lr)
    from a2m.models import losses as L

    lr = 5e-4
    for tok in name.split('_'):
        if tok.startswith('lr'):
            lr = float(tok[2:])
    drop = 0.0 if 'nodrop' in name else 0.2

    gcfg = GeneratorConfig(in_channels=16, out_channels=16, joint_feat_dim=8,
                           gat_heads=2, dropout=drop)
    dcfg = DiscriminatorConfig(out_channels=8, joint_feat_dim=8, gat_heads=2)
    tcfg = TrainConfig(lambda_gan=0.0)
    g_model, d_model = Generator(gcfg), Discriminator(dcfg)

    dl = DataLoader(path2data=DATA, speaker=['oliver'],
                    modalities=['pose/data', 'audio/log_mel_512'],
                    fs_new=[15, 15], batch_size=32, window_hop=5,
                    shuffle=True, seed=0)
    mean, std = get_mean_std_necksub(dl.train)
    mean_j, std_j = jnp.asarray(mean), jnp.asarray(std)

    g_state, d_state = init_states(g_model, d_model, jax.random.PRNGKey(0),
                                   batch_size=32, g_lr=lr)
    g_step, _, eval_step = make_train_steps(g_model, d_model, tcfg,
                                            donate=False)

    def val_reg():
        vals, floors = [], []
        for i, b in enumerate(dl.dev):
            if i >= 3:
                break
            m = eval_step(g_state, d_state, jnp.asarray(b['audio/log_mel_512']),
                          jnp.asarray(b['pose/data']), mean_j, std_j,
                          jnp.asarray(b['mask'], jnp.float32))
            vals.append(float(m['val_g']))
            rp = normalize_pose_device(jnp.asarray(b['pose/data']), mean_j,
                                       std_j)
            floors.append(float(jnp.abs(L.pos_to_motion(rp)).mean()))
        return float(np.mean(vals)), float(np.mean(floors))

    key = jax.random.PRNGKey(1)
    smooth = jnp.float32(0.98)
    noise = jnp.float32(0.01)
    traj = []
    v0, floor = val_reg()
    traj.append(round(v0, 4))
    t0 = time.perf_counter()
    for epoch in range(epochs):
        for b in dl.train:
            key, k = jax.random.split(key)
            g_state, _, _ = g_step(g_state, d_state,
                                   jnp.asarray(b['audio/log_mel_512']),
                                   jnp.asarray(b['pose/data']),
                                   mean_j, std_j, smooth, noise, k,
                                   None, jnp.asarray(b['mask'], jnp.float32))
        v, _ = val_reg()
        traj.append(round(v, 4))
    return dict(variant=name, lr=lr, dropout=drop, epochs=epochs,
                floor=round(floor, 4), val_reg=traj,
                wall_s=round(time.perf_counter() - t0, 1))


if __name__ == '__main__':
    args = [a for a in sys.argv[1:] if not a.startswith('--')]
    epochs = 10
    if '--epochs' in sys.argv:
        epochs = int(sys.argv[sys.argv.index('--epochs') + 1])
        args = [a for a in args if a != str(epochs)]
    for v in (args or ['lr5e-4', 'lr2e-3']):
        print(json.dumps(run(v, epochs)), flush=True)
