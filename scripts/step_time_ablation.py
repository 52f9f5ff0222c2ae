"""Train-step hotspot ablation on the real TPU.

Times g_step/d_step under controlled variations (dtype, dropout on/off,
RNG implementation) with per-step blocking, and prints one JSON line per
variant.  Used to find and verify the top hotspot for the README MFU table
(VERDICT r1 #4).

Usage:  python scripts/step_time_ablation.py [variant ...]
Variants: f32 bf16 f32_nodrop bf16_nodrop f32_rbg bf16_rbg, each with an
optional @<batch> suffix (e.g. f32@512) — default batch 128.  A ``fused``
token (e.g. f32_fused) enables generator.fused_gcn: the trainable fused
Pallas GCN stacks (forward + custom-VJP backward kernels); compile wall
time is reported separately (Mosaic compiles are slow on this backend).
``fgeval`` (e.g. f32_fgeval) enables train.fused_gcn_eval instead: the
hybrid split — fused eval kernel only in d_step's no-grad fake generation
and eval, XLA backward in g_step.  ``rolled`` adds rolled-head kernels.
``rematdots`` / ``rematfull`` set train.remat (g_step loss-forward
rematerialization — a bandwidth-for-FLOPs trade on the memory-bound step).
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def run_variant(name: str) -> dict:
    import jax
    name, _, bs = name.partition('@')
    batch = int(bs) if bs else 128
    if name.endswith('_rbg'):
        jax.config.update('jax_default_prng_impl', 'rbg')
    else:
        jax.config.update('jax_default_prng_impl', 'threefry2x32')
    import jax.numpy as jnp
    from a2m.config import (DiscriminatorConfig, GeneratorConfig,
                            TrainConfig)
    from a2m.models import Discriminator, Generator
    from a2m.train.train_step import init_states, make_train_steps
    from a2m.utils import mfu as mfu_lib

    dtype_s = 'bf16' if name.startswith('bf16') else 'f32'
    dt = jnp.bfloat16 if dtype_s == 'bf16' else jnp.float32
    drop = 0.0 if 'nodrop' in name else None
    g_kwargs = {'dropout': drop} if drop is not None else {}
    # fused_gcn_eval now defaults to auto-ON on the TPU; pin it OFF for the
    # base variants so the ablation contrast stays meaningful
    train_kwargs = {'fused_gcn_eval': False}
    if 'fgeval' in name:            # hybrid: fused eval kernel only in the
        train_kwargs['fused_gcn_eval'] = True   # gradient-free G forwards
    elif 'fused' in name:
        g_kwargs['fused_gcn'] = True
    if 'rolled' in name:            # e.g. f32_fused_rolled — rolled-head
        g_kwargs['fused_rolled'] = True   # kernels (faster Mosaic compile)
    if 'rematdots' in name:
        train_kwargs['remat'] = 'dots'
    elif 'rematfull' in name:
        train_kwargs['remat'] = 'full'
    g_cfg = GeneratorConfig(**g_kwargs)
    d_cfg = DiscriminatorConfig(
        **({'dropout': drop} if drop is not None else {}))
    g_model = Generator(g_cfg, dtype=dt)
    d_model = Discriminator(d_cfg, dtype=dt)
    gs, ds = init_states(g_model, d_model, jax.random.PRNGKey(0),
                         batch_size=batch)
    g_step, d_step, _ = make_train_steps(g_model, d_model,
                                         TrainConfig(**train_kwargs),
                                         donate='donate' in name)
    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.standard_normal((batch, 64, 128)), jnp.float32)
    pose = jnp.asarray(rng.standard_normal((batch, 64, 104)) * 10 + 300,
                       jnp.float32)
    mean, std = jnp.zeros(104), jnp.ones(104)
    key = jax.random.PRNGKey(1)

    # block_until_ready does NOT synchronize on the axon tunnel backend —
    # only a d2h transfer (float()) does.  Thread states through the loop
    # (true data dependency) and sync via float() on the final metric:
    # wall / n == sustained per-step time, the number training achieves.
    compile_wall = {}
    # donated variants invalidate input buffers — give each timing loop its
    # own deep copies so gs/ds stay valid for the other loop
    fresh = ((lambda s: jax.tree.map(jnp.array, s)) if 'donate' in name
             else (lambda s: s))

    def timed_g(n=30):
        g0, d0 = fresh(gs), fresh(ds)
        t_c = time.perf_counter()
        g, nd, gm = g_step(g0, d0, audio, pose, mean, std, 0.93, 0.01, key)
        float(gm['g_loss'])              # compile + drain
        compile_wall['g_s'] = round(time.perf_counter() - t_c, 1)
        t0 = time.perf_counter()
        for _ in range(n):
            g, nd, gm = g_step(g, d0, audio, pose, mean, std, 0.93, 0.01,
                               key)
        float(gm['g_loss'])
        return (time.perf_counter() - t0) / n

    def timed_d(n=30):
        g0, d0 = fresh(gs), fresh(ds)
        d, g2, dm = d_step(g0, d0, audio, pose, mean, std, 0.93, 0.07, 0.01,
                           key)
        float(dm['d_loss'])
        t0 = time.perf_counter()
        for _ in range(n):
            d, g2, dm = d_step(g0, d, audio, pose, mean, std, 0.93, 0.07,
                               0.01, key)
        float(dm['d_loss'])
        return (time.perf_counter() - t0) / n

    g_s = timed_g()
    d_s = timed_d()
    g_fl = mfu_lib.compiled_flops(g_step, fresh(gs), fresh(ds), audio, pose,
                                  mean, std, 0.93, 0.01, key)
    return dict(variant=name, batch=batch, compile_wall_s=compile_wall,
                g_ms=round(g_s * 1e3, 1), d_ms=round(d_s * 1e3, 1),
                g_tflop=round((g_fl or 0) / 1e12, 2),
                g_mfu_pct=round(100 * mfu_lib.mfu(g_fl or 0, g_s, dtype_s),
                                1),
                samples_per_s=round(batch / (g_s + d_s)))


if __name__ == '__main__':
    variants = sys.argv[1:] or ['f32']
    for v in variants:
        print(json.dumps(run_variant(v)), flush=True)
