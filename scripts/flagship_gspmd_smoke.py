"""Flagship-shape GSPMD compile smoke (VERDICT r4 item 5).

``__graft_entry__.dryrun_multichip`` proves the sharded GAN step on tiny
configs; shape-dependent sharding surprises (2048-channel TP splits,
B=128 batch shards) would only surface at production size.  This script
compiles AND executes one full g/d/eval step at FLAGSHIP size (default
256-ch generator config, global batch 128) on an 8-virtual-device CPU
mesh, for dp-only (8x1) and dp x tp (4x2), and records wall times to
``artifacts/flagship_gspmd_smoke.json``.

Run: ``python scripts/flagship_gspmd_smoke.py [n_devices]`` (CPU-forced;
budget ~10-40 min of CPU compile cold, seconds warm via the persistent
test cache).
"""

from __future__ import annotations

import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 8
os.environ['XLA_FLAGS'] = (os.environ.get('XLA_FLAGS', '')
                           + f' --xla_force_host_platform_device_count={N}'
                           ).strip()

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_compilation_cache_dir',
                  os.environ.get('A2M_TEST_COMPILE_CACHE',
                                 '/tmp/a2m_jax_test_cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 2.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def run_shape(model_axis: int, batch: int = 128) -> dict:
    from a2m.config import MeshConfig, TrainConfig
    from a2m.models import Discriminator, Generator
    from a2m.parallel import (make_mesh, make_sharded_train_steps,
                              param_shardings, replicated, shard_batch)
    from a2m.train.train_step import init_states

    g_model, d_model = Generator(), Discriminator()   # flagship defaults
    t0 = time.perf_counter()
    g0, d0 = init_states(g_model, d_model, jax.random.PRNGKey(0),
                         batch_size=batch)
    init_s = time.perf_counter() - t0

    mesh = make_mesh(MeshConfig(data=N // model_axis, model=model_axis))
    tp = model_axis > 1
    rep = replicated(mesh)

    def place(s):
        return s._replace(
            params=jax.device_put(s.params,
                                  param_shardings(s.params, mesh, tp)),
            batch_stats=jax.device_put(s.batch_stats, rep),
            opt_state=jax.device_put(s.opt_state, rep))

    g_state, d_state = place(g0), place(d0)
    g_step, d_step, eval_step = make_sharded_train_steps(
        g_model, d_model, TrainConfig(donate_buffers=False), mesh,
        tensor_parallel=tp)

    rng = np.random.default_rng(0)
    raw = {
        'audio/log_mel_512': rng.standard_normal(
            (batch, 64, 128)).astype(np.float32),
        'pose/data': (rng.standard_normal(
            (batch, 64, 104)) * 10 + 300).astype(np.float32),
        'mask': np.ones(batch, np.float32),
    }
    sb = shard_batch(raw, mesh)
    mean = jax.device_put(jnp.zeros(104), rep)
    std = jax.device_put(jnp.ones(104), rep)
    key = jax.device_put(jax.random.PRNGKey(1), rep)

    out = dict(mesh=f'{N // model_axis}x{model_axis}', batch=batch,
               init_s=round(init_s, 1))
    with mesh:
        t0 = time.perf_counter()
        new_g, new_d_bs, gm = g_step(g_state, d_state,
                                     sb['audio/log_mel_512'],
                                     sb['pose/data'], mean, std,
                                     jnp.float32(0.93), jnp.float32(0.01),
                                     key, None, sb['mask'])
        g_loss = float(gm['g_loss'])
        out['g_compile_run_s'] = round(time.perf_counter() - t0, 1)
        d_state2 = d_state._replace(batch_stats=new_d_bs)
        t0 = time.perf_counter()
        new_d, new_g2, dm = d_step(new_g, d_state2,
                                   sb['audio/log_mel_512'],
                                   sb['pose/data'], mean, std,
                                   jnp.float32(0.93), jnp.float32(0.07),
                                   jnp.float32(0.01), key, None, sb['mask'])
        d_loss = float(dm['d_loss'])
        out['d_compile_run_s'] = round(time.perf_counter() - t0, 1)
        t0 = time.perf_counter()
        ev = eval_step(new_g2, new_d, sb['audio/log_mel_512'],
                       sb['pose/data'], mean, std, sb['mask'], None)
        val_g = float(ev['val_g'])
        out['eval_compile_run_s'] = round(time.perf_counter() - t0, 1)
    out.update(g_loss=g_loss, d_loss=d_loss, val_g=val_g,
               finite=bool(np.isfinite([g_loss, d_loss, val_g]).all()))
    assert out['finite'], out
    print(json.dumps(out), flush=True)
    return out


def main() -> None:
    results = [run_shape(1), run_shape(2)]
    # dp x tp must agree with dp-only on the deterministic parts of the
    # forward (losses include dropout/noise RNG, identical key -> equal)
    assert abs(results[0]['g_loss'] - results[1]['g_loss']) <= \
        1e-3 * max(1.0, abs(results[0]['g_loss'])), results
    repo = pathlib.Path(__file__).resolve().parent.parent
    (repo / 'artifacts' / 'flagship_gspmd_smoke.json').write_text(
        json.dumps(dict(n_devices=N, runs=results), indent=1) + '\n')
    print('SMOKE ' + json.dumps(dict(n_devices=N, ok=True,
                                     g_loss=results[0]['g_loss'])))


if __name__ == '__main__':
    main()
