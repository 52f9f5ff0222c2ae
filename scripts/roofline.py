"""Roofline accounting for the full-size train steps (VERDICT r2 weak #4).

Quantifies FLOPs vs bytes-moved for g_step/d_step at B=128 and derives the
achievable time floors on TPU v5e:

* FLOPs: exact, from the traced jaxpr (backend-independent,
  `a2m/utils/mfu.py` — the axon backend's cost_analysis returns nothing).
* Bytes: XLA 'bytes accessed' of the CPU-compiled step — a fusion-aware
  HLO-level proxy for HBM traffic (XLA:CPU and XLA:TPU fuse the same
  elementwise chains; TPU layouts differ, so treat as +-20%).
* Floors: t_bw = bytes / 819 GB/s (v5e HBM), t_mxu = flops / peak
  (197 TFLOP/s bf16, ~49 TFLOP/s f32-via-MXU-passes).

The verdict of this analysis goes in README/BENCHMARKS: if t_bw >> t_mxu,
the step is bandwidth-bound and bf16 compute cannot help (it halves MXU
time, not bytes — activations stay f32 unless the whole graph re-lands in
bf16); that is the measured bf16 anomaly (101.8 ms bf16 vs 96.5 ms f32).

Usage: JAX_PLATFORMS=cpu python scripts/roofline.py [batch]
"""

from __future__ import annotations

import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

V5E_HBM_GBS = 819.0
V5E_PEAK = {'bf16': 197e12, 'f32': 49.2e12}


def main(batch: int = 128) -> None:
    import jax
    jax.config.update('jax_platforms', 'cpu')
    import jax.numpy as jnp
    import numpy as np
    from a2m.config import TrainConfig
    from a2m.models import Discriminator, Generator
    from a2m.train.train_step import init_states, make_train_steps
    from a2m.utils import mfu as mfu_lib

    g_model, d_model = Generator(), Discriminator()
    gs, ds = init_states(g_model, d_model, jax.random.PRNGKey(0),
                         batch_size=batch)
    g_step, d_step, _ = make_train_steps(g_model, d_model, TrainConfig(),
                                         donate=False)
    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.standard_normal((batch, 64, 128)), jnp.float32)
    pose = jnp.asarray(rng.standard_normal((batch, 64, 104)) * 10 + 300,
                       jnp.float32)
    mean, std = jnp.zeros(104), jnp.ones(104)
    key = jax.random.PRNGKey(1)

    rows = []
    for name, fn, args in (
            ('g_step', g_step, (gs, ds, audio, pose, mean, std, 0.93, 0.01,
                                key)),
            ('d_step', d_step, (gs, ds, audio, pose, mean, std, 0.93, 0.07,
                                0.01, key))):
        flops = mfu_lib.compiled_flops(fn, *args) or 0
        cost = fn.lower(*args).compile().cost_analysis()
        cost = cost if isinstance(cost, dict) else cost[0]
        gbytes = float(cost.get('bytes accessed', 0.0)) / 1e9
        t_bw_ms = gbytes / V5E_HBM_GBS * 1e3
        row = dict(step=name, batch=batch,
                   tflop=round(flops / 1e12, 3),
                   hlo_gbytes=round(gbytes, 2),
                   arith_intensity=round(flops / max(gbytes * 1e9, 1), 1),
                   t_bw_floor_ms=round(t_bw_ms, 1),
                   t_mxu_floor_f32_ms=round(flops / V5E_PEAK['f32'] * 1e3,
                                            1),
                   t_mxu_floor_bf16_ms=round(flops / V5E_PEAK['bf16'] * 1e3,
                                             1))
        rows.append(row)
        print(json.dumps(row), flush=True)


if __name__ == '__main__':
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 128)
