"""A/B the end-to-end audio->pose pipeline on the real TPU.

Variants: frontend (XLA windowed-DFT vs fused Pallas) x model compute dtype
(f32 vs bf16).  Carry-chained timing with a d2h sync (see
.claude/skills/verify/SKILL.md timing gotchas).  Prints one JSON line per
variant; used for the README A/B table (VERDICT r1 #3).

Usage: python scripts/pipeline_ab.py [xla_f32 pallas_f32 xla_bf16 pallas_bf16]
Each variant takes an optional @<batch> suffix (e.g. xla_f32@256); add
``_fusedgcn`` to route the generator's GCN stacks through the fused Pallas
kernel (e.g. xla_f32_fusedgcn@128 — expect a ~25 min first compile), and
``_rolled`` on top for the rolled-head kernels (much faster compile).
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import bench  # noqa: E402  (repo-root bench provides the pipeline builder)


def run_variant(name: str) -> dict:
    import jax
    import jax.numpy as jnp

    name, _, bs = name.partition('@')
    if bs:
        bench.BATCH = int(bs)
    use_pallas = name.startswith('pallas')
    dtype = jnp.bfloat16 if 'bf16' in name else jnp.float32
    tile = None                       # ``_tile<k>`` token, e.g. _tile32
    for tok in name.split('_'):
        if tok.startswith('tile') and tok[4:].isdigit():
            tile = int(tok[4:])
    pipeline = bench.build_pipeline(use_pallas=use_pallas, dtype=dtype,
                                    fused_gcn='fusedgcn' in name,
                                    fused_rolled='rolled' in name,
                                    fused_tile=tile,
                                    fused_edge='edge' in name)

    rng = np.random.default_rng(0)
    wave = jax.device_put(
        (rng.standard_normal((bench.BATCH, int(bench.SR * bench.CLIP_SECONDS)))
         * 0.1).astype(np.float32))
    carry = jnp.float32(0.0)
    out, carry = pipeline(wave, carry)
    float(carry)                               # compile + warm + sync

    iters = 30
    t0 = time.perf_counter()
    for _ in range(iters):
        out, carry = pipeline(wave, carry)
    float(carry)
    dt = (time.perf_counter() - t0) / iters
    audio_seconds = bench.BATCH * bench.CLIP_SECONDS
    return dict(variant=name, batch=bench.BATCH, ms=round(dt * 1e3, 2),
                realtime_factor=round(audio_seconds / dt, 1))


if __name__ == '__main__':
    variants = sys.argv[1:] or ['xla_f32', 'pallas_f32', 'xla_bf16',
                                'pallas_bf16']
    for v in variants:
        print(json.dumps(run_variant(v)), flush=True)
