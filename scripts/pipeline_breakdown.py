"""Split the end-to-end bench pipeline into frontend vs generator time.

Times three jitted functions at bench.BATCH on the real TPU, carry-chained
with a d2h sync (verify-skill timing rules):
  frontend : waveform -> log-mel window rows -> strided (B, 64, 128)
  model    : (B, 64, 128) -> pose, XLA GCN path
  model_f  : (B, 64, 128) -> pose, fused rolled GCN kernels [+tile]

Usage: python scripts/pipeline_breakdown.py [batch] [tile]
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def _time(fn, *args, iters=30):
    import jax.numpy as jnp
    carry = jnp.float32(0.0)
    out, carry = fn(*args, carry)
    float(carry)
    t0 = time.perf_counter()
    for _ in range(iters):
        out, carry = fn(*args, carry)
    float(carry)
    return (time.perf_counter() - t0) / iters * 1e3


def main(batch: int, tile) -> None:
    import jax
    import jax.numpy as jnp

    from a2m.audio import frontend
    from a2m.config import GeneratorConfig
    from a2m.constants import AUDIO_FS_MAP, FRAMES_PER_WINDOW
    from a2m.models import Generator

    sr, clip = 45600, 4.3
    spec = frontend.spec_log_mel_512(sr)
    fs = AUDIO_FS_MAP['log_mel_512']
    window, stride = int(clip * fs), round(fs / 15)

    rng = np.random.default_rng(0)
    wave = jax.device_put((rng.standard_normal(
        (batch, int(sr * clip))) * 0.1).astype(np.float32))

    spec6 = frontend.strided_spec(spec, stride)

    @jax.jit
    def front(w, carry):
        feats = frontend.log_mel(w + carry * 0, spec6, exact=False,
                                 n_frames=FRAMES_PER_WINDOW)
        return feats, carry + feats.mean()

    feats0 = jnp.zeros((batch, FRAMES_PER_WINDOW, 128), jnp.float32)
    feats0 = front(wave, jnp.float32(0.0))[0]

    def model_fn(fused):
        m = Generator(GeneratorConfig(fused_gcn=fused, fused_rolled=fused,
                                      fused_tile=tile if fused else None))
        v = jax.jit(m.init)({'params': jax.random.PRNGKey(0),
                             'dropout': jax.random.PRNGKey(0)}, feats0)

        @jax.jit
        def run(f, carry):
            pose = m.apply(v, f + carry * 0, train=False)
            return pose, carry + pose.mean()
        return run

    print(json.dumps({'stage': 'frontend', 'batch': batch,
                      'ms': round(_time(front, wave), 2)}), flush=True)
    print(json.dumps({'stage': 'model_xla', 'batch': batch,
                      'ms': round(_time(model_fn(False), feats0), 2)}),
          flush=True)
    print(json.dumps({'stage': 'model_fused_rolled', 'batch': batch,
                      'tile': tile,
                      'ms': round(_time(model_fn(True), feats0), 2)}),
          flush=True)


if __name__ == '__main__':
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 128,
         int(sys.argv[2]) if len(sys.argv) > 2 else None)
