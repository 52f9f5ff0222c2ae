"""End-to-end benchmark: raw audio -> log-mel -> generator -> pose, on TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: realtime factor (audio-seconds processed per wall-clock second per
chip) for the full audio->pose pipeline (BASELINE.json config #1/#2).  The
reference publishes no numbers (BASELINE.md); vs_baseline is the ratio to
the driver's north-star target of 100x realtime per chip.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

TARGET_RT = 100.0  # BASELINE.json north star: >=100x realtime per chip
SR = 45600         # nominal PATS sample rate (audio.py:177)
CLIP_SECONDS = 4.3
BATCH = 64


def build_pipeline():
    from a2m.audio import frontend
    from a2m.constants import AUDIO_FS_MAP, FRAMES_PER_WINDOW
    from a2m.models import Generator

    spec = frontend.spec_log_mel_512(SR)
    model = Generator()
    key = jax.random.PRNGKey(0)
    dummy_feats = jnp.zeros((BATCH, FRAMES_PER_WINDOW, 128), jnp.float32)
    variables = jax.jit(model.init)({'params': key, 'dropout': key}, dummy_feats)

    fs = AUDIO_FS_MAP['log_mel_512']
    window = int(CLIP_SECONDS * fs)       # 382 feature rows
    stride = round(fs / 15)               # 6 -> 64 frames

    @jax.jit
    def audio_to_pose(waveform):
        feats = frontend.log_mel(waveform, spec, exact=False)
        feats = feats[:, :window:stride, :]          # (B, 64, 128)
        return model.apply(variables, feats, train=False)

    return audio_to_pose


def main() -> None:
    rng = np.random.default_rng(0)
    wave = (rng.standard_normal((BATCH, int(SR * CLIP_SECONDS)))
            * 0.1).astype(np.float32)
    wave = jax.device_put(wave)

    pipeline = build_pipeline()
    out = pipeline(wave)
    out.block_until_ready()   # compile + warm

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        out = pipeline(wave)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / iters

    audio_seconds = BATCH * CLIP_SECONDS
    rt_factor = audio_seconds / dt

    # p50 single-clip latency (secondary, recorded in the same line's unit
    # field context; the driver contract wants exactly one JSON line)
    single = jax.device_put(wave[:1])
    pipe1 = build_pipeline_single()
    _ = pipe1(single).block_until_ready()
    lats = []
    for _ in range(20):
        t0 = time.perf_counter()
        pipe1(single).block_until_ready()
        lats.append(time.perf_counter() - t0)
    p50_ms = float(np.median(lats) * 1e3)

    print(json.dumps({
        'metric': 'audio_to_pose_realtime_factor',
        'value': round(rt_factor, 1),
        'unit': f'audio-sec/sec/chip (p50 clip latency {p50_ms:.2f} ms)',
        'vs_baseline': round(rt_factor / TARGET_RT, 2),
    }))


def build_pipeline_single():
    from a2m.audio import frontend
    from a2m.constants import AUDIO_FS_MAP
    from a2m.models import Generator

    spec = frontend.spec_log_mel_512(SR)
    model = Generator()
    key = jax.random.PRNGKey(0)
    dummy = jnp.zeros((1, 64, 128), jnp.float32)
    variables = jax.jit(model.init)({'params': key, 'dropout': key}, dummy)
    fs = AUDIO_FS_MAP['log_mel_512']
    window, stride = int(CLIP_SECONDS * fs), round(fs / 15)

    @jax.jit
    def one(waveform):
        feats = frontend.log_mel(waveform, spec, exact=False)
        feats = feats[:, :window:stride, :]
        return model.apply(variables, feats, train=False)

    return one


if __name__ == '__main__':
    main()
