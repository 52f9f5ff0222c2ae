"""Serialized inference artifacts via ``jax.export`` (StableHLO).

The reference has no deployment story — serving means re-running its
training script's Python stack (`generate_motion_video.py`).  Here the
trained generator exports to a **self-contained StableHLO artifact**:
weights and normalization statistics are baked in as constants, so the
artifact is loadable with ``jax.export.deserialize`` alone (no a2m import,
no checkpoint directory, no model code) and callable on any machine with
the target platform — the TPU-native equivalent of a frozen graph.

Two artifact flavors:

* ``export_pose_fn``   — (B, T, 128) log-mel features -> (B, T, 104)
  denormalized block-layout poses (the serving hot path; pair it with any
  frontend).
* ``export_audio_to_pose`` — raw (B, N) waveform -> poses, with the MXU
  windowed-DFT log-mel frontend fused into the same module.

CLI::

    python -m a2m.export --ckpt ./save/multi_speaker/ckpt \
        --path2data ./pats/data --out ./artifacts/a2m_pose.shlo --check
"""

from __future__ import annotations

import argparse
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jexport

from a2m.config import Config

#: artifact calling convention version (stored next to the blob)
FORMAT = 'a2m-stablehlo-v1'


def _denorm(pose, mean, std):
    return pose * std + mean


def export_pose_fn(generator, variables, mean, std, batch_size: int = 1,
                   time_steps: int = 64, in_feats: int = 128):
    """Export features->poses with weights + stats baked in.

    Returns a :class:`jax.export.Exported`; ``.serialize()`` gives the
    portable bytes.  The generator runs in eval mode (train=False), output
    is denormalized to absolute block-layout keypoints.
    """
    variables = jax.tree.map(jnp.asarray, variables)
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)

    def serve(feats):
        pose = generator.apply(variables, feats, train=False)
        return _denorm(pose, mean, std)

    spec = jax.ShapeDtypeStruct((batch_size, time_steps, in_feats),
                                jnp.float32)
    return jexport.export(jax.jit(serve))(spec)


def export_audio_to_pose(generator, variables, mean, std, sr: int = 45600,
                         seconds: float = 4.3, batch_size: int = 1):
    """Export waveform->poses with the log-mel frontend fused in."""
    from a2m.audio import frontend
    from a2m.constants import AUDIO_FS_MAP

    variables = jax.tree.map(jnp.asarray, variables)
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)
    spec_mel = frontend.spec_log_mel_512(sr)
    fs = AUDIO_FS_MAP['log_mel_512']
    window, stride = int(seconds * fs), round(fs / 15)
    # stride folded into the hop (frontend.strided_spec): compute only the
    # pose-rate frames — identical to slicing [:window:stride]
    spec_strided = frontend.strided_spec(spec_mel, stride)
    n_out = len(range(0, window, stride))

    def serve(waveform):
        feats = frontend.log_mel(waveform, spec_strided, exact=False,
                                 n_frames=n_out)
        pose = generator.apply(variables, feats, train=False)
        return _denorm(pose, mean, std)

    n = int(sr * seconds)
    spec = jax.ShapeDtypeStruct((batch_size, n), jnp.float32)
    return jexport.export(jax.jit(serve))(spec)


def save_artifact(exported, path) -> Path:
    """Serialize an Exported to ``path`` (+ a small sidecar header)."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_bytes(exported.serialize())
    meta = (f'{FORMAT}\nplatforms={",".join(exported.platforms)}\n'
            f'in={exported.in_avals}\nout={exported.out_avals}\n')
    path.with_suffix(path.suffix + '.meta').write_text(meta)
    return path


def load_artifact(path):
    """Deserialize an artifact; returns a callable (pure XLA, no a2m)."""
    exported = jexport.deserialize(Path(path).read_bytes())
    return exported.call


def _build_from_checkpoint(ckpt_dir, path2data, speakers, cfg: Config):
    """(generator, variables, mean, std) from a checkpoint + data stats."""
    from a2m.data import DataLoader, get_mean_std_necksub
    from a2m.models import Generator
    from a2m.train.checkpoint import load_any_generator_ckpt
    from a2m.train.train_step import NetState

    generator = Generator(cfg.generator)
    key = jax.random.PRNGKey(0)
    dummy = jnp.zeros((1, 64, 128), jnp.float32)
    variables = jax.jit(generator.init)({'params': key, 'dropout': key},
                                        dummy)
    mean = std = None
    if ckpt_dir is not None:
        state = NetState(variables['params'],
                         variables.get('batch_stats', {}), None)
        best = load_any_generator_ckpt(ckpt_dir, state)
        if best is not None:
            variables = {'params': best['params'],
                         'batch_stats': best['batch_stats']}
            # stats shipped with the checkpoint define the model's output
            # space — bake those, not whatever the eval loader would derive
            if 'mean' in best:
                mean, std = best['mean'], best['std']
    if mean is None:
        if path2data is not None:
            dl = DataLoader(path2data=path2data, speaker=list(speakers),
                            modalities=['pose/data', 'audio/log_mel_512'],
                            fs_new=[15, 15], batch_size=64, window_hop=5)
            mean, std = get_mean_std_necksub(dl.train)
        else:
            mean, std = np.zeros(104, np.float32), np.ones(104, np.float32)
    return generator, variables, mean, std


def main(argv=None) -> dict:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument('--ckpt', default=None)
    ap.add_argument('--path2data', default=None,
                    help='PATS tree for normalization stats (else identity)')
    ap.add_argument('--speaker', nargs='+', default=['oliver'])
    ap.add_argument('--out', default='./artifacts/a2m_pose.shlo')
    ap.add_argument('--batch_size', type=int, default=1)
    ap.add_argument('--flavor', choices=['pose', 'audio'], default='pose')
    ap.add_argument('--check', action='store_true',
                    help='deserialize + run the artifact on zeros')
    args = ap.parse_args(argv)

    cfg = Config()
    generator, variables, mean, std = _build_from_checkpoint(
        args.ckpt, args.path2data, args.speaker, cfg)
    if args.flavor == 'pose':
        exported = export_pose_fn(generator, variables, mean, std,
                                  batch_size=args.batch_size)
    else:
        exported = export_audio_to_pose(generator, variables, mean, std,
                                        batch_size=args.batch_size)
    path = save_artifact(exported, args.out)
    size = path.stat().st_size
    print(f'{FORMAT}: {path} ({size / 1e6:.1f} MB, '
          f'platforms {exported.platforms})')
    if args.check:
        fn = load_artifact(path)
        shape = exported.in_avals[0].shape
        out = np.asarray(fn(jnp.zeros(shape, jnp.float32)))
        assert np.isfinite(out).all(), 'artifact produced non-finite output'
        print(f'check OK: {shape} -> {out.shape}')
    return dict(path=str(path), bytes=size)


if __name__ == '__main__':
    main()
