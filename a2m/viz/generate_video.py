"""Inference CLI: checkpoint -> generated poses -> side-by-side video.

Capability parity with `generate_motion_video.py:220-290`: load a generator
checkpoint, take the first test batch, neck-sub-normalize ground truth,
generate poses from audio on TPU, denormalize, apply the display transform,
render prediction/ground-truth side-by-side video (+ optional audio mux).

Usage:
    python -m a2m.viz.generate_video --path2data ./pats/data \
        --speaker oliver --ckpt ./save/multi_speaker/ckpt --out ./videos
"""

from __future__ import annotations

import argparse
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from a2m.config import Config
from a2m.data import DataLoader, get_mean_std_necksub, neck_subtract
from a2m.eval import compute_pck_np, pose_blocks_to_keypoints
from a2m.models import Generator
from a2m.viz import render


def generate_poses(generator: Generator, variables, audio: np.ndarray,
                   mean: np.ndarray, std: np.ndarray) -> np.ndarray:
    """G(audio), denormalized (generate_motion_video.py:257-260)."""
    apply = jax.jit(lambda v, a: generator.apply(v, a, train=False))
    pose_norm = apply(variables, jnp.asarray(audio))
    return np.asarray(pose_norm) * std + mean


def run(path2data, speaker: str, ckpt_dir, out_dir, sample_idx: int = 1,
        batch_size: int = 256, cfg: Config | None = None,
        audio_path: str | None = None) -> dict:
    cfg = cfg or Config()
    dl = DataLoader(path2data=path2data, speaker=[speaker],
                    modalities=['pose/data', 'audio/log_mel_512'],
                    fs_new=[15, 15], batch_size=batch_size, window_hop=5)
    batch = next(iter(dl.test))

    generator = Generator(cfg.generator)
    key = jax.random.PRNGKey(0)
    dummy = jnp.zeros((1, 64, 128), jnp.float32)
    variables = jax.jit(generator.init)({'params': key, 'dropout': key}, dummy)
    mean = std = None
    if ckpt_dir is not None:
        from a2m.train.checkpoint import load_any_generator_ckpt
        from a2m.train.train_step import NetState
        state = NetState(variables['params'],
                         variables.get('batch_stats', {}), None)
        best = load_any_generator_ckpt(ckpt_dir, state)
        if best is not None:
            variables = {'params': best['params'],
                         'batch_stats': best['batch_stats']}
            # prefer the training-time stats shipped with the checkpoint
            # (the reference recomputes from whatever loader it builds —
            # generate_motion_video.py:240-243 — wrong for multi-speaker
            # checkpoints evaluated per-speaker)
            if 'mean' in best:
                mean, std = best['mean'], best['std']
    if mean is None:
        mean, std = get_mean_std_necksub(dl.train)

    audio = batch['audio/log_mel_512']
    real = neck_subtract(batch['pose/data'])
    gen = generate_poses(generator, variables, audio, mean, std)

    rp = pose_blocks_to_keypoints(real)[sample_idx]     # (T, 2, 52)
    gp = pose_blocks_to_keypoints(gen)[sample_idx]

    # display transform (generate_motion_video.py:280-284): 3x scale, y-flip;
    # GT shifted right for the side-by-side canvas
    gp_disp = -render.display_transform(gp, scale=3.0)
    rp_disp = -render.display_transform(rp, scale=3.0, offset=(-1500.0, 0.0))

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    video_fn = str(out_dir / f'{speaker}_sample{sample_idx}.mp4')
    render.save_side_by_side_video(str(out_dir / 'tmp_frames'), gp_disp,
                                   rp_disp, video_fn, delete_tmp=True)
    if audio_path and render.have_ffmpeg():
        render.save_video_from_audio_video(
            audio_path, video_fn, str(out_dir / f'{speaker}_with_audio.mp4'))

    pck = compute_pck_np(_flatten_bt(gen), _flatten_bt(real))
    return dict(video=video_fn, pck_mean=float(pck.mean()))


def _flatten_bt(pose: np.ndarray) -> np.ndarray:
    """(B, T, 104) -> (B*T, 2, 52) keypoints for PCK."""
    kp = pose_blocks_to_keypoints(pose)
    return kp.reshape(-1, 2, 52)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument('--path2data', default='./pats/data')
    ap.add_argument('--speaker', default='oliver')
    ap.add_argument('--ckpt', default=None)
    ap.add_argument('--out', default='./videos')
    ap.add_argument('--sample', type=int, default=1)
    ap.add_argument('--batch_size', type=int, default=256)
    ap.add_argument('--audio', default=None,
                    help='optional wav to mux into the video')
    args = ap.parse_args()
    result = run(args.path2data, args.speaker, args.ckpt, args.out,
                 sample_idx=args.sample, batch_size=args.batch_size,
                 audio_path=args.audio)
    print(result)


if __name__ == '__main__':
    main()
