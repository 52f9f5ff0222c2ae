"""End-to-end evaluation harness: full-speaker inference + PCK/L2 (+video).

The reference defines PCK but never invokes it (SURVEY.md §4 item 3); this
harness is the missing piece: run the generator over a speaker's test split,
compute PCK@alpha and L2 against ground truth in the denormalized pose
space, and optionally render a sample video (BASELINE.json config #5).

Usage:
    python -m a2m.eval.harness --path2data ./pats/data --speaker oliver \
        --ckpt ./save/multi_speaker/ckpt
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np

from a2m.config import Config
from a2m.data import (DataLoader, denormalize_pose, get_mean_std_necksub,
                      neck_subtract)
from a2m.eval.metrics import compute_pck, l2_pose_error


def evaluate_speaker(path2data, speaker: str, ckpt_dir=None,
                     batch_size: int = 128, alpha=0.2,
                     cfg: Config | None = None, max_batches=None,
                     render_sample_to=None) -> dict:
    """``alpha`` may be a float or a sequence of floats; every alpha is
    evaluated in the same inference pass (``pck`` reports the first,
    ``pck_by_alpha`` all of them)."""
    from a2m.models import Generator

    cfg = cfg or Config()
    dl = DataLoader(path2data=path2data, speaker=[speaker],
                    modalities=['pose/data', 'audio/log_mel_512'],
                    fs_new=[15, 15], batch_size=batch_size, window_hop=5,
                    shuffle=False)

    generator = Generator(cfg.generator)
    key = jax.random.PRNGKey(0)
    variables = jax.jit(generator.init)(
        {'params': key, 'dropout': key},
        jnp.zeros((1, cfg.generator.time_steps, 128), jnp.float32))
    mean = std = None
    if ckpt_dir is not None:
        from a2m.train.checkpoint import load_any_generator_ckpt
        from a2m.train.train_step import NetState
        best = load_any_generator_ckpt(ckpt_dir, NetState(
            variables['params'], variables.get('batch_stats', {}), None))
        if best is not None:
            variables = {'params': best['params'],
                         'batch_stats': best['batch_stats']}
            # denormalize with the stats the model was TRAINED with when the
            # checkpoint carries them (save_best_generator ships mean/std):
            # recomputing from this loader's train split gives WRONG stats
            # whenever eval data differs from training data — e.g. a
            # multi-speaker checkpoint evaluated per-speaker (the
            # reference's generate_motion_video.py:240-243 has that flaw)
            if 'mean' in best:
                mean, std = best['mean'], best['std']
    if mean is None:
        mean, std = get_mean_std_necksub(dl.train)
    mean_j, std_j = jnp.asarray(mean), jnp.asarray(std)

    @jax.jit
    def infer(audio):
        pose_norm = generator.apply(variables, audio, train=False)
        return denormalize_pose(pose_norm, mean_j, std_j)

    alphas = ((alpha,) if isinstance(alpha, (int, float))
              else tuple(alpha))
    pcks: dict = {a: [] for a in alphas}
    l2s, n_clips = [], 0
    for i, batch in enumerate(dl.test):
        if max_batches is not None and i >= max_batches:
            break
        audio = jnp.asarray(batch['audio/log_mel_512'])
        gen = np.asarray(infer(audio))
        real = neck_subtract(batch['pose/data'])
        m = batch['mask'] > 0
        gen, real = gen[m], real[m]
        # (N, T, 104) -> (N*T, 2, 52) keypoint frames
        gk = jnp.asarray(gen.reshape(-1, 2, 52))
        rk = jnp.asarray(real.reshape(-1, 2, 52))
        for a in alphas:
            pcks[a].append(np.asarray(compute_pck(gk, rk, alpha=a)))
        l2s.append(float(l2_pose_error(gk, rk)))
        n_clips += int(m.sum())

    by_alpha = {a: (float(np.concatenate(v).mean()) if v else None)
                for a, v in pcks.items()}
    result = dict(speaker=speaker,
                  n_clips=n_clips,
                  pck=by_alpha[alphas[0]],
                  pck_alpha=alphas[0],
                  pck_by_alpha={str(a): v for a, v in by_alpha.items()},
                  l2=float(np.mean(l2s)) if l2s else None)
    if render_sample_to is not None and n_clips:
        from a2m.viz.generate_video import run as render_run
        vid = render_run(path2data, speaker, ckpt_dir, render_sample_to,
                         batch_size=batch_size, cfg=cfg)
        result['video'] = vid['video']
    return result


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument('--path2data', default='./pats/data')
    ap.add_argument('--speaker', default='oliver')
    ap.add_argument('--ckpt', default=None)
    ap.add_argument('--batch_size', type=int, default=128)
    ap.add_argument('--alpha', type=float, default=0.2)
    ap.add_argument('--render_to', default=None)
    args = ap.parse_args()
    print(json.dumps(evaluate_speaker(
        args.path2data, args.speaker, args.ckpt, args.batch_size,
        args.alpha, render_sample_to=args.render_to)))


if __name__ == '__main__':
    main()
