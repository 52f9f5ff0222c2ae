"""Post-campaign PCK/L2: untrained init vs best-G vs FINAL-epoch G.

The campaign saves Best_Gen by lowest total val_g (reference semantics,
`version5_model_train.py:501-516`) — but total val_g includes the
adversarial term, whose scale drifts as the dynamic controller anneals
the D lr down and skips D training, so the "best" checkpoint can predate
most of the reconstruction learning.  This script additionally evaluates
the FINAL full checkpoint's generator, which carries the fully-converged
reconstruction losses.

Usage: python scripts/campaign_post_eval.py [det|env|<mode>_<tag>]
Writes <save>/post_eval.json and prints one JSON line per model.
"""

from __future__ import annotations

import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main(mode: str = 'det') -> None:
    import jax

    from a2m.config import Config
    from a2m.eval.harness import evaluate_speaker
    from a2m.models import Discriminator, Generator
    from a2m.train.checkpoint import CheckpointManager
    from a2m.train.train_step import init_states

    root = pathlib.Path(f'/tmp/a2m_campaign_{mode}')
    save = root / 'save'
    data = pathlib.Path(f'/tmp/a2m_data_{mode.split("_")[0]}')
    if not data.exists():                       # pre-tag layout
        data = root / 'data'
    cfg = Config()

    # materialize the final epoch's G as a standalone best_gen-format
    # checkpoint so evaluate_speaker can load it through its public path
    g_model = Generator(cfg.generator)
    d_model = Discriminator(cfg.discriminator)
    gs, ds = init_states(g_model, d_model, jax.random.PRNGKey(0),
                         batch_size=2)
    mgr = CheckpointManager(save / 'ckpt')
    restored = mgr.restore(gs, ds)
    assert restored is not None, 'no campaign checkpoint found'
    final_dir = save / 'ckpt_final'
    CheckpointManager(final_dir).save_best_generator(restored['g_state'])
    print(f'final checkpoint epoch: {restored["epoch"]}', flush=True)

    # calibration: the mean-pose predictor (train-set neck-sub mean for
    # every frame) — the bar a model must beat to demonstrate actual
    # audio->pose learning on position metrics
    import numpy as np
    from a2m.data import DataLoader, get_mean_std_necksub, neck_subtract
    from a2m.eval.metrics import compute_pck
    dl = DataLoader(path2data=str(data), speaker=['oliver'],
                    modalities=['pose/data', 'audio/log_mel_512'],
                    fs_new=[15, 15], batch_size=128, window_hop=5,
                    shuffle=False)
    mean, _ = get_mean_std_necksub(dl.train)
    mp = {str(a): [] for a in (0.2, 0.1)}
    for b in dl.test:
        real = neck_subtract(b['pose/data'])[b['mask'] > 0]
        rk = real.reshape(-1, 2, 52)
        gk = np.broadcast_to(mean.reshape(1, 2, 52), rk.shape)
        for a in (0.2, 0.1):
            mp[str(a)].append(np.asarray(compute_pck(gk, rk, alpha=a)))
    out = {'final_epoch': restored['epoch'],
           'mean_pose': {'pck_by_alpha': {k: float(np.concatenate(v).mean())
                                          for k, v in mp.items()}}}
    print(json.dumps({'mean_pose': out['mean_pose']}), flush=True)
    for name, ck in (('untrained', None),
                     ('best_val_g', save / 'ckpt'),
                     ('final_epoch', final_dir)):
        r = evaluate_speaker(str(data), 'oliver',
                             ckpt_dir=str(ck) if ck else None,
                             batch_size=128, alpha=(0.2, 0.1))
        out[name] = dict(pck_by_alpha=r['pck_by_alpha'], l2=r['l2'],
                         n_clips=r['n_clips'])
        print(json.dumps({name: out[name]}), flush=True)
    (save / 'post_eval.json').write_text(json.dumps(out))


if __name__ == '__main__':
    main(sys.argv[1] if len(sys.argv) > 1 else 'det')
