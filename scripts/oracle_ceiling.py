"""Oracle PCK ceiling for the deterministic fixture (VERDICT r4 item 4).

The det fixture makes pose an affine function of the mel bands
(``pose = rest + sum_k env_k basis_k`` with ``mel = 4*env - 6 + noise``,
a2m/data/synthetic.py:115-152), so the best achievable PCK is measurable
directly — no GAN required:

* ``generative``: invert the known construction (average each 16-column
  band group, map back through the affine coefficients) — the fixture's
  intrinsic noise floor.
* ``linear``: ridge regression mel-frame -> neck-subtracted pose fit on
  the TRAIN split (all 8 speakers, the exact windows the Trainer sees),
  evaluated on speaker oliver's test split with the harness PCK metric —
  what any model that is at least as expressive as a per-frame linear map
  could reach through the real loader (windowing/drift included).
* ``linear_ctx``: same with +/-2 frames of temporal context.

Writes artifacts/oracle_det_ceiling.json and prints one JSON line.
Run on CPU (numpy only): ``python scripts/oracle_ceiling.py [data_root]``.
"""

from __future__ import annotations

import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402

SPEAKERS = ('oliver', 'noah', 'seth', 'shelly',
            'ellen', 'angelica', 'almaram', 'chemistry')
ALPHAS = (0.2, 0.1)


def _loader(root, speakers, hop=5):
    from a2m.data import DataLoader
    return DataLoader(path2data=str(root), speaker=list(speakers),
                      modalities=['pose/data', 'audio/log_mel_512'],
                      fs_new=[15, 15], batch_size=128, window_hop=hop,
                      shuffle=False)


def _frames(batch, ctx: int):
    """(audio frames with +/-ctx context, neck-sub pose frames, mask)."""
    from a2m.data.normalization import neck_subtract
    audio = np.asarray(batch['audio/log_mel_512'], np.float64)  # (B, T, 128)
    pose = neck_subtract(np.asarray(batch['pose/data'], np.float64))
    m = np.asarray(batch['mask']) > 0
    audio, pose = audio[m], pose[m]
    if ctx:
        pads = [np.roll(audio, s, axis=1) for s in range(-ctx, ctx + 1)]
        for i, s in enumerate(range(-ctx, ctx + 1)):   # edge-hold padding
            if s > 0:
                pads[i][:, :s] = pads[i][:, s:s + 1]
            elif s < 0:
                pads[i][:, s:] = pads[i][:, s - 1:s]
        audio = np.concatenate(pads, axis=-1)
    b, t = audio.shape[:2]
    return audio.reshape(b * t, -1), pose.reshape(b * t, -1)


def fit_ridge(train_batches, ctx: int, lam: float = 1e-3):
    """Streaming normal equations: X^T X w = X^T Y with a bias column."""
    xtx = xty = None
    for batch in train_batches:
        x, y = _frames(batch, ctx)
        x = np.concatenate([x, np.ones((len(x), 1))], axis=1)
        if xtx is None:
            xtx = np.zeros((x.shape[1], x.shape[1]))
            xty = np.zeros((x.shape[1], y.shape[1]))
        xtx += x.T @ x
        xty += x.T @ y
    reg = lam * np.eye(len(xtx))
    reg[-1, -1] = 0.0                       # don't shrink the bias
    return np.linalg.solve(xtx + reg, xty)  # (F+1, 104)


def eval_pck(predict, test_batches, ctx: int) -> dict:
    from a2m.eval.metrics import compute_pck_np
    pcks: dict = {a: [] for a in ALPHAS}
    l2s, n = [], 0
    for batch in test_batches:
        x, y = _frames(batch, ctx)
        pred = predict(x)
        gk = pred.reshape(-1, 2, 52)
        rk = y.reshape(-1, 2, 52)
        for a in ALPHAS:
            pcks[a].append(compute_pck_np(gk, rk, alpha=a))
        l2s.append(float(np.mean(np.linalg.norm(gk - rk, axis=1))))
        n += len(x)
    return dict(pck_by_alpha={str(a): float(np.concatenate(v).mean())
                              for a, v in pcks.items()},
                l2=float(np.mean(l2s)), n_frames=n)


def generative_oracle(test_batches) -> dict:
    """Invert the known fixture construction (synthetic.py:115-152)."""
    from a2m.data.synthetic import _DET_BANDS, _det_basis, _rest_pose
    basis = _det_basis().reshape(_DET_BANDS, 104)     # (K, 104)
    rest = _rest_pose().reshape(104)
    rest = rest - rest[[0, 52]].repeat(52)            # neck-subtracted rest

    def predict(x):
        env = (x.reshape(len(x), _DET_BANDS, -1).mean(-1) + 6.0) / 4.0
        return rest[None] + env @ basis

    return eval_pck(predict, test_batches, ctx=0)


def main() -> None:
    root = sys.argv[1] if len(sys.argv) > 1 else '/tmp/a2m_data_det'
    if not (pathlib.Path(root) / 'cmu_intervals_df.csv').exists():
        from a2m.data.synthetic import make_synthetic_pats
        make_synthetic_pats(root, speakers=SPEAKERS,
                            intervals_per_speaker=5, duration_s=120.0,
                            seed=0, deterministic=True,
                            splits=('train', 'train', 'train', 'dev',
                                    'test'))
    test = _loader(root, ('oliver',))
    results = {'generative': generative_oracle(test.test)}
    for name, ctx in (('linear', 0), ('linear_ctx2', 2)):
        train = _loader(root, SPEAKERS)
        w = fit_ridge(train.train, ctx)
        test = _loader(root, ('oliver',))
        results[name] = eval_pck(
            lambda x: np.concatenate(
                [x, np.ones((len(x), 1))], axis=1) @ w,
            test.test, ctx)
    out = pathlib.Path(__file__).resolve().parent.parent / 'artifacts'
    out.mkdir(exist_ok=True)
    (out / 'oracle_det_ceiling.json').write_text(
        json.dumps(results, indent=1) + '\n')
    print('ORACLE ' + json.dumps(results))


if __name__ == '__main__':
    main()
