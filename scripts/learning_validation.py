"""25-epoch learning validation on the real TPU (correlated fixtures).

Trains the full-size model on a correlated synthetic PATS tree where the
pose stream is a deterministic function of the audio, so the generator has
real structure to learn; reports the per-epoch val G trajectory and the
last-5-epoch mean.  Round-1 reference numbers (commit 0ca7a18): f32 last-5
mean 0.650, bf16 0.636.

Usage: python scripts/learning_validation.py [f32|bf16] [epochs]
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main(dtype: str = 'f32', epochs: int = 25) -> None:
    from a2m.config import Config, DataConfig, TrainConfig
    from a2m.data import DataLoader
    from a2m.data.synthetic import make_synthetic_pats
    from a2m.train.loop import Trainer

    root = make_synthetic_pats(f'/tmp/a2m_lv_{dtype}/data',
                               speakers=('oliver',),
                               intervals_per_speaker=8, duration_s=24.0,
                               seed=0, correlated=True)
    cfg = Config(
        data=DataConfig(path2data=str(root), batch_size=32),
        train=TrainConfig(n_epochs=epochs, save_every_epochs=1000,
                          save_dir=f'/tmp/a2m_lv_{dtype}/save', resume=False,
                          compute_dtype=dtype, log_mfu=False),
    )
    dl = DataLoader(path2data=cfg.data.path2data,
                    speaker=list(cfg.data.speakers),
                    modalities=list(cfg.data.modalities),
                    fs_new=list(cfg.data.fs_new), batch_size=32,
                    window_hop=cfg.data.window_hop, shuffle=True,
                    seed=cfg.data.seed)
    trainer = Trainer(cfg, dl)
    t0 = time.perf_counter()
    hist = trainer.fit(epochs)
    wall = time.perf_counter() - t0
    val_g = hist['val_g']
    last5 = sum(val_g[-5:]) / max(len(val_g[-5:]), 1)
    print(json.dumps(dict(
        dtype=dtype, epochs=epochs, wall_s=round(wall, 1),
        val_g_first=round(val_g[0], 4), val_g_last=round(val_g[-1], 4),
        val_g_last5_mean=round(last5, 4),
        trajectory=[round(v, 3) for v in val_g])), flush=True)


if __name__ == '__main__':
    args = sys.argv[1:]
    main(args[0] if args else 'f32', int(args[1]) if len(args) > 1 else 25)
