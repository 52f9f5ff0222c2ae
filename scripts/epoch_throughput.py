"""Warm-epoch training throughput on the real TPU.

Builds a synthetic PATS tree sized for ~25 full batches, runs the Trainer
for three epochs (epoch 0 pays compiles), and reports per-batch wall time
for the warm epochs against the known per-step compute (96.5 + 54.7 ms at
B=128) — the gap is host/tunnel overhead the loop fails to hide.

Usage: python scripts/epoch_throughput.py [batch_size] [epochs]
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main(batch_size: int = 128, epochs: int = 3) -> None:
    from a2m.config import Config, DataConfig, TrainConfig
    from a2m.data import DataLoader
    from a2m.data.synthetic import make_synthetic_pats
    from a2m.train.loop import Trainer

    # ~64 s per interval -> ~180 windows each; 16 intervals ≈ 25+ batches
    root = make_synthetic_pats('/tmp/a2m_epoch_tp/data', speakers=('oliver',),
                               intervals_per_speaker=16, duration_s=64.0,
                               seed=0, correlated=True)
    cfg = Config(
        data=DataConfig(path2data=str(root), batch_size=batch_size),
        train=TrainConfig(n_epochs=epochs, save_every_epochs=1000,
                          save_dir='/tmp/a2m_epoch_tp/save', resume=False,
                          log_mfu=False),
    )
    dl = DataLoader(path2data=cfg.data.path2data,
                    speaker=list(cfg.data.speakers),
                    modalities=list(cfg.data.modalities),
                    fs_new=list(cfg.data.fs_new),
                    batch_size=batch_size, window_hop=cfg.data.window_hop,
                    shuffle=False, seed=cfg.data.seed)
    trainer = Trainer(cfg, dl)
    n_batches = sum(1 for _ in trainer.dataloader.train)
    for epoch in range(epochs):
        t0 = time.perf_counter()
        trainer.train_epoch(epoch)
        dt = time.perf_counter() - t0
        print(json.dumps(dict(
            epoch=epoch, batches=n_batches, wall_s=round(dt, 2),
            ms_per_batch=round(dt / n_batches * 1e3, 1),
            samples_per_s=round(n_batches * batch_size / dt))), flush=True)


if __name__ == '__main__':
    main(*(int(a) for a in sys.argv[1:]))
