"""Training entry point (reference `python version5_model_train.py`).

Usage:
    python -m a2m.train [key.path=value ...]

e.g.  python -m a2m.train data.path2data=./pats/data data.batch_size=128 \
          train.n_epochs=500 mesh.data=-1
"""

from __future__ import annotations

import sys

from a2m.config import Config, apply_overrides
from a2m.data import DataLoader
from a2m.train.loop import Trainer


def main(argv=None) -> None:
    argv = argv if argv is not None else sys.argv[1:]
    cfg = apply_overrides(Config(), [a for a in argv if '=' in a])
    dl = DataLoader(path2data=cfg.data.path2data,
                    speaker=list(cfg.data.speakers),
                    modalities=list(cfg.data.modalities),
                    fs_new=list(cfg.data.fs_new),
                    batch_size=cfg.data.batch_size,
                    window_hop=cfg.data.window_hop,
                    shuffle=cfg.data.shuffle,
                    style_iters=cfg.data.style_iters,
                    num_training_sample=cfg.data.num_training_sample,
                    quantile_sample=cfg.data.quantile_sample,
                    quantile_num_training_sample=(
                        cfg.data.quantile_num_training_sample),
                    weighted=cfg.data.weighted,
                    seed=cfg.data.seed,
                    use_pallas=cfg.audio.pallas_mode())
    trainer = Trainer(cfg, dl)
    trainer.fit()


if __name__ == '__main__':
    main()
