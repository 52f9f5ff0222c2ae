"""Training entry point (reference `python version5_model_train.py`).

Usage:
    python -m a2m.train [key.path=value ...]

e.g.  python -m a2m.train data.path2data=./pats/data data.batch_size=128 \
          train.n_epochs=500 mesh.data=-1
"""

from __future__ import annotations

import sys

from a2m.config import Config, apply_overrides
from a2m.data import loader_from_config
from a2m.train.loop import Trainer


def main(argv=None) -> None:
    argv = argv if argv is not None else sys.argv[1:]
    cfg = apply_overrides(Config(), [a for a in argv if '=' in a])
    # every DataConfig field reaches the loader (drift-checked mapping)
    dl = loader_from_config(cfg.data, cfg.audio)
    trainer = Trainer(cfg, dl)
    trainer.fit()


if __name__ == '__main__':
    main()
