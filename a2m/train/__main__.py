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
    # multi-process bootstrap FIRST (jax.distributed.initialize must
    # precede any backend use — a2m.parallel.launch).  When active, the
    # loader switches to per-process interval slices unless the config
    # already pins an explicit slice.
    from a2m.parallel.launch import maybe_initialize
    if maybe_initialize(cfg.dist):
        import dataclasses

        import jax
        if cfg.data.process_count is None and cfg.data.process_index is None:
            # -1 = resolve from jax.process_index()/process_count()
            cfg = dataclasses.replace(
                cfg, data=dataclasses.replace(cfg.data, process_count=-1))
        print(f'[dist] process {jax.process_index()}/{jax.process_count()} '
              f'up: {jax.local_device_count()} local / '
              f'{jax.device_count()} global devices', flush=True)
    # every DataConfig field reaches the loader (drift-checked mapping)
    dl = loader_from_config(cfg.data, cfg.audio)
    trainer = Trainer(cfg, dl)
    trainer.fit()
    from a2m.parallel.launch import host_barrier, is_distributed
    if is_distributed():
        # align hosts before interpreter exit: the primary spends extra
        # host time on checkpoint writes, and jax.distributed's exit-time
        # shutdown barrier (short deadline) times out if other processes
        # reach it minutes earlier — observed in the 2-process CPU
        # integration test under CPU contention
        host_barrier('a2m_train_exit')


if __name__ == '__main__':
    main()
