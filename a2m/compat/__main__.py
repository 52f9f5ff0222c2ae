"""One-command checkpoint migration from the PyTorch reference.

    python -m a2m.compat --gen ./save/Best_Gen --out ./save/migrated \
        [--disc ./save/Best_Dis] [generator.out_channels=256 ...]

Converts reference ``state_dict`` files (`version5_model_train.py:509-515`)
into a2m Orbax checkpoints: the generator lands as ``<out>/best_gen`` —
directly consumable by ``python -m a2m.viz.generate_video --ckpt <out>`` and
``python -m a2m.eval.harness`` — and an optional discriminator as
``<out>/imported_disc``.  Any trailing ``key.path=value`` arguments override
the model configs (they must match the checkpoint's architecture sizes;
mismatches fail loudly with the offending parameter path).
"""

from __future__ import annotations

import argparse
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from a2m.compat.torch_import import (import_discriminator,
                                     load_torch_state_dict)
from a2m.config import Config, apply_overrides


def _print_report(name: str, report) -> None:
    print(f'{name}: imported with {len(report.skipped)} structural skip(s), '
          f'{len(report.missing)} a2m leaf/leaves left at init, '
          f'{len(report.unused)} unused checkpoint key(s)')
    for keys, reason in report.skipped:
        head = keys[0] if keys else '?'
        print(f'  skipped {head} (+{max(len(keys) - 1, 0)} more): {reason}')
    for path, reason in report.missing:
        print(f'  at init: {path} ({reason})')
    for key in report.unused:
        print(f'  UNUSED checkpoint key: {key}')


def run(gen_path: str, out_dir: str, disc_path: str | None = None,
        overrides: list | None = None, strict: bool = True) -> dict:
    from a2m.compat import load_torch_generator
    from a2m.train.checkpoint import CheckpointManager
    from a2m.train.train_step import NetState

    cfg = apply_overrides(Config(), overrides or [])
    out = Path(out_dir)

    new_vars, g_report = load_torch_generator(gen_path,
                                              config=cfg.generator,
                                              strict=strict)
    _print_report('generator', g_report)
    mgr = CheckpointManager(out)
    mgr.save_best_generator(NetState(new_vars['params'],
                                     new_vars.get('batch_stats', {}), None))
    print(f'wrote {out / "best_gen"}')

    d_report = None
    if disc_path is not None:
        import orbax.checkpoint as ocp

        from a2m.models import Discriminator
        model = Discriminator(cfg.discriminator)
        key = jax.random.PRNGKey(0)
        dummy = jnp.zeros((1, cfg.generator.time_steps - 1, 104), jnp.float32)
        variables = jax.jit(model.init)({'params': key, 'dropout': key},
                                        dummy)
        d_vars, d_report = import_discriminator(
            load_torch_state_dict(disc_path), variables)
        if strict:
            d_report.raise_if_unexpected()
        _print_report('discriminator', d_report)
        ckpt = ocp.StandardCheckpointer()
        ckpt.save((out / 'imported_disc').absolute(),
                  dict(params=jax.tree.map(np.asarray, d_vars['params']),
                       batch_stats=jax.tree.map(
                           np.asarray, d_vars.get('batch_stats', {}))),
                  force=True)
        ckpt.wait_until_finished()
        print(f'wrote {out / "imported_disc"}')
    return dict(g_report=g_report, d_report=d_report)


def main() -> None:
    ap = argparse.ArgumentParser(
        description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument('--gen', required=True,
                    help='reference generator state_dict file (e.g. Best_Gen)')
    ap.add_argument('--disc', default=None,
                    help='optional reference discriminator state_dict file')
    ap.add_argument('--out', required=True, help='output checkpoint directory')
    ap.add_argument('--no-strict', action='store_true',
                    help='tolerate unconsumed checkpoint keys')
    ap.add_argument('overrides', nargs='*',
                    help='config overrides, e.g. generator.out_channels=256')
    args = ap.parse_args()
    run(args.gen, args.out, args.disc, args.overrides,
        strict=not args.no_strict)


if __name__ == '__main__':
    main()
