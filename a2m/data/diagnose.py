"""Dataset diagnosis: iterate the real pipeline and locate malformed intervals.

Capability parity with `dataset_exception_error_diagnosis.py:44-80` — the
reference's closest thing to an integration test: walk the train loader with
a small batch size, print shapes, and trap errors to the offending interval.

Usage:
    python -m a2m.data.diagnose --path2data ./pats/data --speaker oliver
"""

from __future__ import annotations

import argparse
import traceback


def diagnose(path2data, speakers, modalities=('pose/data',
                                              'audio/log_mel_512'),
             batch_size: int = 4, max_batches: int | None = None,
             log=print) -> list[dict]:
    """Returns a list of {batch, error, meta} for failing batches."""
    from a2m.data import DataLoader

    dl = DataLoader(path2data=path2data, speaker=list(speakers),
                    modalities=list(modalities), fs_new=[15] * len(modalities),
                    batch_size=batch_size, window_hop=5, shuffle=False)
    failures = []
    for i, batch in enumerate(dl.train):
        if max_batches is not None and i >= max_batches:
            break
        try:
            shapes = {k: v.shape for k, v in batch.items()
                      if hasattr(v, 'shape')}
            if i % 50 == 0:
                log(f'batch {i}: ' + ', '.join(
                    f'{k}={s}' for k, s in shapes.items()))
            for k in modalities:
                assert batch[k].ndim == 3, f'{k} has ndim {batch[k].ndim}'
        except Exception as e:  # noqa: BLE001 — diagnosis tool traps anything
            failures.append(dict(batch=i, error=repr(e),
                                 meta=batch.get('meta')))
            log(f'batch {i} FAILED: {e!r} meta={batch.get("meta")}')
            log(traceback.format_exc())
    log(f'diagnosis complete: {len(failures)} failing batches')
    return failures


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument('--path2data', default='./pats/data')
    ap.add_argument('--speaker', nargs='+', default=['oliver'])
    ap.add_argument('--batch_size', type=int, default=4)
    ap.add_argument('--max_batches', type=int, default=None)
    args = ap.parse_args()
    diagnose(args.path2data, args.speaker, batch_size=args.batch_size,
             max_batches=args.max_batches)


if __name__ == '__main__':
    main()
