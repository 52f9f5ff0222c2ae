"""Host data-pipeline scale probe (VERDICT r4 item 7).

The reference loads every interval into RAM at startup
(dataUtils.py:530-540); at real-PATS scale (84K intervals,
dataUtils.py:111-113) that is tens of GB.  This probe builds a
multi-thousand-interval synthetic tree and measures, in separate
processes, startup wall / resident memory / one-epoch iteration time for
the eager loader vs ``lazy_intervals=True`` (bounded-LRU payloads,
a2m/data/dataset.py).

Usage::

    python scripts/loader_scale_probe.py [n_intervals_total] [duration_s]

Writes artifacts/loader_scale_probe.json and prints one JSON line.
"""

from __future__ import annotations

import json
import pathlib
import resource
import subprocess
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

SPEAKERS = ('oliver', 'noah', 'seth', 'shelly',
            'ellen', 'angelica', 'almaram', 'chemistry')


def build(root: pathlib.Path, per_speaker: int, duration_s: float) -> None:
    from a2m.data.synthetic import make_synthetic_pats
    marker = root / '.complete'
    if marker.exists():
        return
    t0 = time.perf_counter()
    make_synthetic_pats(root, speakers=SPEAKERS,
                        intervals_per_speaker=per_speaker,
                        duration_s=duration_s, seed=0)
    marker.touch()
    print(f'built {per_speaker * len(SPEAKERS)} intervals in '
          f'{time.perf_counter() - t0:.0f}s', flush=True)


def measure(root: str, lazy: bool) -> dict:
    """Run in a fresh process (RSS must start clean)."""
    from a2m.data import DataLoader
    rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    t0 = time.perf_counter()
    dl = DataLoader(path2data=root, speaker=list(SPEAKERS),
                    modalities=['pose/data', 'audio/log_mel_512'],
                    fs_new=[15, 15], batch_size=128, window_hop=5,
                    shuffle=True, lazy_intervals=lazy)
    startup_s = time.perf_counter() - t0
    rss_startup = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    t0 = time.perf_counter()
    n = sum(1 for _ in dl.train)
    epoch_s = time.perf_counter() - t0
    rss_end = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    return dict(lazy=lazy, startup_s=round(startup_s, 2),
                train_batches=n, epoch_s=round(epoch_s, 2),
                rss_startup_mb=round((rss_startup - rss0) / 1024, 1),
                rss_peak_mb=round((rss_end - rss0) / 1024, 1))


def main() -> None:
    total = int(sys.argv[1]) if len(sys.argv) > 1 else 6000
    duration = float(sys.argv[2]) if len(sys.argv) > 2 else 12.0
    per_speaker = max(1, total // len(SPEAKERS))
    root = pathlib.Path(f'/tmp/a2m_scale_{per_speaker * len(SPEAKERS)}'
                        f'_{int(duration)}')
    build(root, per_speaker, duration)

    if '--measure' in sys.argv:        # child mode
        print('RESULT ' + json.dumps(measure(
            str(root), lazy='--lazy' in sys.argv)), flush=True)
        return

    results = {}
    for mode, flag in (('eager', []), ('lazy', ['--lazy'])):
        out = subprocess.run(
            [sys.executable, __file__, str(total), str(duration),
             '--measure'] + flag,
            capture_output=True, text=True, check=True)
        line = [ln for ln in out.stdout.splitlines()
                if ln.startswith('RESULT ')][-1]
        results[mode] = json.loads(line[len('RESULT '):])
        print(mode, results[mode], flush=True)

    repo = pathlib.Path(__file__).resolve().parent.parent
    (repo / 'artifacts' / 'loader_scale_probe.json').write_text(
        json.dumps(dict(n_intervals=per_speaker * len(SPEAKERS),
                        duration_s=duration, **results), indent=1) + '\n')
    print('PROBE ' + json.dumps(results))


if __name__ == '__main__':
    main()
