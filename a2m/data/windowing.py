"""Sliding-window index arithmetic.

Exact reproduction of the reference's per-modality windowing
(`pats/data_loading/dataUtils.py:585-620`): window = int(time * fs) source
rows, resampling to fs_new by stride slicing with ratio round(fs / fs_new),
hop of window_hop * ratio source rows.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass(frozen=True)
class WindowIndex:
    starts: np.ndarray     # (n_windows,) start row in source array
    window: int            # source rows per window
    stride: int            # fs_ratio: source rows per output frame
    out_len: int           # output frames per window  == ceil(window/stride)

    def __len__(self) -> int:
        return len(self.starts)

    def slice(self, data: np.ndarray, idx: int) -> np.ndarray:
        s = int(self.starts[idx])
        return data[s:s + self.window:self.stride]


def window_index(n_rows: int, fs: int, fs_new: int, time: float,
                 window_hop: int = 0) -> WindowIndex:
    """Window starts for one modality of one interval.

    With window_hop == 0, windows tile back-to-back; otherwise they advance
    by ``window_hop`` *output* frames (= window_hop * fs_ratio source rows).
    Mirrors reference arithmetic including its exclusive range end (the
    final window starting exactly at n_rows - window is dropped).
    """
    window = int(time * fs)
    assert window_hop < window, (
        f'hop size {window_hop} must be less than window size {window}')
    fs_ratio = round(fs / fs_new)
    if not window_hop:
        starts = np.arange(0, max(n_rows - window, 0), window, dtype=np.int64)
    else:
        starts = np.arange(0, max(n_rows - window, 0),
                           int(window_hop * fs_ratio), dtype=np.int64)
    out_len = len(range(0, window, fs_ratio))
    return WindowIndex(starts=starts, window=window, stride=fs_ratio,
                       out_len=out_len)
