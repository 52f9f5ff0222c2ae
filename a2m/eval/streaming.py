"""Long-audio streaming inference: arbitrary-length audio -> pose sequence.

The reference is pinned to 64-frame windows end to end (SURVEY.md §5
"long-context": sequence length fixed at the dataset level, no streaming
path).  This module adds the capability TPU-style: the feature stream is
cut into overlapping windows along the time axis, the whole window batch
runs through the generator as ONE device program (the batch axis is also
the shardable axis for multi-chip streaming), and overlapping predictions
are blended with a linear crossfade — giving O(audio length) streaming
inference with static shapes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from a2m import constants


@functools.lru_cache(maxsize=8)
def _cached_apply(generator):
    """One compiled eval-mode apply per generator module.

    linen modules are frozen dataclasses, so equal-config generators share
    the cache entry; without this every ``stream_poses`` call built a fresh
    ``jax.jit`` wrapper and recompiled (minutes on remote-compile backends).
    """
    return jax.jit(lambda v, a: generator.apply(v, a, train=False))


def window_starts(n_frames: int, window: int, hop: int) -> np.ndarray:
    """Window start indices covering [0, n_frames) (last window clamped)."""
    if n_frames <= window:
        return np.array([0])
    starts = np.arange(0, n_frames - window + 1, hop)
    if starts[-1] + window < n_frames:
        starts = np.append(starts, n_frames - window)
    return starts


def blend(pred: np.ndarray, starts: np.ndarray, n_frames: int,
          window: int) -> np.ndarray:
    """Host-side overlap-add with triangular crossfade weights.

    pred: (W, window, F) window predictions; returns (n_frames, F).
    """
    feats = pred.shape[-1]
    out = np.zeros((n_frames, feats), np.float64)
    acc = np.zeros((n_frames, 1), np.float64)
    w = np.minimum(np.arange(1, window + 1),
                   np.arange(window, 0, -1)).astype(np.float64)[:, None]
    for s, p in zip(starts, pred):
        n = min(window, n_frames - int(s))  # clips shorter than one window
        out[s:s + n] += w[:n] * p[:n]
        acc[s:s + n] += w[:n]
    return (out / np.maximum(acc, 1e-9)).astype(np.float32)


def _stream_windows(features: np.ndarray, window: int, hop: int
                    ) -> tuple[np.ndarray, np.ndarray]:
    """(T, F) -> ((W, window, F) window stack, starts)."""
    t = features.shape[0]
    starts = window_starts(t, window, hop)
    idx = starts[:, None] + np.arange(window)[None, :]
    return features[np.minimum(idx, t - 1)], starts


def _batched_forward(apply, variables, windows: np.ndarray,
                     batch_size: int) -> np.ndarray:
    """Run a (W, window, F) window stack through the compiled forward in
    fixed-size chunks (one static-shape executable regardless of W)."""
    preds = []
    for i in range(0, len(windows), batch_size):
        chunk = windows[i:i + batch_size]
        n = len(chunk)
        if n < batch_size:
            chunk = np.pad(chunk, ((0, batch_size - n), (0, 0), (0, 0)))
        out = np.asarray(apply(variables, jnp.asarray(chunk, jnp.float32)))
        preds.append(out[:n])
    return np.concatenate(preds, axis=0)


def stream_poses(generator, variables, features: np.ndarray,
                 window: int = constants.FRAMES_PER_WINDOW,
                 hop: int = 32, batch_size: int = 64) -> np.ndarray:
    """features: (T, 128) log-mel at pose rate -> (T, 104) pose.

    Windows are batched and run through a single jitted forward; arbitrary
    duration is handled by chunking the window batch.
    """
    windows, starts = _stream_windows(features, window, hop)
    pred = _batched_forward(_cached_apply(generator), variables, windows,
                            batch_size)
    return blend(pred, starts, features.shape[0], window)


def stream_poses_multi(generator, variables, features_list,
                       window: int = constants.FRAMES_PER_WINDOW,
                       hop: int = 32, batch_size: int = 64
                       ) -> list[np.ndarray]:
    """S concurrent feature streams -> S pose streams, sharing ONE window
    batch.

    Every stream's windows are concatenated on the batch axis (the same
    axis the mesh shards), so S concurrent streams cost roughly one
    batched forward over their combined windows instead of S sequential
    one-window-deep passes — this is what turns the latency-bound
    single-stream path into a throughput path for serving.  Streams may
    have different lengths; each gets its own crossfaded (T_s, 104)
    output.
    """
    stacks, starts_list = zip(*(_stream_windows(np.asarray(f), window, hop)
                                for f in features_list))
    pred = _batched_forward(_cached_apply(generator), variables,
                            np.concatenate(stacks, axis=0), batch_size)
    out, off = [], 0
    for f, stack, starts in zip(features_list, stacks, starts_list):
        out.append(blend(pred[off:off + len(stack)], starts,
                         np.asarray(f).shape[0], window))
        off += len(stack)
    return out


def _waveform_features(waveform: np.ndarray, sr: int,
                       method: str = 'log_mel_512') -> np.ndarray:
    from a2m.audio import frontend
    if method != 'log_mel_512':
        raise ValueError('streaming currently supports log_mel_512')
    fs = constants.AUDIO_FS_MAP['log_mel_512']
    stride = round(fs / constants.POSE_FPS)
    # stride folded into the hop: compute only pose-rate frames (equal to
    # [::stride] of the full 89 Hz grid, 6x less frontend work)
    spec = frontend.strided_spec(frontend.spec_log_mel_512(sr), stride)
    return np.asarray(frontend.log_mel(
        jnp.asarray(np.asarray(waveform, np.float32)), spec, exact=False))


def stream_from_waveform(generator, variables, waveform: np.ndarray,
                         sr: int, method: str = 'log_mel_512',
                         hop: int = 32, batch_size: int = 64) -> np.ndarray:
    """Raw audio of any length -> (T_pose, 104) pose via the TPU frontend +
    windowed generator."""
    feats = _waveform_features(waveform, sr, method)
    return stream_poses(generator, variables, feats, hop=hop,
                        batch_size=batch_size)


def stream_from_waveforms(generator, variables, waveforms, sr: int,
                          method: str = 'log_mel_512', hop: int = 32,
                          batch_size: int = 64) -> list[np.ndarray]:
    """S raw audio streams (any, possibly different, lengths) -> S pose
    streams through one shared window batch (see stream_poses_multi)."""
    feats = [_waveform_features(w, sr, method) for w in waveforms]
    return stream_poses_multi(generator, variables, feats, hop=hop,
                              batch_size=batch_size)
