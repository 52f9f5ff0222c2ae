"""Audio file I/O helpers.

Capability parity with `pose_video/audio_lib.py:25-64`: ffmpeg audio
extraction from video, resampling, wav read/write — without external deps
beyond scipy (ffmpeg used when present).
"""

from __future__ import annotations

import shutil
import subprocess
import numpy as np

from a2m.audio import mel_np


def save_wav(path, y: np.ndarray, sr: int) -> None:
    """Write float waveform in [-1, 1] (or int16) to a wav file."""
    from scipy.io import wavfile
    y = np.asarray(y)
    if y.dtype.kind == 'f':
        y = np.clip(y, -1.0, 1.0)
        y = (y * 32767.0).astype(np.int16)
    wavfile.write(str(path), int(sr), y)


def load_wav(path) -> tuple[np.ndarray, int]:
    """Read a wav file -> (float64 waveform in [-1, 1], sample_rate)."""
    from scipy.io import wavfile
    sr, y = wavfile.read(str(path))
    if y.dtype.kind == 'i':
        y = y.astype(np.float64) / np.iinfo(y.dtype).max
    elif y.dtype.kind == 'u':
        info = np.iinfo(y.dtype)
        y = (y.astype(np.float64) - (info.max + 1) / 2) / ((info.max + 1) / 2)
    else:
        y = y.astype(np.float64)
    return y, int(sr)


def resample(y: np.ndarray, orig_sr: int, target_sr: int,
             method: str = 'kaiser_best') -> np.ndarray:
    """Resampling (audio_lib.py / librosa kaiser_best parity by default)."""
    from a2m.audio import mel_np
    return mel_np.resample(y, orig_sr, target_sr, method=method)


def extract_audio_from_video(video_path, wav_path, sr: int = 16000) -> None:
    """ffmpeg audio extraction (audio_lib.py:25-35); requires ffmpeg."""
    if shutil.which('ffmpeg') is None:
        raise RuntimeError('ffmpeg not available for audio extraction')
    subprocess.call(
        f'ffmpeg -loglevel panic -i "{video_path}" -ar {sr} -ac 1 '
        f'"{wav_path}" -y', shell=True)


def wav_to_features(path, method: str = 'log_mel_512') -> np.ndarray:
    """One-call wav -> log-mel features via the TPU frontend."""
    from a2m.audio import frontend
    y, sr = load_wav(path)
    if method == 'log_mel_512':
        return np.asarray(frontend.log_mel_512(y.astype(np.float32), sr))
    y16 = resample(y, sr, 16000).astype(np.float32)
    if method == 'log_mel_400':
        return np.asarray(frontend.log_mel_400(y16))
    if method == 'vggish':
        return np.asarray(frontend.vggish_log_mel(y16))
    raise ValueError(f'unknown method {method!r}')
