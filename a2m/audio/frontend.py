"""TPU-native (JAX/XLA) audio frontends.

Design notes (TPU-first, not a torch/librosa translation):

* XLA on this TPU backend has no FFT, and an FFT would be VPU-bound anyway.
  The STFT is instead expressed as **windowed-DFT matmuls** — the Hann window
  is folded into a real/imag DFT matrix pair so the whole frontend becomes
  ``frames @ DFT -> power -> @ mel -> log``: three MXU matmuls and a couple of
  elementwise ops that XLA fuses.
* For <=1e-5 rel-err parity with the float64 NumPy golden
  (:mod:`a2m.audio.mel_np`), the DFT matrices are stored as **hi+lo float32
  pairs** (error-free float64 split) and contracted with
  ``precision='highest'`` — measured ~1e-6 rel-err on mel outputs.  A fast
  mode (``exact=False``) uses single-f32 matmuls for maximum throughput.
* Framing uses the chunked-reshape trick (frames are concatenations of
  hop-sized chunks), avoiding gathers.

Reference behavior being reproduced: `pats/data_loading/audio.py:58-120`
(librosa log_mel_512 / log_mel_400) and `pose_video/mel_features.py:192-223`
(VGGish), see :mod:`a2m.audio.mel_np` for the spec.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from a2m.audio import mel_np
from a2m.ops.precise import precise_log, precise_sqrt


@dataclass(frozen=True)
class MelSpec:
    """Static spectrogram/mel parameters (hashable: jit-cache friendly)."""
    sr: int
    n_fft: int
    hop_length: int
    win_length: int
    n_mels: int
    power: float          # 1.0 (magnitude) or 2.0 (power)
    fmin: float
    fmax: float | None
    mel_norm: str | None  # 'slaney' or None
    mel_scale: str        # 'slaney' or 'htk'
    center: bool
    pad_mode: str = 'reflect'
    log_mode: str = 'eps'  # 'eps': log(max-or-replace-zeros eps); 'offset': log(x+off)
    log_const: float = 1e-10
    # 'librosa': frames are n_fft long, window zero-padded centered inside;
    # 'vggish': frames are win_length long, rfft zero-pads to n_fft
    frame_style: str = 'librosa'


def spec_log_mel_512(sr: int) -> MelSpec:
    return MelSpec(sr=sr, n_fft=2048, hop_length=512, win_length=2048,
                   n_mels=128, power=2.0, fmin=0.0, fmax=None,
                   mel_norm='slaney', mel_scale='slaney', center=True,
                   log_mode='eps', log_const=1e-10)


def spec_log_mel_400() -> MelSpec:
    return MelSpec(sr=16000, n_fft=512, hop_length=160, win_length=400,
                   n_mels=64, power=1.0, fmin=125.0, fmax=7500.0,
                   mel_norm=None, mel_scale='slaney', center=False,
                   log_mode='eps', log_const=1e-6)


def spec_vggish() -> MelSpec:
    # win=400, hop=160 @16k; fft = 2^ceil(log2(400)) = 512
    return MelSpec(sr=16000, n_fft=512, hop_length=160, win_length=400,
                   n_mels=64, power=1.0, fmin=125.0, fmax=7500.0,
                   mel_norm=None, mel_scale='htk', center=False,
                   log_mode='offset', log_const=0.01, frame_style='vggish')


# ---------------------------------------------------------------------------
# Host-side constant construction (float64, then hi/lo f32 split)
# ---------------------------------------------------------------------------


def _hilo(m: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    hi = m.astype(np.float32)
    lo = (m - hi.astype(np.float64)).astype(np.float32)
    return hi, lo


@functools.lru_cache(maxsize=16)
def dft_matrices(spec: MelSpec) -> dict:
    """Window-folded real/imag DFT matrices (win-or-nfft x n_fft//2+1) and the
    mel matrix (bins x mels), as hi/lo f32 pairs.  The window is centered
    inside the n_fft frame when win_length < n_fft (librosa convention); with
    uncentered VGGish framing (win < fft, no frame padding beyond the window)
    the frame length is win_length and the DFT matrix absorbs the implicit
    zero-padding to n_fft.
    """
    n_fft, win, K = spec.n_fft, spec.win_length, spec.n_fft // 2 + 1
    window = mel_np.periodic_hann(win)

    if spec.frame_style == 'librosa':
        # frames are n_fft long; window zero-padded (centered) into n_fft
        frame_len = n_fft
        w_full = np.zeros(n_fft)
        off = (n_fft - win) // 2 if win < n_fft else 0
        w_full[off:off + win] = window
    else:
        # VGGish-style: frames are win long; rfft zero-pads to n_fft, which
        # equals using only the first `win` rows of the DFT matrix
        frame_len = win
        w_full = window

    n = np.arange(frame_len)[:, None]
    k = np.arange(K)[None, :]
    ang = -2.0 * np.pi * n * k / n_fft
    dr = np.cos(ang) * w_full[:, None]
    di = np.sin(ang) * w_full[:, None]

    if spec.mel_scale == 'htk':
        mel = mel_np.mel_matrix_htk(spec.n_mels, K, spec.sr, spec.fmin,
                                    spec.fmax if spec.fmax else spec.sr / 2).T
    else:
        mel = mel_np.mel_matrix_slaney(spec.n_mels, spec.n_fft, spec.sr,
                                       fmin=spec.fmin, fmax=spec.fmax,
                                       norm=spec.mel_norm)
    # mel: (n_mels, K) -> transpose to (K, n_mels) for right-multiplication
    mel = mel.T

    drh, drl = _hilo(dr)
    dih, dil = _hilo(di)
    melh, mell = _hilo(mel)
    return dict(frame_len=frame_len, K=K, drh=drh, drl=drl, dih=dih, dil=dil,
                melh=melh, mell=mell)


@functools.lru_cache(maxsize=16)
def radix_matrices(spec: MelSpec) -> dict:
    """Two-stage Cooley-Tukey DFT constants for the fast (exact=False) path.

    The direct windowed-DFT matmul costs 2*N*K MACs/frame (N=n_fft,
    K=N/2+1) — 8.4 MFLOP/frame at N=2048, ~8 ms of MXU time for a 4.3 s
    B=128 batch.  Splitting N = N1*N2 (four-step FFT) drops that ~8x:
    with n = n1*N2 + n2 and k = N1*k2 + k1,

        A[.., n2, k1] = sum_n1 x[.., n1, n2] F1[n1, k1]      (inner DFT)
        B = A * W,  W[n2, k1] = exp(-2pi i n2 k1 / N)        (twiddle)
        X[.., k1, k2] = sum_n2 B[.., n2, k1] F2[n2, k2]      (outer DFT)

    All matmuls, XLA-fusable, no FFT primitive needed.  The mel matrix is
    pre-PERMUTED to the (k1, k2) flatten order and zero-padded over the
    conjugate-mirror bins k > N/2, so |X|^2 feeds mel directly — no
    reorder transpose, no bin slice.
    """
    n_fft = spec.n_fft
    n1 = 1 << ((n_fft.bit_length() - 1 + 1) // 2)     # ~sqrt, power of two
    n2 = n_fft // n1
    k_bins = n_fft // 2 + 1

    i1 = np.arange(n1)
    i2 = np.arange(n2)
    ang1 = -2.0 * np.pi * np.outer(i1, i1) / n1       # F1 (n1 x n1)
    ang2 = -2.0 * np.pi * np.outer(i2, i2) / n2       # F2 (n2 x n2)
    angw = -2.0 * np.pi * np.outer(i2, i1) / n_fft    # W  (n2 x k1)

    mats = dft_matrices(spec)
    window = np.zeros(n_fft)
    # reconstruct the window the direct path folds into its DFT matrices
    win = mel_np.periodic_hann(spec.win_length)
    if spec.frame_style == 'librosa':
        off = ((n_fft - spec.win_length) // 2
               if spec.win_length < n_fft else 0)
        window[off:off + spec.win_length] = win
    else:
        window[:spec.win_length] = win

    # mel rows permuted to the (k1-major, k2-minor) flatten order:
    # flat index i = k1*n2 + k2  <->  bin k = n1*k2 + k1 (mirrors zeroed)
    if spec.mel_scale == 'htk':
        # htk builder returns (bins, mels); slaney returns (mels, bins)
        mel = mel_np.mel_matrix_htk(spec.n_mels, k_bins, spec.sr, spec.fmin,
                                    spec.fmax if spec.fmax else spec.sr / 2)
    else:
        mel = mel_np.mel_matrix_slaney(spec.n_mels, spec.n_fft, spec.sr,
                                       fmin=spec.fmin, fmax=spec.fmax,
                                       norm=spec.mel_norm).T
    mel_perm = np.zeros((n_fft, spec.n_mels))
    for k1 in range(n1):
        for k2 in range(n2):
            k = n1 * k2 + k1
            if k < k_bins:
                mel_perm[k1 * n2 + k2] = mel[k]
    # conjugate mirrors k' = n_fft - k carry |X| identical to bin k; fold
    # their mel weight there IF the direct path would have counted them —
    # it does not (rfft keeps K bins only), so mirrors stay zero.

    f32 = np.float32
    return dict(n1=n1, n2=n2,
                f1r=np.cos(ang1).astype(f32), f1i=np.sin(ang1).astype(f32),
                f2r=np.cos(ang2).astype(f32), f2i=np.sin(ang2).astype(f32),
                wr=np.cos(angw).astype(f32), wi=np.sin(angw).astype(f32),
                window=window.astype(f32), frame_len=mats['frame_len'],
                mel_perm=mel_perm.astype(f32))


def _radix_log_mel(frames: jnp.ndarray, spec: MelSpec) -> jnp.ndarray:
    """Fast-path log-mel from raw (..., T, frame_len) frames via the
    two-stage DFT (see :func:`radix_matrices`)."""
    m = radix_matrices(spec)
    n1, n2 = m['n1'], m['n2']
    x = frames * m['window'][:frames.shape[-1]]
    if frames.shape[-1] < spec.n_fft:                 # vggish: win < n_fft
        pad = spec.n_fft - frames.shape[-1]
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
    x = x.reshape(*x.shape[:-1], n1, n2)              # n = n1*N2 + n2
    # inner DFT over n1 (axis -2): (..., n2, k1)
    dot = functools.partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)
    xt = jnp.swapaxes(x, -1, -2)                      # (..., n2, n1)
    ar = dot(xt, m['f1r'])
    ai = dot(xt, m['f1i'])
    # twiddle (elementwise, fuses into the outer matmul's operand)
    br = ar * m['wr'] - ai * m['wi']
    bi = ar * m['wi'] + ai * m['wr']
    # outer DFT over n2 (axis -2): (..., k1, k2)
    bt_r = jnp.swapaxes(br, -1, -2)
    bt_i = jnp.swapaxes(bi, -1, -2)
    xr = dot(bt_r, m['f2r']) - dot(bt_i, m['f2i'])
    xi = dot(bt_r, m['f2i']) + dot(bt_i, m['f2r'])
    p = xr * xr + xi * xi                             # (..., k1, k2)
    if spec.power != 2.0:
        p = jnp.sqrt(p)
    p = p.reshape(*p.shape[:-2], n1 * n2)             # k1-major flatten
    mel = dot(p, m['mel_perm'])                       # permuted mel rows
    if spec.log_mode == 'offset':
        return jnp.log(mel + spec.log_const)
    return jnp.log(jnp.maximum(mel, spec.log_const))


def strided_spec(spec: MelSpec, stride: int) -> MelSpec:
    """Fold the loader's stride-resampling (dataUtils.py:585-620 arithmetic:
    keep every ``stride``-th STFT frame) into the hop, so the pose-rate
    pipeline computes ONLY the frames it keeps.  ``log_mel(y,
    strided_spec(s, k))[..., i, :] == log_mel(y, s)[..., i*k, :]`` exactly
    (frame starts are hop-multiples either way); at stride 6 the live
    audio->pose path does 6x less framing/DFT/mel work."""
    import dataclasses
    return dataclasses.replace(spec, hop_length=spec.hop_length * stride)


def num_frames(spec: MelSpec, n_samples: int) -> int:
    if spec.center:
        return 1 + n_samples // spec.hop_length
    mats = dft_matrices(spec)
    return 1 + (n_samples - mats['frame_len']) // spec.hop_length


# ---------------------------------------------------------------------------
# JAX ops
# ---------------------------------------------------------------------------


def frame_signal(y: jnp.ndarray, frame_len: int, hop: int,
                 n_frames: int) -> jnp.ndarray:
    """(..., N) -> (..., n_frames, frame_len) without gathers.

    Frames are assembled from hop-aligned chunks: with g = gcd(frame_len, hop)
    and C = y reshaped to (-1, g), frame i is the concatenation of rows
    [i*hop/g : i*hop/g + frame_len/g].  Each shifted chunk view is a cheap
    strided slice, so XLA lowers this to copies, not gather.
    """
    g = int(np.gcd(frame_len, hop))
    q = frame_len // g
    step = hop // g
    total_chunks = (n_frames - 1) * step + q
    needed = total_chunks * g
    if y.shape[-1] < needed:
        y = jnp.pad(y, [(0, 0)] * (y.ndim - 1) + [(0, needed - y.shape[-1])])
    c = y[..., :needed].reshape(*y.shape[:-1], total_chunks, g)
    parts = [jax.lax.slice_in_dim(c, j, j + (n_frames - 1) * step + 1, stride=step,
                                  axis=c.ndim - 2)
             for j in range(q)]
    return jnp.concatenate(parts, axis=-1)


def _pad_centered(y: jnp.ndarray, n_fft: int, pad_mode: str) -> jnp.ndarray:
    pad = n_fft // 2
    mode = {'reflect': 'reflect', 'constant': 'constant'}[pad_mode]
    return jnp.pad(y, [(0, 0)] * (y.ndim - 1) + [(pad, pad)], mode=mode)


def _pcm_to_float(y: jnp.ndarray) -> jnp.ndarray:
    """Integer PCM -> [-1, 1) float32 ON DEVICE, so serving can ship int16
    wire format (half the host->device bytes of f32).  Scale matches
    librosa.util.buf_to_float (1 / 2^(bits-1)) — the reference's wav load
    path (pats/data_loading/audio.py:80-90)."""
    if jnp.issubdtype(y.dtype, jnp.integer):
        return y.astype(jnp.float32) / np.float32(np.iinfo(y.dtype).max + 1)
    return y.astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=('spec', 'exact', 'n_frames'))
def log_mel(y: jnp.ndarray, spec: MelSpec, exact: bool = True,
            n_frames: int | None = None) -> jnp.ndarray:
    """Batched log-mel: (..., N) float32 -> (..., T, n_mels) float32.

    ``exact=True`` uses hi/lo split-f32 matmuls at precision='highest' for
    <=1e-5 parity with the float64 golden; ``exact=False`` single-f32 fast path.
    """
    mats = dft_matrices(spec)
    y = _pcm_to_float(y)
    if spec.center:
        y = _pad_centered(y, spec.n_fft, spec.pad_mode)
    if n_frames is None:
        n_frames = 1 + (y.shape[-1] - mats['frame_len']) // spec.hop_length
    frames = frame_signal(y, mats['frame_len'], spec.hop_length, n_frames)
    return _mel_from_frames(frames, spec, exact)


def frame_for_wire(y: np.ndarray, spec: MelSpec,
                   n_frames: int | None = None,
                   tail_value: float = 0) -> np.ndarray:
    """CLIENT-side framing for the framed serving wire format (numpy).

    Emits exactly the (..., T, frame_len) sample frames that
    :func:`log_mel` would cut from the waveform — same centered reflect
    padding, same hop grid, same zero tail — so
    ``log_mel_frames(frame_for_wire(y, spec), spec) == log_mel(y, spec)``
    bit-for-bit.  With the pose-rate strided spec the hop (3072) exceeds
    the frame length (2048), so a third of the samples are never read by
    the frontend: shipping frames instead of the waveform cuts
    host->device bytes 1.5x on top of any PCM/mu-law sample encoding
    (dtype is preserved: int16 in -> int16 frames).
    """
    y = np.asarray(y)
    mats = dft_matrices(spec)
    frame_len, hop = mats['frame_len'], spec.hop_length
    if spec.center:
        pad = spec.n_fft // 2
        mode = {'reflect': 'reflect', 'constant': 'constant'}[spec.pad_mode]
        y = np.pad(y, [(0, 0)] * (y.ndim - 1) + [(pad, pad)], mode=mode)
    if n_frames is None:
        n_frames = 1 + (y.shape[-1] - frame_len) // hop
    needed = (n_frames - 1) * hop + frame_len
    if y.shape[-1] < needed:   # frame_signal's zero tail (``tail_value``
        # lets pre-encoded wires pad with their code for a zero sample,
        # e.g. mu-law 128)
        y = np.pad(y, [(0, 0)] * (y.ndim - 1) + [(0, needed - y.shape[-1])],
                   constant_values=tail_value)
    idx = np.arange(n_frames)[:, None] * hop + np.arange(frame_len)[None, :]
    return y[..., idx]


@functools.partial(jax.jit, static_argnames=('spec', 'exact'))
def log_mel_frames(frames: jnp.ndarray, spec: MelSpec,
                   exact: bool = True) -> jnp.ndarray:
    """Framed-wire entry: (..., T, frame_len) sample frames (f32 or integer
    PCM, see :func:`frame_for_wire`) -> (..., T, n_mels) log-mel, identical
    to :func:`log_mel` on the corresponding waveform."""
    return _mel_from_frames(_pcm_to_float(frames), spec, exact)


def _mel_from_frames(frames: jnp.ndarray, spec: MelSpec,
                     exact: bool) -> jnp.ndarray:
    """(..., T, frame_len) float32 frames -> (..., T, n_mels) log-mel."""
    mats = dft_matrices(spec)
    if not exact:
        # fast path: two-stage radix DFT, ~8x fewer MACs than the direct
        # windowed-DFT matmul (measured 15.9 -> see README; parity vs the
        # float64 golden stays ~1e-6 — tests/test_audio_frontend.py)
        return _radix_log_mel(frames, spec)

    prec = jax.lax.Precision.HIGHEST
    dot = functools.partial(jnp.matmul, precision=prec)
    re = dot(frames, mats['drh']) + dot(frames, mats['drl'])
    im = dot(frames, mats['dih']) + dot(frames, mats['dil'])

    sqrt_fn = precise_sqrt if exact else jnp.sqrt
    if spec.power == 2.0:
        p = re * re + im * im
    else:
        p = sqrt_fn(re * re + im * im)

    if exact:
        mel = dot(p, mats['melh']) + dot(p, mats['mell'])
    else:
        mel = dot(p, mats['melh'])

    # TPU-native log is a ~1e-4 approximation; exact mode uses precise_log
    log_fn = precise_log if exact else jnp.log
    if spec.log_mode == 'offset':
        return log_fn(mel + spec.log_const)
    # 'eps': replace exact zeros by eps (reference audio.py:65-75); f32 mel of
    # real signals is non-negative, so clamp-from-below is equivalent & fuses.
    return log_fn(jnp.maximum(mel, spec.log_const))


def log_mel_512(y: jnp.ndarray, sr: int, exact: bool = True) -> jnp.ndarray:
    """librosa-parameterized log_mel_512 (reference audio.py:58-75)."""
    return log_mel(y, spec_log_mel_512(sr), exact=exact)


def log_mel_400(y: jnp.ndarray, exact: bool = True) -> jnp.ndarray:
    """log_mel_400 on 16 kHz input (resample on host first; reference
    audio.py:86-120)."""
    return log_mel(y, spec_log_mel_400(), exact=exact)


def vggish_log_mel(y: jnp.ndarray, exact: bool = True) -> jnp.ndarray:
    """VGGish 64-bin log-mel on 16 kHz input (reference mel_features.py:192-223)."""
    return log_mel(y, spec_vggish(), exact=exact)


# ---------------------------------------------------------------------------
# Silence / VAD (energy-based, jittable stand-in for webrtcvad)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=8)
def _silence_assignment(n_samples: int, fs_old: int, fs_new: int,
                        frame_ms: int) -> tuple[np.ndarray, int, int]:
    """Static (n_win, n_sub) row-normalized assignment of 10 ms sub-frames to
    1/fs_new-second windows, mirroring the reference's float window
    boundaries (audio.py:138-149)."""
    sub = fs_old * frame_ms // 1000
    step = fs_old / fs_new
    n_ranges = int(np.ceil(n_samples / step))        # np.arange(0, N, step)
    n_win = n_ranges - 1
    n_sub = n_samples // sub
    starts = np.arange(n_win) * step
    ends = starts + step
    sub_starts = np.arange(n_sub) * sub
    # sub-frame s belongs to window w when it fits wholly inside [start, end)
    a = ((sub_starts[None, :] >= starts[:, None])
         & (sub_starts[None, :] + sub <= ends[:, None])).astype(np.float32)
    a /= np.maximum(a.sum(axis=1, keepdims=True), 1.0)
    return a, n_win, n_sub


@functools.partial(jax.jit, static_argnames=('fs_old', 'fs_new', 'frame_ms'))
def silence_mask(y: jnp.ndarray, fs_old: int = 16000, fs_new: int = 15,
                 frame_ms: int = 10, energy_db_floor: float = -40.0
                 ) -> jnp.ndarray:
    """Silence detection in the reference's output format.

    The reference runs webrtcvad over 10 ms sub-frames of float-boundary
    1/15 s windows, marks a window silent when <=50% of sub-frames contain
    speech, and appends a literal 0 after every window entry
    (audio.py:129-172), so the stored `audio/silence` stream has TWO entries
    per window.  A GMM VAD is not TPU-representable; the speech decision here
    is a vectorized energy VAD (10 ms RMS above ``energy_db_floor`` dB
    relative to the clip peak).  Returns int32 (..., 2 * n_windows).
    """
    a, n_win, n_sub = _silence_assignment(y.shape[-1], fs_old, fs_new,
                                          frame_ms)
    sub = fs_old * frame_ms // 1000
    frames = y[..., :n_sub * sub].reshape(*y.shape[:-1], n_sub, sub)
    rms = jnp.sqrt(jnp.mean(frames * frames, axis=-1) + 1e-12)
    peak = jnp.max(rms, axis=-1, keepdims=True)
    is_speech = (20.0 * jnp.log10(rms / (peak + 1e-12) + 1e-12)
                 > energy_db_floor).astype(jnp.float32)
    frac = is_speech @ a.T                            # (..., n_win)
    silent = (frac <= 0.5).astype(jnp.int32)
    # interleave the reference's trailing zero per window
    out = jnp.stack([silent, jnp.zeros_like(silent)], axis=-1)
    return out.reshape(*silent.shape[:-1], 2 * n_win)
