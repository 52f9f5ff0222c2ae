"""Golden-value tests for the audio frontends.

Strategy per SURVEY.md §4: the float64 NumPy implementations in
:mod:`a2m.audio.mel_np` are the golden reference (reimplementing
`pats/data_loading/audio.py:58-120` and `pose_video/mel_features.py:21-223`);
the JAX XLA and Pallas paths must match within 1e-5 (BASELINE.json target).
"""

import numpy as np
import pytest

from a2m import constants
from a2m.audio import frontend, mel_np, pallas_mel

SR = 45600
PARITY_TOL = 1e-5


@pytest.fixture(scope='module')
def clip():
    rng = np.random.default_rng(42)
    return (rng.standard_normal(int(SR * 4.3)) * 0.1).astype(np.float64)


@pytest.fixture(scope='module')
def clip16(clip):
    # kaiser_best: the reference's librosa resampler (audio.py:88) — the
    # golden log_mel_400/vggish paths and the frontends share it
    return mel_np.resample(clip, SR, 16000)


# ---------------------------------------------------------------------------
# NumPy golden self-consistency
# ---------------------------------------------------------------------------

def test_periodic_hann_endpoints():
    w = mel_np.periodic_hann(400)
    assert w[0] == 0.0
    assert w[200] == pytest.approx(1.0)
    # periodic: w[k] == w[N-k] for k>0, and w does NOT end at 0 symmetric-style
    assert w[1] == pytest.approx(w[399])


def test_frame_counts():
    x = np.arange(1000.0)
    f = mel_np.frame(x, 400, 160)
    assert f.shape == (1 + (1000 - 400) // 160, 400)
    np.testing.assert_array_equal(f[1], x[160:560])


def test_htk_mel_matrix_properties():
    m = mel_np.mel_matrix_htk(64, 257, 16000, 125.0, 7500.0)
    assert m.shape == (257, 64)
    assert m[0].sum() == 0.0          # DC bin excluded
    assert (m >= 0).all()
    # every mel band has some support
    assert (m.sum(axis=0) > 0).all()


def test_slaney_mel_matrix_properties():
    m = mel_np.mel_matrix_slaney(128, 2048, SR)
    assert m.shape == (128, 1025)
    assert (m >= 0).all()
    assert (m.sum(axis=1) > 0).all()
    # slaney normalization: filters integrate to ~2/bandwidth; peak < 1
    assert m.max() < 1.0
    # unnormalized variant peaks at ~1
    m2 = mel_np.mel_matrix_slaney(64, 512, 16000, fmin=125., fmax=7500.,
                                  norm=None)
    assert 0.5 < m2.max() <= 1.0


def test_golden_shapes(clip, clip16):
    g512 = mel_np.log_mel_512(clip, SR)
    assert g512.shape[1] == constants.MEL_FEATS_512
    # centered STFT: 1 + N // hop frames
    assert g512.shape[0] == 1 + len(clip) // 512
    g400 = mel_np.log_mel_400(clip, SR)
    assert g400.shape[1] == constants.MEL_FEATS_400
    gv = mel_np.vggish_log_mel(clip16)
    assert gv.shape[1] == 64


def test_window_arithmetic_matches_reference():
    # dataUtils.py:585-620 arithmetic: 4.3 s of log_mel_512 at fs=89 resampled
    # to fs_new=15 by stride-6 slicing yields 64 rows == FRAMES_PER_WINDOW
    fs = constants.AUDIO_FS_MAP['log_mel_512']
    assert fs == 89
    window = int(4.3 * fs)
    ratio = round(fs / 15)
    assert window == 382 and ratio == 6
    assert len(range(0, window, ratio)) == constants.FRAMES_PER_WINDOW


# ---------------------------------------------------------------------------
# JAX XLA parity vs golden
# ---------------------------------------------------------------------------

def test_log_mel_512_parity(clip):
    g = mel_np.log_mel_512(clip, SR)
    j = np.asarray(frontend.log_mel_512(clip.astype(np.float32), SR))
    assert j.shape == g.shape
    assert np.abs(g - j).max() < PARITY_TOL


def test_log_mel_400_parity(clip, clip16):
    g = mel_np.log_mel_400(clip, SR)
    j = np.asarray(frontend.log_mel_400(clip16.astype(np.float32)))
    n = min(len(g), len(j))
    assert abs(len(g) - len(j)) <= 1
    assert np.abs(g[:n] - j[:n]).max() < PARITY_TOL


def test_vggish_parity(clip16):
    g = mel_np.vggish_log_mel(clip16)
    j = np.asarray(frontend.vggish_log_mel(clip16.astype(np.float32)))
    n = min(len(g), len(j))
    assert np.abs(g[:n] - j[:n]).max() < PARITY_TOL


def test_batched_matches_single(clip16):
    y = np.stack([clip16, clip16 * 0.5]).astype(np.float32)
    b = np.asarray(frontend.vggish_log_mel(y))
    s0 = np.asarray(frontend.vggish_log_mel(y[0]))
    # batched matmuls may reassociate differently from single-row ones
    np.testing.assert_allclose(b[0], s0, atol=1e-5)


def test_tonal_parity_within_dynamic_range(clip):
    # Pure tones have spectral nulls below the f32 noise floor where no f32
    # pipeline can match a float64 log; parity is asserted for bins within
    # ~120 dB of the clip's mel peak (the f32-meaningful domain).
    t = np.linspace(0, 4.3, int(SR * 4.3))
    y = 0.3 * np.sin(2 * np.pi * 220 * t) * (1 + 0.5 * np.sin(2 * np.pi * 3 * t))
    g = mel_np.log_mel_512(y, SR)
    j = np.asarray(frontend.log_mel_512(y.astype(np.float32), SR))
    mel_g = np.exp(g)
    mask = mel_g > 1e-6 * mel_g.max()
    assert np.abs(g - j)[mask].max() < 5e-5


def test_fast_mode_close(clip):
    g = mel_np.log_mel_512(clip, SR)
    j = np.asarray(frontend.log_mel_512(clip.astype(np.float32), SR,
                                        exact=False))
    # fast mode trades ~1e-4 accuracy for throughput
    assert np.abs(g - j).max() < 5e-3


# ---------------------------------------------------------------------------
# Pallas kernel parity (interpret mode on CPU; compiled on TPU)
# ---------------------------------------------------------------------------

def test_pallas_512_matches_xla(clip):
    y = clip.astype(np.float32)[None]
    x = np.asarray(frontend.log_mel_512(y, SR, exact=False))
    p = np.asarray(pallas_mel.pallas_log_mel_512(y, SR))
    assert p.shape == x.shape
    assert np.abs(p - x).max() < 1e-4


def test_pallas_vggish_exact_parity(clip16):
    y = clip16.astype(np.float32)[None]
    g = mel_np.vggish_log_mel(clip16)
    p = np.asarray(pallas_mel.pallas_vggish_log_mel(y, exact=True))[0]
    n = min(len(g), len(p))
    assert np.abs(g[:n] - p[:n]).max() < PARITY_TOL


def test_pallas_log_mel_400_exact_parity(clip, clip16):
    g = mel_np.log_mel_400(clip, SR)
    p = np.asarray(pallas_mel.pallas_log_mel_400(
        clip16.astype(np.float32)[None], exact=True))[0]
    n = min(len(g), len(p))
    assert np.abs(g[:n] - p[:n]).max() < PARITY_TOL


def test_pallas_512_exact_parity(clip):
    """Exact mode now covers n_fft=2048 by streaming 128-wide K-tiles of
    the hi/lo DFT pairs (VERDICT r1 #3).  Short clip: interpret mode."""
    short = clip[:SR]                       # 1 s keeps CPU interpret fast
    g = mel_np.log_mel_512(short, SR)
    p = np.asarray(pallas_mel.pallas_log_mel_512(
        short.astype(np.float32)[None], SR, exact=True))[0]
    n = min(len(g), len(p))
    assert np.abs(g[:n] - p[:n]).max() < PARITY_TOL


# ---------------------------------------------------------------------------
# VAD: GMM (host preprocessing) vs energy (on-device) decision fixtures
# ---------------------------------------------------------------------------

def _speech_like(seconds=4.0, sr=16000, seed=0):
    """Synthetic speech-like fixture with known voiced/silent windows:
    harmonic bursts with pitch glide + amplitude modulation over a -50 dB
    noise floor.  Returns (y, voiced) with voiced (n_15hz_windows,) truth."""
    rng = np.random.default_rng(seed)
    n = int(seconds * sr)
    t = np.arange(n) / sr
    # voiced in [0.5, 1.5) and [2.2, 3.4)
    voiced_mask = ((t >= 0.5) & (t < 1.5)) | ((t >= 2.2) & (t < 3.4))
    f0 = 120 + 30 * np.sin(2 * np.pi * 0.7 * t)
    y = np.zeros(n)
    for h in (1, 2, 3, 4):
        y += np.sin(2 * np.pi * h * np.cumsum(f0) / sr) / h
    y *= voiced_mask * (0.6 + 0.4 * np.sin(2 * np.pi * 3.1 * t))
    y += rng.standard_normal(n) * 3e-3
    step = sr / 15
    ranges = np.arange(0, n, step)
    truth = np.array([voiced_mask[int(s):int(e)].mean() > 0.5
                      for s, e in zip(ranges[:-1], ranges[1:])])
    return y.astype(np.float64), truth


def test_gmm_vad_matches_ground_truth():
    """The GMM VAD (webrtcvad stand-in) recovers the known voiced windows."""
    from a2m.audio import vad
    y, truth = _speech_like()
    stream = vad.silence_stream(y.astype(np.float32))
    assert stream.shape == (2 * len(truth),)
    assert (stream[1::2] == 0).all()        # interleaved trailing zeros
    silent = stream[0::2].astype(bool)
    acc = (silent == ~truth).mean()
    assert acc >= 0.9, f'GMM VAD accuracy {acc:.2f} vs ground truth'


def test_gmm_vad_constant_signal_no_nan():
    """Constant-energy audio has no bimodal structure: the GMM must fall
    back to an absolute-level rule instead of fitting NaN means."""
    import warnings
    from a2m.audio import vad
    for y, want_silent in ((np.zeros(16000, np.float32), True),
                           (np.full(16000, 0.5, np.float32), False)):
        with warnings.catch_warnings():
            warnings.simplefilter('error')      # NaN-mean raises here
            stream = vad.silence_stream(y)
        assert np.isfinite(stream).all()
        silent = stream[0::2].astype(bool)
        assert silent.all() == want_silent and silent.any() == want_silent


def test_silence_stream_honors_frame_ms():
    """The window aggregation steps by the actual sub-frame length."""
    from a2m.audio import vad
    y, _ = _speech_like()
    s10 = vad.silence_stream(y.astype(np.float32), frame_ms=10)
    s20 = vad.silence_stream(y.astype(np.float32), frame_ms=20)
    assert s10.shape == s20.shape              # same 1/15 s window count
    n = len(s10) // 2
    agree = (s10[0::2] == s20[0::2]).mean()
    assert agree > 0.9                         # coarser frames, same calls


def test_audio_modality_silence_uses_gmm_vad():
    """The preprocessing `audio/silence` channel routes through the GMM VAD
    (host-side, webrtcvad-grade), matching its decisions exactly."""
    from a2m.audio import mel_np, vad
    from a2m.data.modalities import Audio
    y, truth = _speech_like(sr=45600)
    a = Audio.__new__(Audio)                 # silence() uses no init state
    got = a.silence(y, 45600)
    y16 = mel_np.resample(y.astype(np.float64), 45600,
                          16000).astype(np.float32)
    np.testing.assert_array_equal(got, vad.silence_stream(y16))
    silent = got[0::2].astype(bool)
    n = min(len(silent), len(truth))
    assert (silent[:n] == ~truth[:n]).mean() >= 0.9


def test_energy_vad_vs_gmm_vad_agreement():
    """Bound the documented deviation: the jittable energy VAD's decisions
    vs the GMM VAD on the speech-like fixture (PARITY.md records this)."""
    from a2m.audio import vad
    y, truth = _speech_like()
    gmm = vad.silence_stream(y.astype(np.float32))[0::2].astype(bool)
    energy = np.asarray(frontend.silence_mask(
        y.astype(np.float32)))[0::2].astype(bool)
    n = min(len(gmm), len(energy))
    agree = (gmm[:n] == energy[:n]).mean()
    acc_energy = (energy[:len(truth)] == ~truth[:len(energy)]).mean()
    assert agree >= 0.85, f'energy-vs-GMM agreement {agree:.2f}'
    assert acc_energy >= 0.85, f'energy VAD accuracy {acc_energy:.2f}'


# ---------------------------------------------------------------------------
# resampler drift bound (scipy polyphase vs ideal band-limited golden)
# ---------------------------------------------------------------------------

def test_resample_drift_through_log_mel_400():
    """Quantify the resampler's contribution to feature drift: polyphase
    FIR vs an ideal FFT (band-limited sinc) resample of band-limited noise,
    both through log_mel_400.  librosa (unavailable here) is also a
    windowed-sinc polyphase resampler, so this bounds the same class of
    deviation (PARITY.md records the number)."""
    rng = np.random.default_rng(7)
    sr, dur = 45600, 2.0
    n = int(sr * dur)
    # band-limit white noise to < 7.6 kHz so 16 kHz resampling is alias-free
    spec = np.fft.rfft(rng.standard_normal(n))
    freqs = np.fft.rfftfreq(n, 1 / sr)
    spec[freqs > 7600] = 0.0
    y = np.fft.irfft(spec, n)
    y *= 0.1 / np.abs(y).max()

    poly = mel_np.resample_poly(y, sr, 16000)
    n16 = int(len(y) * 16000 / sr)
    ideal = np.fft.irfft(np.fft.rfft(y)[:n16 // 2 + 1], n16) * (16000 / sr)

    m_poly = mel_np.log_mel_400(poly[:len(ideal)].astype(np.float64), 16000)
    m_ideal = mel_np.log_mel_400(ideal.astype(np.float64), 16000)
    t = min(len(m_poly), len(m_ideal))
    drift = np.abs(m_poly[:t] - m_ideal[:t]).max()
    # log-mel features are stable to resampler choice within ~0.15 nats
    # (interior frames; FIR edge transients excluded)
    interior = np.abs(m_poly[2:t - 2] - m_ideal[2:t - 2]).max()
    assert interior < 0.15, f'resampler drift {interior:.3f} nats'
    assert np.isfinite(drift)


# ---------------------------------------------------------------------------
# precise ops
# ---------------------------------------------------------------------------

def test_precise_log():
    import jax
    from a2m.ops.precise import precise_log
    x = np.exp(np.linspace(-25, 10, 10000)).astype(np.float32)
    out = np.asarray(jax.jit(precise_log)(x))
    assert np.abs(out - np.log(x.astype(np.float64))).max() < 5e-6


def test_precise_sqrt():
    import jax
    from a2m.ops.precise import precise_sqrt
    x = np.exp(np.linspace(-20, 20, 10000)).astype(np.float32)
    out = np.asarray(jax.jit(precise_sqrt)(x))
    rel = np.abs(out - np.sqrt(x.astype(np.float64))) / np.sqrt(x)
    assert rel.max() < 1e-6


def test_silence_mask_shape(clip16):
    m = np.asarray(frontend.silence_mask(clip16.astype(np.float32)))
    # reference format: (n_windows - 1 per arange) * 2 entries
    # (audio.py:138-171): ceil(N / (16000/15)) - 1 windows, 2 entries each
    n_win = int(np.ceil(len(clip16) / (16000 / 15))) - 1
    assert m.shape[-1] == 2 * n_win
    assert set(np.unique(m)).issubset({0, 1})
    # interleaved zeros at odd positions
    assert (m[1::2] == 0).all()


def test_radix_fast_path_parity(clip, clip16):
    """exact=False now runs the two-stage radix DFT (frontend.radix_matrices)
    — 8x fewer MACs than the direct windowed-DFT; parity with the float64
    golden stays within ~2x the exact path's tolerance."""
    g = mel_np.log_mel_512(clip, SR)
    j = np.asarray(frontend.log_mel_512(clip.astype(np.float32), SR,
                                        exact=False))
    assert j.shape == g.shape
    assert np.abs(g - j).max() < 5e-5

    gv = mel_np.vggish_log_mel(clip16)
    jv = np.asarray(frontend.vggish_log_mel(clip16.astype(np.float32),
                                            exact=False))
    n = min(len(gv), len(jv))
    assert np.abs(gv[:n] - jv[:n]).max() < 5e-5


def test_kaiser_best_vs_ideal_bandlimited():
    """The kaiser_best resampler (librosa's algorithm, reference
    audio.py:88) against the analytic band-limited ideal: interior error
    must be orders of magnitude below the scipy-polyphase drift bound
    (VERDICT r3 item 10) — both raw and through log_mel_400."""
    rng = np.random.default_rng(7)
    sr, dur = 45600, 2.0
    n = int(sr * dur)
    spec = np.fft.rfft(rng.standard_normal(n))
    freqs = np.fft.rfftfreq(n, 1 / sr)
    # band-limit inside the kaiser_best passband (rolloff 0.9476 * 8 kHz)
    spec[freqs > 7000] = 0.0
    y = np.fft.irfft(spec, n)
    y *= 0.1 / np.abs(y).max()

    kb = mel_np.resample_kaiser_best(y, sr, 16000)
    n16 = int(len(y) * 16000 / sr)
    ideal = np.fft.irfft(np.fft.rfft(y)[:n16 // 2 + 1], n16) * (16000 / sr)
    m = min(len(kb), len(ideal))
    pad = 200                        # windowed-sinc edge transients
    raw_err = np.abs(kb[pad:m - pad] - ideal[pad:m - pad]).max()
    assert raw_err < 2e-4, f'raw kaiser_best error {raw_err:.2e}'

    m_kb = mel_np.log_mel_400(kb[:m].astype(np.float64), 16000,
                              resample_method='polyphase')
    m_ideal = mel_np.log_mel_400(ideal[:m].astype(np.float64), 16000,
                                 resample_method='polyphase')
    t = min(len(m_kb), len(m_ideal))
    interior = np.abs(m_kb[2:t - 2] - m_ideal[2:t - 2]).max()
    # scipy polyphase measured 0.096 nats on this bound (round 3);
    # kaiser_best must be far tighter
    assert interior < 5e-3, f'kaiser_best feature drift {interior:.2e} nats'


def test_kaiser_best_tone_and_lengths():
    """Pure-tone fidelity + output-length contract ceil(n * ratio), up and
    down, non-rational ratios included."""
    sr = 45600
    t = np.arange(int(sr * 1.0)) / sr
    y = np.sin(2 * np.pi * 440.0 * t)
    for target in (16000, 15963, 89000):
        out = mel_np.resample_kaiser_best(y, sr, target)
        assert len(out) == int(np.ceil(len(y) * target / sr))
        tt = np.arange(len(out)) / target
        want = np.sin(2 * np.pi * 440.0 * tt)
        pad = 200
        err = np.abs(out[pad:-pad] - want[pad:len(out) - pad]).max()
        assert err < 2e-4, (target, err)
    # identity
    np.testing.assert_array_equal(mel_np.resample_kaiser_best(y, sr, sr), y)


# ---------------------------------------------------------------------------
# Framed serving wire format (client-side framing)
# ---------------------------------------------------------------------------


def test_frame_for_wire_bitwise_parity(clip):
    """log_mel_frames(frame_for_wire(y)) == log_mel(y) bit-for-bit, for f32
    and int16 PCM, on the pose-rate strided spec (hop > frame_len, where
    the framed wire drops the unread third of the samples)."""
    spec = frontend.strided_spec(frontend.spec_log_mel_512(SR), 6)
    y32 = clip.astype(np.float32)
    ref = np.asarray(frontend.log_mel(y32, spec, exact=False))
    fr = frontend.frame_for_wire(y32, spec)
    assert fr.shape == (ref.shape[0], 2048)
    # the wire is strictly smaller than the waveform (the capability)
    assert fr.nbytes < y32.nbytes
    out = np.asarray(frontend.log_mel_frames(fr, spec, exact=False))
    np.testing.assert_array_equal(out, ref)

    y16 = (y32 * 32767).astype(np.int16)
    ref16 = np.asarray(frontend.log_mel(y16, spec, exact=False))
    fr16 = frontend.frame_for_wire(y16, spec)
    assert fr16.dtype == np.int16
    out16 = np.asarray(frontend.log_mel_frames(fr16, spec, exact=False))
    np.testing.assert_array_equal(out16, ref16)


def test_frame_for_wire_zero_tail_matches_frame_signal(clip):
    """When an explicit n_frames overruns the padded signal (the
    fixed-window serving shape), frame_for_wire's constant tail reproduces
    frame_signal's zero tail exactly."""
    spec = frontend.strided_spec(frontend.spec_log_mel_512(SR), 6)
    n = 5 * 3072 + 3000                       # 6 natural frames
    y = clip[:n].astype(np.float32)
    ref = np.asarray(frontend.log_mel(y, spec, exact=False, n_frames=8))
    out = np.asarray(frontend.log_mel_frames(
        frontend.frame_for_wire(y, spec, n_frames=8), spec, exact=False))
    np.testing.assert_array_equal(out, ref)
