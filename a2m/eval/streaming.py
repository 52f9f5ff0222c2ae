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
    fixed-size chunks (one static-shape executable regardless of W).

    All chunks are DISPATCHED before any device->host transfer: jax's async
    dispatch pipelines the chunk executions, so the per-call round-trip
    latency (23 ms on the tunneled sandbox backend) is paid once, not per
    chunk."""
    outs, counts = [], []
    for i in range(0, len(windows), batch_size):
        chunk = windows[i:i + batch_size]
        n = len(chunk)
        if n < batch_size:
            chunk = np.pad(chunk, ((0, batch_size - n), (0, 0), (0, 0)))
        outs.append(apply(variables, jnp.asarray(chunk, jnp.float32)))
        counts.append(n)
    return np.concatenate([np.asarray(o)[:n] for o, n in zip(outs, counts)],
                          axis=0)


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


def _pose_rate_spec(sr: int, method: str = 'log_mel_512'):
    """Pose-rate (15 fps) mel spec for any frontend family.

    The stride that the training loader applies by slicing
    (``round(feature_fs / POSE_FPS)``, dataUtils.py:585-620 semantics) is
    folded into the hop so only kept frames are computed.  The 400
    family (log_mel_400 / VGGish, reference audio.py:86-120 /
    mel_features.py:192-223) is defined on 16 kHz input — callers with
    other rates resample on host first (``a2m.audio.mel_np.resample``,
    kaiser_best like the reference), exactly as the training modality does
    (a2m/data/modalities.py:171-183)."""
    from a2m.audio import frontend
    if method == 'log_mel_512':
        fs = constants.AUDIO_FS_MAP['log_mel_512']
        spec = frontend.spec_log_mel_512(sr)
    elif method in ('log_mel_400', 'vggish'):
        spec = (frontend.spec_log_mel_400() if method == 'log_mel_400'
                else frontend.spec_vggish())
        if sr != spec.sr:
            raise ValueError(
                f'{method} streaming expects {spec.sr} Hz input (reference '
                f'audio.py:86-120 resamples first); got sr={sr}. Resample '
                f'on host with a2m.audio.mel_np.resample(y, sr, 16000).')
        fs = constants.AUDIO_FS_MAP['log_mel_400']
    else:
        raise ValueError(f'unknown streaming method {method!r} (have: '
                         f'log_mel_512, log_mel_400, vggish)')
    stride = round(fs / constants.POSE_FPS)
    # stride folded into the hop: compute only pose-rate frames (equal to
    # [::stride] of the full feature grid, stride-x less frontend work)
    return frontend.strided_spec(spec, stride)


def _waveform_features(waveform: np.ndarray, sr: int,
                       method: str = 'log_mel_512') -> np.ndarray:
    from a2m.audio import frontend
    return np.asarray(frontend.log_mel(
        jnp.asarray(waveform), _pose_rate_spec(sr, method), exact=False))


def _waveform_features_grouped(waveforms, sr: int,
                               method: str = 'log_mel_512') -> list:
    """Feature extraction for S streams with as few device calls as
    possible: streams of equal sample count share ONE batched log_mel call
    (equal-length grouping keeps the centered reflect padding exact — zero-
    padding unequal streams to a common length would perturb their last
    window)."""
    from a2m.audio import frontend
    spec = _pose_rate_spec(sr, method)
    groups: dict[int, list[int]] = {}
    for i, w in enumerate(waveforms):
        groups.setdefault(int(np.shape(w)[-1]), []).append(i)
    feats: list = [None] * len(waveforms)
    outs = []
    for idxs in groups.values():
        stack = jnp.stack([jnp.asarray(waveforms[i]) for i in idxs])
        outs.append((idxs, frontend.log_mel(stack, spec, exact=False)))
    for idxs, out in outs:               # d2h after ALL dispatches
        out = np.asarray(out)
        for j, i in enumerate(idxs):
            feats[i] = out[j]
    return feats


# -- serving wire formats ---------------------------------------------------
#
# The sandbox's host->device transport is the bottleneck for end-to-end
# multi-stream serving (8 x 60 s of f32 samples = 87.6 MB vs ~0.08 s of
# device compute), so the wire format is a first-class serving knob:
# int16 PCM halves the bytes (log_mel scales integer input on device —
# a2m/audio/frontend.py:301-306), and 8-bit mu-law (the G.711 telephony
# companding curve, continuous form) quarters them with speech-grade
# fidelity; both decode on device inside the fused pipeline.

ULAW_MU = 255.0


def encode_ulaw(x: np.ndarray) -> np.ndarray:
    """float samples in [-1, 1] -> uint8 mu-law codes (host-side, client)."""
    x = np.clip(np.asarray(x, np.float32), -1.0, 1.0)
    y = np.sign(x) * np.log1p(ULAW_MU * np.abs(x)) / np.log1p(ULAW_MU)
    return np.round((y + 1.0) * 127.5).astype(np.uint8)


def decode_ulaw(codes: jnp.ndarray) -> jnp.ndarray:
    """uint8 mu-law codes -> float32 samples (device-side, in-pipeline)."""
    y = codes.astype(jnp.float32) / np.float32(127.5) - 1.0
    return jnp.sign(y) * (jnp.expm1(jnp.abs(y) * np.float32(
        np.log1p(ULAW_MU))) / np.float32(ULAW_MU))


def _decode_wire(waves: jnp.ndarray, encoding: str) -> jnp.ndarray:
    """Trace-time wire decode: mu-law uint8 -> f32 here; integer PCM passes
    through (log_mel scales it on device); float passes through."""
    if encoding == 'ulaw':
        if waves.dtype != jnp.uint8:
            raise ValueError(f'ulaw wire format is uint8, got {waves.dtype}')
        return decode_ulaw(waves)
    if encoding != 'linear':
        raise ValueError(f"unknown wire encoding {encoding!r} "
                         f"(have: 'linear', 'ulaw')")
    return waves


def _blend_matrix(starts: np.ndarray, n_frames: int,
                  window: int) -> np.ndarray:
    """The host-side :func:`blend` overlap-add as ONE static (T, W*window)
    matrix: ``out = M @ pred.reshape(W*window, F)``.  Triangular crossfade
    weights with the per-frame normalization folded in, so the whole blend
    becomes a single MXU matmul inside the fused pipeline."""
    w = np.minimum(np.arange(1, window + 1),
                   np.arange(window, 0, -1)).astype(np.float64)
    m = np.zeros((n_frames, len(starts) * window))
    for wi, s in enumerate(starts):
        n = min(window, n_frames - int(s))
        rows = np.arange(s, s + n)
        m[rows, wi * window + np.arange(n)] = w[:n]
    m /= np.maximum(m.sum(axis=1, keepdims=True), 1e-9)
    return m.astype(np.float32)


def frame_streams_for_wire(waveforms, sr: int, method: str = 'log_mel_512',
                           encoding: str = 'linear') -> list[np.ndarray]:
    """CLIENT-side prep for the FRAMED wire format.

    At pose rate the strided STFT hop (3072 samples) exceeds the frame
    length (2048), so a third of every waveform is never read by the
    frontend.  This helper cuts each stream into exactly the
    (T, frame_len) sample frames the device consumes
    (:func:`a2m.audio.frontend.frame_for_wire` — same centered reflect
    padding and hop grid, bit-identical features), dropping the unread
    bytes before they ever hit the wire: 1.5x fewer host->device bytes on
    top of the sample encoding (f32/int16 pass through; ``'ulaw'``
    mu-law-encodes the frames to uint8).  Feed the result to
    :func:`stream_from_waveforms` with ``framed_n_samples=<original
    per-stream sample count>``.
    """
    spec = _pose_rate_spec(sr, method)
    from a2m.audio import frontend
    out = []
    for w in waveforms:
        w = np.asarray(w)
        if encoding == 'ulaw':
            # encode-then-frame: mu-law is elementwise, so it commutes with
            # the reflect padding/gather; 128 is the closest code to a zero
            # sample (decodes to 8.6e-5) for any zero tail
            out.append(frontend.frame_for_wire(encode_ulaw(w), spec,
                                               tail_value=128))
        elif encoding == 'linear':
            out.append(frontend.frame_for_wire(w, spec))
        else:
            raise ValueError(f'unknown wire encoding {encoding!r}')
    return out


@functools.lru_cache(maxsize=8)
def _fused_pipeline(generator, sr: int, method: str, n_samples: int,
                    window: int, hop: int, encoding: str = 'linear',
                    framed: bool = False):
    """ONE jitted device program per (S is dynamic via shape, n_samples):
    (S, n_samples) waveforms -> (S, T, 104) poses.

    Frontend, static-index windowing, generator forward (batch S*W), and
    the crossfade blend (as a precomputed matmul, :func:`_blend_matrix`)
    all run on-device in a single call — no per-stage host round trips.
    This is the serving path: on the tunneled sandbox backend each synced
    call costs ~23 ms RTT and intermediate d2h/h2d rides a ~35 MB/s link,
    so collapsing frontend->windows->forward->blend into one program is
    worth more than any kernel-level win (measured: 8x60 s streams went
    from 3.22 s chunked-with-host-blend to one call + one (S,T,104) d2h).
    """
    from a2m.audio import frontend

    spec = _pose_rate_spec(sr, method)
    t = jax.eval_shape(
        lambda y: frontend.log_mel(y, spec, exact=False),
        jax.ShapeDtypeStruct((n_samples,), jnp.float32)).shape[0]
    starts = window_starts(t, window, hop)
    idx = np.minimum(starts[:, None] + np.arange(window)[None, :], t - 1)
    blend_m = jnp.asarray(_blend_matrix(starts, t, window))
    idx = jnp.asarray(idx)

    @jax.jit
    def run(variables, waves):
        waves = _decode_wire(waves, encoding)
        if framed:   # (S, T, frame_len) pre-framed wire -> (S, T, 128)
            feats = frontend.log_mel_frames(waves, spec, exact=False)
        else:
            feats = frontend.log_mel(waves, spec, exact=False)  # (S, T, 128)
        wins = jnp.take(feats, idx, axis=1)          # (S, W, window, 128)
        s, w_n = wins.shape[0], wins.shape[1]
        pred = generator.apply(
            variables, wins.reshape(s * w_n, window, feats.shape[-1]),
            train=False)                              # (S*W, window, 104)
        flat = pred.reshape(s, w_n * window, pred.shape[-1])
        return jnp.einsum('tk,skf->stf', blend_m, flat)      # (S, T, 104)

    return run


def stream_from_waveform(generator, variables, waveform: np.ndarray,
                         sr: int, method: str = 'log_mel_512',
                         hop: int = 32, batch_size: int = 64,
                         fused: bool = False) -> np.ndarray:
    """Raw audio of any length -> (T_pose, 104) pose via the TPU frontend +
    windowed generator.

    ``fused=False`` (default) chunks windows through ONE compiled forward
    regardless of audio length; ``fused=True`` compiles one whole-pipeline
    program per waveform length (fastest for a recurring length, e.g.
    fixed-duration serving chunks — see :func:`_fused_pipeline`)."""
    if fused:
        return stream_from_waveforms(generator, variables, [waveform], sr,
                                     method, hop, batch_size, fused=True)[0]
    feats = _waveform_features(waveform, sr, method)
    return stream_poses(generator, variables, feats, hop=hop,
                        batch_size=batch_size)


def stream_from_waveforms(generator, variables, waveforms, sr: int,
                          method: str = 'log_mel_512', hop: int = 32,
                          batch_size: int = 64,
                          fused: str | bool = 'auto',
                          encoding: str = 'linear',
                          pipeline_groups: int = 1,
                          framed_n_samples: int | None = None
                          ) -> list[np.ndarray]:
    """S raw audio streams -> S pose streams.

    ``fused='auto'`` (default): when every stream has the same sample
    count — the common serving shape — the whole batch runs as ONE device
    program (frontend + windows + forward + blend, :func:`_fused_pipeline`);
    otherwise streams group into per-length batched frontend calls and
    share one chunked window batch (:func:`stream_poses_multi`).

    Wire format: waveforms may be f32, int16/int32 PCM (scaled on device —
    half the host->device bytes), or uint8 mu-law with ``encoding='ulaw'``
    (quarter the bytes); arrays may also already live on device.

    ``pipeline_groups=G`` (fused path) splits the stream batch into G
    equal groups and overlaps group i+1's host->device upload with group
    i's compute: every upload is issued asynchronously up front, compute
    dispatches follow, and results drain in order.  Useful when the
    host->device link, not the chip, bounds serving (each group compiles
    its own S/G-shape executable — pick a fixed G per serving config).

    ``framed_n_samples=N``: the streams are pre-framed (T, frame_len) wire
    arrays from :func:`frame_streams_for_wire` for original N-sample
    streams (the fixed serving chunk size) — 1.5x fewer h2d bytes, same
    features."""
    window = constants.FRAMES_PER_WINDOW
    if framed_n_samples is not None:
        from a2m.audio import frontend
        spec = _pose_rate_spec(sr, method)
        frame_len = frontend.dft_matrices(spec)['frame_len']
        shapes = {np.shape(w)[-2:] for w in waveforms}
        if len(shapes) != 1 or next(iter(shapes))[-1] != frame_len:
            raise ValueError(
                f'framed wire expects equal (T, {frame_len}) frame stacks '
                f'(frame_streams_for_wire); got shapes {sorted(shapes)}')
        run = _fused_pipeline(generator, sr, method, framed_n_samples,
                              window, hop, encoding, framed=True)
        n, lens = framed_n_samples, {framed_n_samples}
        fused = True
    else:
        lens = {int(np.shape(w)[-1]) for w in waveforms}
    if fused is True or (fused == 'auto' and len(lens) == 1):
        if len(lens) != 1:
            raise ValueError('fused=True needs equal-length streams; got '
                             f'lengths {sorted(lens)}')
        if framed_n_samples is None:
            n = lens.pop()
            run = _fused_pipeline(generator, sr, method, n, window, hop,
                                  encoding)
        s = len(waveforms)
        g = max(1, min(pipeline_groups, s))
        if s % g:
            raise ValueError(f'pipeline_groups={g} must divide the '
                             f'{s}-stream batch')
        per = s // g
        stacks = [np.stack([np.asarray(w)
                            for w in waveforms[i * per:(i + 1) * per]])
                  for i in range(g)]
        # all uploads issued (async) before any compute dispatch; the
        # runtime streams group k+1's bytes while group k computes
        staged = [jax.device_put(st) for st in stacks]
        outs = [run(variables, st) for st in staged]
        return [p for o in outs for p in np.asarray(o)]
    if encoding != 'linear':
        raise ValueError('non-linear wire encodings are decoded in the '
                         'fused pipeline; equal-length streams required')
    feats = _waveform_features_grouped(waveforms, sr, method)
    return stream_poses_multi(generator, variables, feats, hop=hop,
                              batch_size=batch_size)
