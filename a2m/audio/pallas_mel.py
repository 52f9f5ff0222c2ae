"""Fused Pallas TPU kernel for the log-mel frontend.

One kernel performs frame -> window -> DFT -> power -> mel -> log without
materializing frames or the (T, n_fft/2+1) spectrogram in HBM:

* the waveform lives in VMEM as hop-sized chunks; a frame block is assembled
  by concatenating shifted chunk slices (no gathers);
* the windowed DFT and the mel projection are MXU matmuls over K-tiles, with
  the mel accumulation running across a ``k`` grid dimension so the
  spectrogram never leaves VMEM;
* the final ``k`` step applies the (precise) log in-place.

HBM traffic is therefore one waveform read + one (T, n_mels) write — the
speed-of-light for this op.  Accuracy modes match
:mod:`a2m.audio.frontend`: ``exact=True`` adds hi/lo-split DFT/mel matmuls
and precise log/sqrt (<=1e-5 parity; only offered when the matrices fit
VMEM, i.e. n_fft <= 512), ``exact=False`` is the single-f32 fast path.

Reference behavior: `pats/data_loading/audio.py:58-120`,
`pose_video/mel_features.py:192-223`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from a2m.audio import frontend as fe
from a2m.ops.precise import precise_log, precise_sqrt

FRAME_BLOCK = 128


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@functools.lru_cache(maxsize=16)
def _padded_matrices(spec: fe.MelSpec, k_tile: int, exact: bool):
    """DFT/mel matrices zero-padded so K is a multiple of k_tile and n_mels a
    multiple of 128.  Padded DFT columns are zero => padded power bins are
    zero => no contribution through (zero-padded) mel rows."""
    mats = fe.dft_matrices(spec)
    K = mats['K']
    k_pad = _round_up(K, k_tile)
    m_pad = _round_up(spec.n_mels, 128)

    def padk(m):  # (frame_len, K) -> (frame_len, k_pad)
        return np.pad(m, ((0, 0), (0, k_pad - K)))

    def padmel(m):  # (K, M) -> (k_pad, m_pad)
        return np.pad(m, ((0, k_pad - K), (0, m_pad - spec.n_mels)))

    out = dict(frame_len=mats['frame_len'], k_pad=k_pad, m_pad=m_pad,
               drh=padk(mats['drh']), dih=padk(mats['dih']),
               melh=padmel(mats['melh']))
    if exact:
        out.update(drl=padk(mats['drl']), dil=padk(mats['dil']),
                   mell=padmel(mats['mell']))
    return out


def _kernel(chunks_ref, drh_ref, dih_ref, melh_ref, *rest, power, log_mode,
            log_const, exact, hop, frame_len, n_k):
    if exact:
        drl_ref, dil_ref, mell_ref, out_ref, frames = rest
    else:
        out_ref, frames = rest
    k = pl.program_id(2)

    q, r = frame_len // hop, frame_len % hop

    @pl.when(k == 0)
    def _build_frames():
        f = pl.program_id(1)
        row0 = pl.multiple_of(f * FRAME_BLOCK, FRAME_BLOCK)
        # one aligned ref read, then compile-time-offset value slices
        reg_rows = FRAME_BLOCK + _round_up(q + 1, 8)
        region = chunks_ref[0, pl.ds(row0, reg_rows), :]
        for j in range(q):
            frames[:, j * hop:(j + 1) * hop] = region[j:j + FRAME_BLOCK]
        if r:
            frames[:, q * hop:] = region[q:q + FRAME_BLOCK, :r]

    prec = jax.lax.Precision.HIGHEST
    fr = frames[:, :]
    re = jnp.dot(fr, drh_ref[:, :], precision=prec,
                 preferred_element_type=jnp.float32)
    im = jnp.dot(fr, dih_ref[:, :], precision=prec,
                 preferred_element_type=jnp.float32)
    if exact:
        re = re + jnp.dot(fr, drl_ref[:, :], precision=prec,
                          preferred_element_type=jnp.float32)
        im = im + jnp.dot(fr, dil_ref[:, :], precision=prec,
                          preferred_element_type=jnp.float32)
    p = re * re + im * im
    if power == 1.0:
        p = precise_sqrt(p) if exact else jnp.sqrt(p)
    partial = jnp.dot(p, melh_ref[:, :], precision=prec,
                      preferred_element_type=jnp.float32)
    if exact:
        partial = partial + jnp.dot(p, mell_ref[:, :], precision=prec,
                                    preferred_element_type=jnp.float32)

    @pl.when(k == 0)
    def _init():
        out_ref[0, :, :] = partial

    @pl.when(k > 0)
    def _acc():
        out_ref[0, :, :] = out_ref[0, :, :] + partial

    @pl.when(k == n_k - 1)
    def _finish():
        mel = out_ref[0, :, :]
        log_fn = precise_log if exact else jnp.log
        if log_mode == 'offset':
            out_ref[0, :, :] = log_fn(mel + log_const)
        else:
            out_ref[0, :, :] = log_fn(jnp.maximum(mel, log_const))


@functools.partial(jax.jit, static_argnames=('spec', 'exact', 'n_frames'))
def pallas_log_mel(y: jnp.ndarray, spec: fe.MelSpec, exact: bool = False,
                   n_frames: int | None = None) -> jnp.ndarray:
    """Fused log-mel: (B, N) float32 -> (B, T, n_mels) float32.

    Semantically identical to :func:`a2m.audio.frontend.log_mel`.
    """
    if y.ndim == 1:
        return pallas_log_mel(y[None], spec, exact=exact,
                              n_frames=n_frames)[0]
    assert y.ndim == 2, 'pallas_log_mel expects (B, N) or (N,)'

    # choose K tile: whole-K for small specs; for n_fft=2048 stream K-tiles
    # (128 in exact mode keeps the 4 hi/lo DFT blocks + double-buffering
    # within VMEM; 256 otherwise)
    K = spec.n_fft // 2 + 1
    if spec.n_fft <= 512:
        k_tile = _round_up(K, 128)
    else:
        k_tile = 128 if exact else 256
    mats = _padded_matrices(spec, k_tile, exact)
    frame_len, k_pad, m_pad = mats['frame_len'], mats['k_pad'], mats['m_pad']
    n_k = k_pad // k_tile
    hop = spec.hop_length

    y = y.astype(jnp.float32)
    if spec.center:
        y = fe._pad_centered(y, spec.n_fft, spec.pad_mode)
    if n_frames is None:
        n_frames = 1 + (y.shape[-1] - frame_len) // hop

    n_fb = -(-n_frames // FRAME_BLOCK)
    # pad waveform so every chunk row referenced by the last frame block's
    # region read exists (kernel reads FRAME_BLOCK + round_up(q+1, 8) rows)
    q = frame_len // hop + (1 if frame_len % hop else 0)
    rows_needed = n_fb * FRAME_BLOCK + _round_up(q + 1, 8)
    samples_needed = rows_needed * hop
    if y.shape[-1] < samples_needed:
        y = jnp.pad(y, ((0, 0), (0, samples_needed - y.shape[-1])))
    chunks = y[:, :samples_needed].reshape(y.shape[0], rows_needed, hop)

    B = y.shape[0]
    grid = (B, n_fb, n_k)

    in_specs = [
        pl.BlockSpec((1, rows_needed, hop), lambda b, f, k: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((frame_len, k_tile), lambda b, f, k: (0, k),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((frame_len, k_tile), lambda b, f, k: (0, k),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((k_tile, m_pad), lambda b, f, k: (k, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [chunks, mats['drh'], mats['dih'], mats['melh']]
    if exact:
        in_specs += [
            pl.BlockSpec((frame_len, k_tile), lambda b, f, k: (0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((frame_len, k_tile), lambda b, f, k: (0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k_tile, m_pad), lambda b, f, k: (k, 0),
                         memory_space=pltpu.VMEM),
        ]
        args += [mats['drl'], mats['dil'], mats['mell']]

    kernel = functools.partial(
        _kernel, power=spec.power, log_mode=spec.log_mode,
        log_const=spec.log_const, exact=exact, hop=hop,
        frame_len=frame_len, n_k=n_k)

    # interpret mode on non-TPU backends (tests run on a CPU mesh); the
    # TPU-interpreter context is required — plain interpret=True cannot
    # evaluate program_id-dependent ref transforms on CPU
    interpret = jax.default_backend() != 'tpu'

    flops_dft = 2 * n_frames * frame_len * k_pad * 2 * (2 if exact else 1)
    flops_mel = 2 * n_frames * k_pad * m_pad * (2 if exact else 1)
    call = functools.partial(
        pl.pallas_call,
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, FRAME_BLOCK, m_pad),
                               lambda b, f, k: (b, f, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n_fb * FRAME_BLOCK, m_pad),
                                       jnp.float32),
        scratch_shapes=[pltpu.VMEM((FRAME_BLOCK, frame_len), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel', 'arbitrary', 'arbitrary'),
        ),
        cost_estimate=pl.CostEstimate(
            flops=B * (flops_dft + flops_mel),
            bytes_accessed=B * (samples_needed * 4
                                + n_frames * m_pad * 4),
            transcendentals=B * n_frames * m_pad,
        ),
    )
    if interpret:
        with pltpu.force_tpu_interpret_mode():
            out = call()(*args)
    else:
        out = call()(*args)
    return out[:, :n_frames, :spec.n_mels]


def pallas_log_mel_512(y: jnp.ndarray, sr: int,
                       exact: bool = False) -> jnp.ndarray:
    return pallas_log_mel(y, fe.spec_log_mel_512(sr), exact=exact)


def pallas_log_mel_400(y: jnp.ndarray, exact: bool = True) -> jnp.ndarray:
    return pallas_log_mel(y, fe.spec_log_mel_400(), exact=exact)


def pallas_vggish_log_mel(y: jnp.ndarray, exact: bool = True) -> jnp.ndarray:
    return pallas_log_mel(y, fe.spec_vggish(), exact=exact)
