"""Core NN building blocks (flax.linen), channel-last TPU layout.

Semantic parity with `model_layers.py:51-215` of the reference, redesigned
for TPU:

* **Layout**: all 1D modules take ``(B, T, C)`` and 2D modules
  ``(B, H, W, C)`` — channel-last is XLA's native conv layout on TPU (the
  reference's torch code is channel-first).
* **Padding**: torch's implicit ``int((k - s) / 2)`` both-sides padding is
  reproduced exactly with explicit padding tuples, so feature-map sizes match
  the reference stage by stage.
* **BatchNorm**: faithful train/eval running-stat semantics via flax
  ``BatchNorm`` (torch defaults: momentum 0.1 -> flax momentum 0.9,
  eps 1e-5); order conv -> dropout -> norm -> activation matches
  `model_layers.py:118`.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from a2m.nn.masking import MaskedBatchNorm


def torch_pad(kernel_size, stride) -> Any:
    """Reference padding rule (model_layers.py:68-82): int((k - s) / 2),
    applied symmetrically."""
    if isinstance(kernel_size, int) and isinstance(stride, int):
        p = int((kernel_size - stride) / 2)
        return [(p, p)]
    if isinstance(kernel_size, tuple) and isinstance(stride, int):
        return [(int((k - stride) / 2),) * 2 for k in kernel_size]
    if isinstance(kernel_size, int) and isinstance(stride, tuple):
        return [(int((kernel_size - s) / 2),) * 2 for s in stride]
    # both tuples: reference computes int((ks - ks)/2) == 0 due to a zip bug
    # (model_layers.py:80 zips kernel_size with itself); we implement the
    # evident intent int((k - s) / 2) instead.
    return [(int((k - s) / 2),) * 2 for k, s in zip(kernel_size, stride)]


class ConvNormRelu(nn.Module):
    """Conv -> Dropout -> BatchNorm -> (Leaky)ReLU (model_layers.py:51-118).

    ``downsample=True`` selects k=4, s=2 (halves the spatial dims); default
    k=3, s=1.  ``groups`` multiplies both channel counts, replicating the
    reference's grouped-conv convention (model_layers.py:90-91).
    """
    in_channels: int
    out_channels: int
    type: str = '1d'
    leaky: bool = False
    downsample: bool = False
    kernel_size: Any = None
    stride: Any = None
    padding: Any = None
    p: float = 0.0
    groups: int = 1
    dtype: Any = jnp.float32
    precision: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        k, s = self.kernel_size, self.stride
        if k is None and s is None:
            k, s = (4, 2) if self.downsample else (3, 1)
        ndim = 1 if self.type == '1d' else 2
        if isinstance(k, int):
            k = (k,) * ndim
        if isinstance(s, int):
            s = (s,) * ndim
        pad = self.padding if self.padding is not None else torch_pad(
            tuple(k) if len(k) > 1 else k[0], tuple(s) if len(s) > 1 else s[0])
        if isinstance(pad, int):
            pad = [(pad, pad)] * ndim

        out_ch = self.out_channels * self.groups
        x = nn.Conv(out_ch, kernel_size=tuple(k), strides=tuple(s),
                    padding=pad, feature_group_count=self.groups,
                    dtype=self.dtype, precision=self.precision,
                    name='conv')(x)
        x = nn.Dropout(self.p, deterministic=not train)(x)
        # BatchNorm always computes in f32: bf16 fast-variance cancellation
        # (E[x^2] - E[x]^2) produces negative variances -> NaN.  Mask-aware:
        # wrap-padded batch rows are excluded from the moments (a2m/nn/
        # masking.py) — the reference trains true ragged batches
        x = MaskedBatchNorm(use_running_average=not train,
                            name='norm')(x)
        x = nn.leaky_relu(x, 0.2) if self.leaky else nn.relu(x)
        return x.astype(self.dtype)


class SelfAttention(nn.Module):
    """SAGAN-style 1D self-attention with learnable scalar residual gate
    (model_layers.py:121-146).  Input (B, T, C)."""
    in_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = self.in_channels
        q = nn.Dense(c // 8, dtype=self.dtype, name='query')(x)  # 1x1 conv
        k = nn.Dense(c // 8, dtype=self.dtype, name='key')(x)
        v = nn.Dense(c, dtype=self.dtype, name='value')(x)
        attn = jnp.einsum('btc,bsc->bts', q, k)      # (B, T, T), unscaled
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1)
        out = jnp.einsum('bts,bsc->btc', attn.astype(v.dtype), v)
        gamma = self.param('gamma', nn.initializers.zeros, (1,))
        return gamma * out + x


class ChannelAttention(nn.Module):
    """SE-style channel gating with shared MLP over avg+max pools
    (model_layers.py:149-174).  Input (B, T, C)."""
    channel: int
    reduction: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        mlp = nn.Sequential([
            nn.Dense(self.channel // self.reduction, dtype=self.dtype),
            nn.relu,
            nn.Dense(self.channel, dtype=self.dtype),
        ])
        avg_out = mlp(jnp.mean(x, axis=1))
        max_out = mlp(jnp.max(x, axis=1))
        gate = jax.nn.sigmoid(avg_out + max_out)[:, None, :]
        return x * gate


class ResBlock(nn.Module):
    """2x ConvNormRelu + SelfAttention + residual (model_layers.py:177-190)."""
    channels: int
    type: str = '1d'
    p: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        x = ConvNormRelu(self.channels, self.channels, type=self.type,
                         leaky=True, p=self.p, dtype=self.dtype,
                         name='conv1')(x, train)
        x = ConvNormRelu(self.channels, self.channels, type=self.type,
                         leaky=True, p=self.p, dtype=self.dtype,
                         name='conv2')(x, train)
        x = SelfAttention(self.channels, dtype=self.dtype,
                          name='attention')(x)
        return x + residual


class ConvTranspose1D(nn.Module):
    """Transposed conv (k3, s2, p1, op1 -> exactly doubles T) + BN + ReLU
    (model_layers.py:193-215).

    Implemented as an input-dilated convolution with torch-equivalent
    padding: out = (T-1)*s - 2p + k + op.
    """
    in_channels: int
    out_channels: int
    kernel_size: int = 3
    stride: int = 2
    padding: int = 1
    output_padding: int = 1
    dtype: Any = jnp.float32
    precision: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        k, s, p, op = (self.kernel_size, self.stride, self.padding,
                       self.output_padding)
        kernel = self.param(
            'kernel', nn.initializers.lecun_normal(),
            (k, self.in_channels, self.out_channels))
        bias = self.param('bias', nn.initializers.zeros,
                          (self.out_channels,))
        # torch ConvTranspose1d == conv with lhs_dilation=s, kernel flipped,
        # padding (k-1-p) low / (k-1-p+op) high
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            jnp.flip(kernel, 0).astype(self.dtype),
            window_strides=(1,),
            padding=[(k - 1 - p, k - 1 - p + op)],
            lhs_dilation=(s,),
            dimension_numbers=('NWC', 'WIO', 'NWC'),
            precision=self.precision)
        y = y + bias
        y = MaskedBatchNorm(use_running_average=not train, name='bn')(y)
        return nn.relu(y).astype(self.dtype)


def adaptive_pool_matrix(in_len: int, out_len: int) -> jnp.ndarray:
    """(out_len, in_len) averaging matrix with torch
    ``adaptive_avg_pool1d`` semantics: output bin ``i`` is the mean of
    input rows ``[floor(i*L/out), ceil((i+1)*L/out))``.

    Shapes are static under jit, so the matrix is a compile-time constant
    and pooling becomes one (small) matmul — arbitrary (in_len, out_len)
    pairs work, including non-divisible ratios and in_len < out_len
    (the reference relies on torch for this, real_motion_model.py:624-628).
    """
    import numpy as np
    w = np.zeros((out_len, in_len), np.float32)
    for i in range(out_len):
        s = (i * in_len) // out_len
        e = -(-((i + 1) * in_len) // out_len)
        w[i, s:e] = 1.0 / (e - s)
    return jnp.asarray(w)


def interpolate_bilinear(x: jnp.ndarray, size: tuple[int, int]
                         ) -> jnp.ndarray:
    """torch F.interpolate(mode='bilinear', align_corners=False) on
    channel-last (B, H, W, C) input."""
    b, _, _, c = x.shape
    return jax.image.resize(x, (b, size[0], size[1], c), method='bilinear',
                            antialias=False)


def num_powers_of_two(x: int) -> int:
    """(model_layers.py:19-27)"""
    num = 0
    while x > 1 and x % 2 == 0:
        x //= 2
        num += 1
    return num


def next_multiple_power_of_two(x: int, power: int = 5) -> int:
    """(model_layers.py:30-34)"""
    curr = num_powers_of_two(x)
    if curr < power:
        x = x * (2 ** (power - curr))
    return x
