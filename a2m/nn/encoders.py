"""Encoders / decoders (flax.linen), channel-last.

Parity targets: `model_layers.py:219-708` — AudioEncoder, UNet1D (+ legacy
first version), PoseEncoder, PoseStyleEncoder, PoseDecoder, StyleDecoder,
TextEncoder1D, AudioEncoder1D, LatentEncoder, ClusterClassify.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from a2m.nn.layers import (ConvNormRelu, ConvTranspose1D, SelfAttention,
                           interpolate_bilinear)


class AudioEncoder(nn.Module):
    """2D conv stack over (T, F) log-mel input -> (B, T_out, 256)
    (model_layers.py:219-280).

    Channels 1->64->128->256->512->256 with three stride-2 downsamples
    ((64,128) -> (8,16)) and a final (3,8) kernel -> (8,15); bilinear
    interpolation restores (time_steps, 1); output squeezed to (B, T, 256).
    """
    output_feats: int = 64
    input_channels: int = 1
    base_channels: int = 64   # reference widths: (b, 2b, 4b, 8b, 4b), b=64
    kernel_size: Any = None
    stride: Any = None
    p: float = 0.0
    groups: int = 1
    dtype: Any = jnp.float32
    precision: Any = None

    @nn.compact
    def __call__(self, x, time_steps: int | None = None,
                 train: bool = False):
        # x: (B, T, F) -> (B, T, F, 1)
        if time_steps is None:
            time_steps = x.shape[1]
        x = x[..., None]
        b = self.base_channels
        common = dict(type='2d', leaky=True, kernel_size=self.kernel_size,
                      stride=self.stride, p=self.p, groups=self.groups,
                      dtype=self.dtype, precision=self.precision)
        x = ConvNormRelu(self.input_channels, b, downsample=True,
                         name='conv0', **common)(x, train)
        x = ConvNormRelu(b, b * 2, downsample=True, name='conv1',
                         **common)(x, train)
        x = ConvNormRelu(b * 2, b * 4, downsample=True, name='conv2',
                         **common)(x, train)
        x = ConvNormRelu(b * 4, b * 8, downsample=False, name='conv3',
                         **common)(x, train)
        x = ConvNormRelu(b * 8, b * 4, type='2d', leaky=True,
                         kernel_size=(3, 8), stride=1, p=self.p,
                         groups=self.groups, dtype=self.dtype,
                         precision=self.precision, name='conv4')(x, train)
        # (B, 8, 15, 256) -> bilinear to (B, time_steps, 1, 256) -> squeeze
        x = interpolate_bilinear(x, (time_steps, 1))
        return x[:, :, 0, :]


class UNet1D(nn.Module):
    """Depth-2 1D U-Net with bottleneck + single up-path attention
    (model_layers.py:283-374).  Input/output (B, T, C)."""
    input_channels: int
    output_channels: int
    p: float = 0.0
    groups: int = 1
    kernel_size: Any = None
    stride: Any = None
    dtype: Any = jnp.float32
    precision: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.input_channels
        common = dict(type='1d', leaky=True, kernel_size=self.kernel_size,
                      stride=self.stride, p=self.p, groups=self.groups,
                      dtype=self.dtype, precision=self.precision)
        # down path
        x = ConvNormRelu(c, c * 2, downsample=False, name='down0',
                         **common)(x, train)
        skip1 = x
        x = ConvNormRelu(c * 2, c * 2, downsample=True, name='down1',
                         **common)(x, train)
        x = ConvNormRelu(c * 2, c * 4, downsample=False, name='down2',
                         **common)(x, train)
        skip2 = x
        x = ConvNormRelu(c * 4, c * 4, downsample=True, name='down3',
                         **common)(x, train)
        # bottleneck (attention only here)
        x = ConvNormRelu(c * 4, c * 8, type='1d', leaky=True, p=self.p,
                         groups=self.groups, dtype=self.dtype,
                         precision=self.precision,
                         name='bottleneck')(x, train)
        x = SelfAttention(c * 8, dtype=self.dtype,
                          name='bottleneck_attention')(x)
        # up path
        x = ConvTranspose1D(c * 8, c * 4, dtype=self.dtype,
                            precision=self.precision, name='up0')(x, train)
        x = jnp.concatenate([x, skip2], axis=-1)
        x = SelfAttention(c * 8, dtype=self.dtype, name='up_attention')(x)
        x = ConvNormRelu(c * 8, c * 4, downsample=False, name='up1',
                         **common)(x, train)
        x = ConvTranspose1D(c * 4, c * 2, dtype=self.dtype,
                            precision=self.precision, name='up2')(x, train)
        x = jnp.concatenate([x, skip1], axis=-1)
        x = ConvNormRelu(c * 4, c * 2, downsample=False, name='up3',
                         **common)(x, train)
        return nn.Dense(self.output_channels, dtype=self.dtype,
                        precision=self.precision, name='final_conv')(x)


class UNet1DFirstVersion(nn.Module):
    """Legacy U-Net: nearest-neighbor upsample + additive skips
    (model_layers.py:377-430).  Requires T divisible by 2^(max_depth)."""
    input_channels: int
    output_channels: int
    max_depth: int = 5
    p: float = 0.0
    groups: int = 1
    kernel_size: Any = None
    stride: Any = None
    dtype: Any = jnp.float32
    precision: Any = None

    @nn.compact
    def __call__(self, x, return_bottleneck: bool = False,
                 train: bool = False):
        t = x.shape[1]
        assert t / (2 ** (self.max_depth - 1)) >= 1
        assert t % (2 ** self.max_depth) == 0, (
            f'input T={t} must be a multiple of 2^{self.max_depth}')
        common = dict(type='1d', leaky=True, kernel_size=self.kernel_size,
                      stride=self.stride, p=self.p, groups=self.groups,
                      dtype=self.dtype, precision=self.precision)
        x = ConvNormRelu(self.input_channels, self.output_channels,
                         downsample=False, name='pre0', **common)(x, train)
        x = ConvNormRelu(self.input_channels, self.output_channels,
                         downsample=False, name='pre1', **common)(x, train)
        residuals = [x]
        for i in range(self.max_depth):
            x = ConvNormRelu(self.input_channels, self.output_channels,
                             downsample=True, name=f'conv1_{i}',
                             **common)(x, train)
            if i < self.max_depth - 1:
                residuals.append(x)
        bottleneck = x
        for i in range(self.max_depth):
            up = jnp.repeat(x, 2, axis=1)  # nearest-neighbor 2x upsample
            x = up + residuals[self.max_depth - i - 1]
            x = ConvNormRelu(self.input_channels, self.output_channels,
                             downsample=False, name=f'conv2_{i}',
                             **common)(x, train)
        if return_bottleneck:
            return x, bottleneck
        return x


class _ConvStack1D(nn.Module):
    """Shared template: sequence of 1D ConvNormRelu stages."""
    channels: tuple            # ((in, out, downsample), ...)
    p: float = 0.0
    groups: int = 1
    kernel_size: Any = None
    stride: Any = None
    dtype: Any = jnp.float32
    precision: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i, (ci, co, ds) in enumerate(self.channels):
            x = ConvNormRelu(ci, co, type='1d', leaky=True, downsample=ds,
                             kernel_size=self.kernel_size, stride=self.stride,
                             p=self.p, groups=self.groups, dtype=self.dtype,
                             precision=self.precision,
                             name=f'conv{i}')(x, train)
        return x


class PoseEncoder(nn.Module):
    """(B, T, pose_feats) -> (B, T, 256) (model_layers.py:433-470)."""
    output_feats: int = 64
    input_channels: int = 96
    p: float = 0.0
    groups: int = 1
    dtype: Any = jnp.float32
    precision: Any = None

    @nn.compact
    def __call__(self, x, time_steps: int | None = None,
                 train: bool = False):
        ch = ((self.input_channels, 64, False), (64, 64, False),
              (64, 128, False), (128, 128, False),
              (128, 256, False), (256, 256, False))
        return _ConvStack1D(ch, p=self.p, groups=self.groups,
                            dtype=self.dtype, precision=self.precision,
                            name='stack')(x, train)


class PoseStyleEncoder(nn.Module):
    """Pose -> speaker logits via downsampling conv stack + mean pool
    (model_layers.py:477-519)."""
    output_feats: int = 64
    input_channels: int = 96
    num_speakers: int = 4
    p: float = 0.0
    groups: int = 1
    dtype: Any = jnp.float32
    precision: Any = None

    @nn.compact
    def __call__(self, x, time_steps: int | None = None,
                 train: bool = False):
        ch = ((self.input_channels, 64, False), (64, 64, True),
              (64, 128, True), (128, 128, True),
              (128, 256, True), (256, 256, True),
              (256, self.num_speakers, True))
        x = _ConvStack1D(ch, p=self.p, groups=self.groups, dtype=self.dtype,
                         precision=self.precision, name='stack')(x, train)
        return x.mean(axis=1)   # (B, num_speakers)


class TextEncoder1D(nn.Module):
    """(B, T, 300) -> (B, T, 256) (model_layers.py:576-610)."""
    output_feats: int = 64
    input_channels: int = 300
    p: float = 0.0
    groups: int = 1
    dtype: Any = jnp.float32
    precision: Any = None

    @nn.compact
    def __call__(self, x, time_steps: int | None = None,
                 train: bool = False):
        ch = ((self.input_channels, 64, False), (64, 64, False),
              (64, 128, False), (128, 128, False),
              (128, 256, False), (256, 256, False))
        return _ConvStack1D(ch, p=self.p, groups=self.groups,
                            dtype=self.dtype, precision=self.precision,
                            name='stack')(x, train)


class AudioEncoder1D(nn.Module):
    """(B, T, 128) -> (B, T, 256) (model_layers.py:623-656)."""
    output_feats: int = 64
    input_channels: int = 128
    p: float = 0.0
    groups: int = 1
    dtype: Any = jnp.float32
    precision: Any = None

    @nn.compact
    def __call__(self, x, time_steps: int | None = None,
                 train: bool = False):
        ch = ((self.input_channels, 64, False), (64, 64, False),
              (64, 128, False), (128, 128, False),
              (128, 256, False), (256, 256, False))
        return _ConvStack1D(ch, p=self.p, groups=self.groups,
                            dtype=self.dtype, precision=self.precision,
                            name='stack')(x, train)


class PoseDecoder(nn.Module):
    """Grouped-conv pose decoder with style-vector re-concat between layers
    (model_layers.py:522-550).  Input (B, T, (C + style) * clusters)."""
    input_channels: int = 256
    style_dim: int = 10
    num_clusters: int = 8
    out_feats: int = 96
    p: float = 0.0
    dtype: Any = jnp.float32
    precision: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        g = self.num_clusters
        # style block: last style_dim channels of each cluster group
        xg = x.reshape(*x.shape[:-1], g, -1)
        style = xg[..., -self.style_dim:]            # (B, T, g, style)
        for i in range(4):
            x = ConvNormRelu(self.input_channels + self.style_dim,
                             self.input_channels, type='1d', leaky=True,
                             p=self.p, groups=g, dtype=self.dtype,
                             precision=self.precision,
                             name=f'dec{i}')(x, train)
            if i < 3:
                xg = x.reshape(*x.shape[:-1], g, -1)
                x = jnp.concatenate([xg, style], axis=-1)
                x = x.reshape(*x.shape[:-2], -1)
        # grouped 1x1 logits: in C*g -> out out_feats*g
        return nn.Conv(self.out_feats * g, kernel_size=(1,),
                       feature_group_count=g, dtype=self.dtype,
                       precision=self.precision, name='pose_logits')(x)


class StyleDecoder(nn.Module):
    """Grouped decoder without style injection (model_layers.py:553-572)."""
    input_channels: int = 256
    num_clusters: int = 10
    out_feats: int = 96
    p: float = 0.0
    dtype: Any = jnp.float32
    precision: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        g = self.num_clusters
        for i in range(2):
            x = ConvNormRelu(self.input_channels, self.input_channels,
                             type='1d', leaky=True, p=self.p, groups=g,
                             dtype=self.dtype, precision=self.precision,
                             name=f'dec{i}')(x, train)
        return nn.Conv(self.out_feats * g, kernel_size=(1,),
                       feature_group_count=g, dtype=self.dtype,
                       precision=self.precision, name='pose_logits')(x)


class LatentEncoder(nn.Module):
    """Bottleneck conv encoder (model_layers.py:663-682)."""
    in_channels: int
    hidden_channels: int
    out_channels: int = 2
    p: float = 0.0
    dtype: Any = jnp.float32
    precision: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        ch = ((self.in_channels, self.hidden_channels, False),
              (self.hidden_channels, self.hidden_channels, False),
              (self.hidden_channels, self.hidden_channels, False),
              (self.hidden_channels, self.out_channels, False))
        return _ConvStack1D(ch, p=self.p, dtype=self.dtype,
                            precision=self.precision, name='enc')(x, train)


class ClusterClassify(nn.Module):
    """(B, T, C) -> per-frame cluster logits (model_layers.py:685-708)."""
    num_clusters: int = 8
    input_channels: int = 256
    p: float = 0.0
    groups: int = 1
    dtype: Any = jnp.float32
    precision: Any = None

    @nn.compact
    def __call__(self, x, time_steps: int | None = None,
                 train: bool = False):
        ch = tuple([(self.input_channels, 256, False)]
                   + [(256, 256, False)] * 5)
        x = _ConvStack1D(ch, p=self.p, groups=self.groups, dtype=self.dtype,
                         precision=self.precision, name='stack')(x, train)
        return nn.Conv(self.num_clusters * self.groups, kernel_size=(1,),
                       feature_group_count=self.groups, dtype=self.dtype,
                       precision=self.precision, name='logits')(x)
