"""Gesture generator (reference `SelfAttention_G`, real_motion_model.py:16-278).

Audio (B, T, 128) -> AudioEncoder -> UNet1D -> two parallel decoders:

* body: ResBlock/CNR/ChannelAttention/SelfAttention pre-stage, projection to
  (B, T, 10, 64) joint features, 5-layer dense GAT/GraphConv stack, projection
  back, post-stage, 20-channel head;
* hand: same shape with 42 joints and an 84-channel head.

TPU redesign vs the reference:

* graph layers run as dense masked-attention einsums over (B, T, J, F) — no
  ``B*T`` graph stacking, no scatter ops (SURVEY.md §7.4);
* everything stays channel-last (B, T, C);
* **output layout is canonical block layout**: the body head emits
  [x0..x9 | y0..y9] and the hand head [x10..x51 | y10..y51], interleaved into
  [x0..x51, y0..y51].  The reference leaves its head concatenation order
  inconsistent with its loss reshape (SURVEY.md §3.3); here every consumer
  shares one layout.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from a2m import constants
from a2m.config import GeneratorConfig
from a2m.models import losses as L
from a2m.nn.encoders import AudioEncoder, UNet1D
from a2m.nn.graph import GCNStack
from a2m.nn.layers import (ChannelAttention, ConvNormRelu, ResBlock,
                           SelfAttention)


class _PartDecoder(nn.Module):
    """Shared body/hand decoder trunk around the GCN stack."""
    channels: int
    num_joints: int
    joint_feat_dim: int
    adjacency: Any
    out_feats: int
    p: float
    heads: int
    attention_first: bool        # body: ChannelAttn->SelfAttn; hand: reversed
    extra_post_channel_attn: bool
    fused_gcn: bool = False
    fused_rolled: bool = False
    fused_tile: Any = None
    fused_edge: bool = False
    dtype: Any = jnp.float32
    precision: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.channels
        common = dict(dtype=self.dtype)
        # pre-stage (real_motion_model.py:70-75 body / :96-101 hand)
        x = ResBlock(c, p=self.p, name='pre_res', **common)(x, train)
        x = ConvNormRelu(c, c, type='1d', leaky=True, p=self.p,
                         precision=self.precision, name='pre_conv',
                         **common)(x, train)
        if self.attention_first:
            x = ChannelAttention(c, name='pre_chattn', **common)(x)
            x = SelfAttention(c, name='pre_attn', **common)(x)
        else:
            x = SelfAttention(c, name='pre_attn', **common)(x)
            x = ChannelAttention(c, name='pre_chattn', **common)(x)

        b, t, _ = x.shape
        j, f = self.num_joints, self.joint_feat_dim
        # project to joint features (real_motion_model.py:76,160-165)
        x = nn.Dense(j * f, dtype=self.dtype, precision=self.precision,
                     name='proj_in')(x)
        x = x.reshape(b, t, j, f)
        x = GCNStack(f, self.adjacency, num_layers=5, heads=self.heads,
                     dropout=self.p, fused=self.fused_gcn,
                     fused_rolled=self.fused_rolled,
                     fused_tile=self.fused_tile, fused_edge=self.fused_edge,
                     dtype=self.dtype,
                     precision=self.precision, name='gcn')(x, train)
        x = x.reshape(b, t, j * f)
        x = nn.Dense(c, dtype=self.dtype, precision=self.precision,
                     name='proj_out')(x)
        x = nn.LayerNorm(dtype=jnp.float32, name='norm')(x).astype(self.dtype)

        # post-stage (real_motion_model.py:88-93 body / :114-119 hand)
        x = ResBlock(c, p=self.p, name='post_res', **common)(x, train)
        x = ConvNormRelu(c, c, type='1d', leaky=True, p=self.p,
                         precision=self.precision, name='post_conv',
                         **common)(x, train)
        x = SelfAttention(c, name='post_attn', **common)(x)
        if self.extra_post_channel_attn:
            x = ChannelAttention(c, name='post_chattn', **common)(x)
        return nn.Dense(self.out_feats, dtype=self.dtype,
                        precision=self.precision, name='logits')(x)


class Generator(nn.Module):
    """Audio -> 2D gesture sequence in block layout.

    __call__(audio (B, T, 128)) -> pose (B, T, 104).
    Use :func:`forward_with_losses` for the reference's
    ``(out, internal_losses)`` interface.
    """
    config: GeneratorConfig = GeneratorConfig()
    dtype: Any = jnp.float32
    precision: Any = None

    @nn.compact
    def __call__(self, audio, train: bool = False,
                 time_steps: int | None = None, speaker_ids=None):
        cfg = self.config
        feats = AudioEncoder(output_feats=cfg.time_steps, p=cfg.dropout,
                             base_channels=cfg.in_channels // 4,
                             dtype=self.dtype, precision=self.precision,
                             name='audio_encoder')(
            audio, time_steps=time_steps, train=train)
        if cfg.num_style_speakers > 0:
            # additive speaker-style bias over the encoder features — the
            # functional form of the reference's stub Style module
            # (model_layers.py:913-923), opt-in via num_style_speakers
            if speaker_ids is None:
                speaker_ids = jnp.zeros(audio.shape[0], jnp.int32)
            style = nn.Embed(cfg.num_style_speakers, cfg.in_channels,
                             dtype=self.dtype, name='style_emb')(speaker_ids)
            feats = feats + style[:, None, :]
        feats = UNet1D(cfg.in_channels, cfg.out_channels, p=cfg.dropout,
                       dtype=self.dtype, precision=self.precision,
                       name='unet')(feats, train)

        body_adj = constants.adjacency_from_edges(constants.body_edges(),
                                                  cfg.num_body_joints)
        hand_adj = constants.adjacency_from_edges(constants.hand_edges(),
                                                  cfg.num_hand_joints)
        body = _PartDecoder(cfg.out_channels, cfg.num_body_joints,
                            cfg.joint_feat_dim, body_adj, cfg.body_feats,
                            cfg.dropout, cfg.gat_heads, attention_first=True,
                            extra_post_channel_attn=False,
                            fused_gcn=cfg.fused_gcn,
                            fused_rolled=cfg.fused_rolled,
                            fused_tile=cfg.fused_tile,
                            fused_edge=cfg.fused_edge, dtype=self.dtype,
                            precision=self.precision,
                            name='body_decoder')(feats, train)
        hand = _PartDecoder(cfg.out_channels, cfg.num_hand_joints,
                            cfg.joint_feat_dim, hand_adj,
                            cfg.out_feats - cfg.body_feats, cfg.dropout,
                            cfg.gat_heads, attention_first=False,
                            extra_post_channel_attn=True,
                            fused_gcn=cfg.fused_gcn,
                            fused_rolled=cfg.fused_rolled,
                            fused_tile=cfg.fused_tile,
                            fused_edge=cfg.fused_edge, dtype=self.dtype,
                            precision=self.precision,
                            name='hand_decoder')(feats, train)

        # interleave part heads into block layout [x0..x51 | y0..y51]:
        # body = [x0..x9 | y0..y9], hand = [x10..x51 | y10..y51]
        nb = cfg.num_body_joints
        out = jnp.concatenate([
            body[..., :nb],                 # x body
            hand[..., :cfg.num_hand_joints],  # x hand
            body[..., nb:],                 # y body
            hand[..., cfg.num_hand_joints:],  # y hand
        ], axis=-1)
        return out.astype(jnp.float32)


def forward_with_losses(model: Generator, variables, audio,
                        real_pose=None, train: bool = False,
                        rngs=None, mutable=False):
    """Reference-style ``(pose, internal_losses)`` forward
    (real_motion_model.py:154-278)."""
    if mutable:
        out, new_vars = model.apply(variables, audio, train=train, rngs=rngs,
                                    mutable=mutable)
    else:
        out = model.apply(variables, audio, train=train, rngs=rngs)
        new_vars = None
    internal = L.generator_internal_losses(out, real_pose)
    return (out, internal, new_vars) if mutable else (out, internal)


# reference-compatible alias
SelfAttention_G = Generator
