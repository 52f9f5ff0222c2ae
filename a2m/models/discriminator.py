"""Motion discriminator (reference `SelfAttention_D`, real_motion_model.py:464-642).

Motion (B, T-1, 104) -> strided conv trunk -> channel-split body/hand dense
GAT branches -> fused logits (B, 4).

TPU redesign: the reference builds a ``Data``/``Batch.from_data_list`` object
per sample in a Python loop on every forward (real_motion_model.py:602-613) —
O(B) host work in the hot path.  Here the graph branches are dense masked
attention batched over (B, J, F): zero host work, pure MXU.

Reference quirk handled: its auxiliary classifier consumes
``x.mean(dim=1)`` of the (B, 4) logits but declares a 2048-d input — it would
crash if ever enabled.  The evident intent (classify from the pooled conv
features) is implemented instead.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from a2m import constants
from a2m.config import DiscriminatorConfig
from a2m.nn.graph import DenseGATConv
from a2m.nn.layers import SelfAttention


class _ConvBNLReLU(nn.Module):
    """Conv -> BN -> LeakyReLU(0.2) -> Dropout (the D's conv unit,
    real_motion_model.py:504-513)."""
    out_channels: int
    kernel_size: int
    stride: int
    padding: int = 1
    groups: int = 1
    p: float = 0.3
    dtype: Any = jnp.float32
    precision: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.out_channels, (self.kernel_size,),
                    strides=(self.stride,),
                    padding=[(self.padding, self.padding)],
                    feature_group_count=self.groups, dtype=self.dtype,
                    precision=self.precision, name='conv')(x)
        # f32 mask-aware BatchNorm (see a2m/nn/layers.py / a2m/nn/masking.py)
        from a2m.nn.masking import MaskedBatchNorm
        x = MaskedBatchNorm(use_running_average=not train, name='bn')(x)
        x = nn.leaky_relu(x, 0.2).astype(self.dtype)
        return nn.Dropout(self.p, deterministic=not train)(x)


class Discriminator(nn.Module):
    """__call__(motion (B, T, 104), audio=None, aux_labels=None)
    -> (scores (B, T_out), aux_logits | None)."""
    config: DiscriminatorConfig = DiscriminatorConfig()
    dtype: Any = jnp.float32
    precision: Any = None

    @nn.compact
    def __call__(self, x, audio=None, train: bool = False):
        cfg = self.config
        g, p = cfg.groups, cfg.dropout
        common = dict(groups=g, p=p, dtype=self.dtype,
                      precision=self.precision)

        # pad T to a multiple of 4 if tiny (real_motion_model.py:583-584)
        if x.shape[1] < 4:
            pad = 4 - x.shape[1] % 4
            x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))

        # conv1 (real_motion_model.py:504-513)
        oc = cfg.out_channels * g
        x = _ConvBNLReLU(oc, 4, 2, name='conv1a', **common)(x, train)
        x = _ConvBNLReLU(oc, 4, 1, name='conv1b', **common)(x, train)

        # conv2: n_downsampling doubling stages (real_motion_model.py:515-532)
        cur = oc
        for n in range(1, cfg.n_downsampling + 1):
            mul = min(2 ** n, 16)
            x = _ConvBNLReLU(cur * mul, 4, 2, name=f'conv2_{n}a',
                             **common)(x, train)
            x = _ConvBNLReLU(cur * mul, 4, 1, name=f'conv2_{n}b',
                             **common)(x, train)
            cur = cur * mul

        # conv3 (real_motion_model.py:535-551)
        x = _ConvBNLReLU(cur * 2, 4, 1, name='conv3a', **common)(x, train)
        x = _ConvBNLReLU(cur * 4, 4, 1, name='conv3b', **common)(x, train)
        x = SelfAttention(cur * 4, dtype=self.dtype, name='conv3_attn')(x)
        x = _ConvBNLReLU(cur * 4, 3, 1, name='conv3c', **common)(x, train)

        b, t, c = x.shape

        # dual graph branches on channel halves (real_motion_model.py:593-616)
        jf = cfg.joint_feat_dim
        body_adj = constants.adjacency_from_edges(
            constants.body_edges(), constants.NUM_BODY_JOINTS)
        hand_adj = constants.adjacency_from_edges(
            constants.hand_edges(), constants.NUM_HAND_JOINTS)

        x_body = x[..., :c // 2].mean(axis=1)     # (B, C/2) global avg pool
        x_body = nn.Dense(constants.NUM_BODY_JOINTS * jf, dtype=self.dtype,
                          precision=self.precision, name='body_proj')(x_body)
        x_body = x_body.reshape(b, constants.NUM_BODY_JOINTS, jf)
        x_body = DenseGATConv(jf, body_adj, heads=cfg.gat_heads,
                              concat=False, dtype=self.dtype,
                              precision=self.precision,
                              name='body_gat')(x_body)
        x_body = nn.Dense(cur * 2, dtype=self.dtype,
                          precision=self.precision,
                          name='body_graph_out')(x_body.reshape(b, -1))

        x_hand = x[..., c // 2:].mean(axis=1)
        x_hand = nn.Dense(constants.NUM_HAND_JOINTS * jf, dtype=self.dtype,
                          precision=self.precision, name='hand_proj')(x_hand)
        x_hand = x_hand.reshape(b, constants.NUM_HAND_JOINTS, jf)
        x_hand = DenseGATConv(jf, hand_adj, heads=cfg.gat_heads,
                              concat=False, dtype=self.dtype,
                              precision=self.precision,
                              name='hand_gat')(x_hand)
        x_hand = nn.Dense(cur * 2, dtype=self.dtype,
                          precision=self.precision,
                          name='hand_graph_out')(x_hand.reshape(b, -1))

        # tile graph features over T and fuse (real_motion_model.py:619-621)
        x_graph = jnp.concatenate([x_body, x_hand], axis=-1)  # (B, C)
        x_graph = jnp.broadcast_to(x_graph[:, None, :], (b, t, c))
        conv_feats = x
        x = jnp.concatenate([x, x_graph], axis=-1)

        # optional audio fusion (real_motion_model.py:624-628)
        if audio is not None:
            a = nn.Dense(cur * 4, dtype=self.dtype,
                         precision=self.precision, name='audio_fusion')(audio)
            if a.shape[1] != t:
                # torch adaptive_avg_pool1d semantics for ANY (T_audio, t)
                # pair — non-divisible ratios and T_audio < t included
                from a2m.nn.layers import adaptive_pool_matrix
                w = adaptive_pool_matrix(a.shape[1], t).astype(self.dtype)
                a = jnp.einsum('os,bsc->boc', w, a,
                               precision=self.precision)
            x = jnp.concatenate([x, a], axis=-1)

        # logits conv k3 s1 p1 -> (B, T_out) (real_motion_model.py:567-569,632)
        scores = nn.Conv(cfg.out_shape * g, (3,), strides=(1,),
                         padding=[(1, 1)], feature_group_count=g,
                         dtype=self.dtype, precision=self.precision,
                         name='logits')(x)           # (B, T_out, out_shape*g)
        if cfg.out_shape * g == 1:
            scores = scores[..., 0]                  # (B, T_out) == (B, 4)

        # auxiliary gesture-type classifier (real_motion_model.py:572-578);
        # gated off by default — without an applied CE loss it is dead
        # compute on every D forward (enable with use_aux_classifier +
        # train.lambda_aux)
        aux_logits = None
        if cfg.use_aux_classifier:
            aux_feats = conv_feats.mean(axis=1)
            aux = nn.Dense(512, dtype=self.dtype, precision=self.precision,
                           name='aux_fc1')(aux_feats)
            aux = nn.leaky_relu(aux, 0.2)
            aux = nn.Dropout(p, deterministic=not train)(aux)
            aux_logits = nn.Dense(cfg.aux_classes, dtype=self.dtype,
                                  precision=self.precision,
                                  name='aux_fc2')(aux).astype(jnp.float32)

        return scores.astype(jnp.float32), aux_logits


def aux_cross_entropy(aux_logits: jnp.ndarray, labels: jnp.ndarray,
                      mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """CE over gesture classes (real_motion_model.py:578,635-640).

    ``mask``: optional (B,) 1/0 weights (wrap-padded rows).  Labels must be
    in [0, n_classes) — out-of-range ids one_hot to a zero row and would
    silently contribute zero loss (the Trainer validates this).
    """
    from a2m.models import losses as _L
    logp = jax.nn.log_softmax(aux_logits, axis=-1)
    onehot = jax.nn.one_hot(labels, aux_logits.shape[-1],
                            dtype=aux_logits.dtype)
    per_sample = -(onehot * logp).sum(axis=-1)
    return _L.masked_mean(per_sample, mask)


# reference-compatible alias
SelfAttention_D = Discriminator
