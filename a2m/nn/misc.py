"""Miscellaneous heads and utilities (model_layers.py:613-945 parity)."""

from __future__ import annotations

import inspect
import math
from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


def _call_model(model, x, train: bool, **kwargs):
    """Call ``model(x, ...)`` passing ``train=`` only when its signature
    accepts it.

    Explicit signature dispatch — a blanket ``except TypeError`` (the
    previous approach, mirroring the reference's duck-typing) would swallow
    real TypeErrors raised *inside* the module's ``__call__``.
    """
    fn = type(model).__call__ if isinstance(model, nn.Module) else model
    params = inspect.signature(fn).parameters
    accepts_train = 'train' in params or any(
        p.kind is inspect.Parameter.VAR_KEYWORD for p in params.values())
    if accepts_train:
        return model(x, train=train, **kwargs)
    return model(x, **kwargs)


class Confidence(nn.Module):
    """Gaussian-entropy confidence loss (model_layers.py:711-744)."""
    beta: float = 0.1
    epsilon: float = 1e-8

    def __call__(self, y, y_cap, confidence):
        if isinstance(confidence, int):
            confidence = jnp.ones_like(y)
        sigma = self.get_sigma(confidence)
        p = self.p_ycap_y(y, y_cap, sigma)
        sigma_ycap = self.get_sigma(p)
        return self.get_entropy(sigma_ycap)

    def p_ycap_y(self, y, y_cap, sigma):
        diff = -(y - y_cap) ** 2
        prob = jnp.exp(diff / (2 * sigma ** 2))
        return prob / (2 * math.pi * sigma)

    def get_sigma(self, confidence):
        confidence = jnp.maximum(confidence, self.epsilon)
        return 1.0 / (2 * math.pi * confidence)

    def get_entropy(self, sigma):
        return 0.5 * jnp.log(2 * math.pi * math.e * sigma ** 2) * self.beta


class EmbLin(nn.Module):
    """Embedding usable as lookup ('emb') or soft linear mix ('lin')
    (model_layers.py:899-910)."""
    num_embeddings: int
    embedding_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mode: str = 'lin'):
        emb = self.param('emb', nn.initializers.normal(1.0),
                         (self.num_embeddings, self.embedding_dim))
        if mode == 'lin':
            return x @ emb.astype(self.dtype)
        return jnp.take(emb, x, axis=0)


class Style(nn.Module):
    """Speaker-style embedding (model_layers.py:913-923; a stub in the
    reference, functional here)."""
    num_speakers: int = 1
    embedding_dim: int = 256

    @nn.compact
    def __call__(self, speaker_ids):
        emb = nn.Embed(self.num_speakers, self.embedding_dim,
                       name='style_emb')
        return emb(speaker_ids)


def repeat_interleave(x, repeats: int, axis: int = -1):
    """torch repeat_interleave (model_layers.py:747-755 `Repeat`)."""
    return jnp.repeat(x, repeats, axis=axis)


def transpose(x, idx: Sequence[int]):
    """torch-style transpose of two axes (model_layers.py:613-620)."""
    perm = list(range(x.ndim))
    perm[idx[0]], perm[idx[1]] = perm[idx[1]], perm[idx[0]]
    return jnp.transpose(x, perm)


class Curriculum:
    """Linear scalar scheduler start -> end over num_iters
    (model_layers.py:926-945).  Host-side state, like the GAN controller."""

    def __init__(self, start: float, end: float, num_iters: int):
        self.start, self.end, self.num_iters = start, end, num_iters
        self.iters = 0
        self.diff = (end - start) / num_iters
        self.value = start

    def step(self, flag: bool = True) -> float:
        if flag:
            value_temp = self.value
            if self.iters < self.num_iters:
                self.value += self.diff
                self.iters += 1
                return value_temp
            return self.end
        return self.value


def index_select_outputs(x, labels, groups: int):
    """Soft selection over grouped outputs (model_layers.py:777-786).

    x: (B, T, groups * F); labels: (B, T, groups) soft weights.
    """
    xg = x.reshape(*x.shape[:-1], groups, -1)
    return (xg * labels[..., None]).sum(axis=-2)


class Group(nn.Module):
    """Run models over group-concatenated inputs (model_layers.py:838-896).

    dim=-1 concatenates channels (grouped conv semantics); dim=0 batches the
    inputs.  With ``labels``, outputs are soft-selected per group.
    Channel-last convention: inputs are (B, T, C) so no transpose flag.
    """
    models: Sequence[nn.Module]
    groups: int = 1
    dim: int = -1

    def __call__(self, x, labels=None, train: bool = False, **kwargs):
        groups = len(x) if (self.dim == 0 and isinstance(x, list)) else self.groups
        if isinstance(x, list):
            axis = 0 if self.dim == 0 else -1
            x = jnp.concatenate(x, axis=axis)
        for model in self.models:
            x = _call_model(model, x, train, **kwargs)
        if labels is not None:
            return index_select_outputs(x, labels, groups)
        axis = 0 if self.dim == 0 else -1
        return jnp.split(x, groups, axis=axis)


class BatchGroup(nn.Module):
    """Run models over batch-and-group concatenated list-of-list inputs
    (model_layers.py:758-835).  x[group][batch] -> concatenate batches along
    axis 0 and groups along channels; outputs split back symmetrically."""
    models: Sequence[nn.Module]
    groups: int = 1

    def __call__(self, x, labels=None, train: bool = False, **kwargs):
        assert isinstance(x, list) and isinstance(x[0], list), \
            'x must be a list of lists: x[group][batch]'
        groups, batches = len(x), len(x[0])
        assert groups == self.groups
        x = [jnp.concatenate(group, axis=0) for group in x]
        x = jnp.concatenate(x, axis=-1)
        for model in self.models:
            x = _call_model(model, x, train, **kwargs)
        if labels is not None:
            labels = jnp.concatenate(labels, axis=0)
            out = index_select_outputs(x, labels, groups)
            return [list(jnp.split(out, batches, axis=0))]
        parts = jnp.split(x, groups, axis=-1)
        return [list(jnp.split(part, batches, axis=0)) for part in parts]
