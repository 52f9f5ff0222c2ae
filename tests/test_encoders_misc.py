"""Init + forward tests for the remaining parity modules (VERDICT r1 #6).

Covers model_layers.py:433-945: PoseEncoder, PoseStyleEncoder, PoseDecoder,
StyleDecoder, TextEncoder1D, AudioEncoder1D, LatentEncoder, ClusterClassify,
and nn/misc.py (Confidence, EmbLin, Style, Repeat, transpose, Curriculum,
Group, BatchGroup, index_select_outputs).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from a2m.nn.encoders import (AudioEncoder1D, ClusterClassify, LatentEncoder,
                             PoseDecoder, PoseEncoder, PoseStyleEncoder,
                             StyleDecoder, TextEncoder1D)
from a2m.nn import misc

KEY = jax.random.PRNGKey(0)


def init_run(module, x, train=False, **kwargs):
    variables = module.init({'params': KEY, 'dropout': KEY}, x, **kwargs)
    rngs = {'dropout': KEY} if train else None
    out = module.apply(variables, x, train=train, rngs=rngs, **kwargs)
    return out, variables


# ---------------------------------------------------------------------------
# encoders / decoders (model_layers.py:433-708)
# ---------------------------------------------------------------------------

def test_pose_encoder_shape(rng):
    x = jnp.asarray(rng.standard_normal((2, 16, 96)), jnp.float32)
    out, _ = init_run(PoseEncoder(input_channels=96), x)
    assert out.shape == (2, 16, 256)
    assert np.isfinite(np.asarray(out)).all()


def test_pose_style_encoder_logits(rng):
    # six stride-2 downsamples: T=64 -> 1 before the mean pool
    x = jnp.asarray(rng.standard_normal((2, 64, 96)), jnp.float32)
    out, _ = init_run(PoseStyleEncoder(input_channels=96, num_speakers=4), x)
    assert out.shape == (2, 4)


def test_text_encoder_1d_shape(rng):
    x = jnp.asarray(rng.standard_normal((2, 12, 300)), jnp.float32)
    out, _ = init_run(TextEncoder1D(input_channels=300), x)
    assert out.shape == (2, 12, 256)


def test_audio_encoder_1d_shape(rng):
    x = jnp.asarray(rng.standard_normal((2, 12, 128)), jnp.float32)
    out, _ = init_run(AudioEncoder1D(input_channels=128), x)
    assert out.shape == (2, 12, 256)


def test_pose_decoder_grouped_style_reconcat(rng):
    # input channels = (input_channels/groups + style_dim) * groups
    m = PoseDecoder(input_channels=16, style_dim=4, num_clusters=2,
                    out_feats=8)
    x = jnp.asarray(rng.standard_normal((2, 12, (16 // 2 + 4) * 2)),
                    jnp.float32)
    out, _ = init_run(m, x)
    assert out.shape == (2, 12, 8 * 2)


def test_style_decoder_shape(rng):
    m = StyleDecoder(input_channels=16, num_clusters=2, out_feats=8)
    x = jnp.asarray(rng.standard_normal((2, 12, 16)), jnp.float32)
    out, _ = init_run(m, x)
    assert out.shape == (2, 12, 8 * 2)


def test_latent_encoder_bottleneck(rng):
    m = LatentEncoder(in_channels=24, hidden_channels=16, out_channels=2)
    x = jnp.asarray(rng.standard_normal((2, 12, 24)), jnp.float32)
    out, _ = init_run(m, x)
    assert out.shape == (2, 12, 2)


def test_cluster_classify_per_frame_logits(rng):
    m = ClusterClassify(num_clusters=8, input_channels=32)
    x = jnp.asarray(rng.standard_normal((2, 12, 32)), jnp.float32)
    out, _ = init_run(m, x)
    assert out.shape == (2, 12, 8)


def test_cluster_classify_grouped(rng):
    m = ClusterClassify(num_clusters=4, input_channels=32, groups=2)
    x = jnp.asarray(rng.standard_normal((2, 12, 64)), jnp.float32)
    out, _ = init_run(m, x)
    assert out.shape == (2, 12, 4 * 2)


# ---------------------------------------------------------------------------
# misc heads (model_layers.py:613-945)
# ---------------------------------------------------------------------------

def test_confidence_entropy_finite(rng):
    m = misc.Confidence(beta=0.1)
    y = jnp.asarray(rng.standard_normal((2, 8)), jnp.float32)
    y_cap = jnp.asarray(rng.standard_normal((2, 8)), jnp.float32)
    conf = jnp.asarray(rng.uniform(0.1, 1.0, (2, 8)), jnp.float32)
    out = m(y, y_cap, conf)
    assert out.shape == (2, 8)
    assert np.isfinite(np.asarray(out)).all()
    # int confidence -> ones_like path (model_layers.py:717)
    out_int = m(y, y_cap, 1)
    assert out_int.shape == (2, 8)


def test_emblin_lookup_equals_onehot_mix(rng):
    m = misc.EmbLin(num_embeddings=5, embedding_dim=7)
    ids = jnp.asarray([0, 3, 4])
    variables = m.init(KEY, ids, mode='emb')
    looked = m.apply(variables, ids, mode='emb')
    mixed = m.apply(variables, jax.nn.one_hot(ids, 5), mode='lin')
    np.testing.assert_allclose(np.asarray(looked), np.asarray(mixed),
                               atol=1e-6)


def test_style_embedding_shape():
    m = misc.Style(num_speakers=4, embedding_dim=16)
    ids = jnp.asarray([0, 2, 3])
    variables = m.init(KEY, ids)
    out = m.apply(variables, ids)
    assert out.shape == (3, 16)


def test_repeat_interleave_matches_numpy(rng):
    x = rng.standard_normal((2, 3, 4)).astype(np.float32)
    out = misc.repeat_interleave(jnp.asarray(x), 3, axis=1)
    np.testing.assert_array_equal(np.asarray(out), np.repeat(x, 3, axis=1))


def test_transpose_two_axes(rng):
    x = rng.standard_normal((2, 3, 4)).astype(np.float32)
    out = misc.transpose(jnp.asarray(x), (1, 2))
    np.testing.assert_array_equal(np.asarray(out), x.transpose(0, 2, 1))


def test_curriculum_linear_schedule():
    # model_layers.py:926-945: step() returns the pre-increment value and
    # saturates at `end` after num_iters steps
    c = misc.Curriculum(start=0.0, end=1.0, num_iters=4)
    values = [c.step() for _ in range(6)]
    np.testing.assert_allclose(values, [0.0, 0.25, 0.5, 0.75, 1.0, 1.0])
    assert c.step(flag=False) == c.value  # peek without advancing


def test_index_select_outputs_golden(rng):
    x = rng.standard_normal((2, 3, 2 * 4)).astype(np.float32)   # groups=2
    labels = rng.uniform(0, 1, (2, 3, 2)).astype(np.float32)
    out = misc.index_select_outputs(jnp.asarray(x), jnp.asarray(labels), 2)
    xg = x.reshape(2, 3, 2, 4)
    golden = (xg * labels[..., None]).sum(axis=2)
    np.testing.assert_allclose(np.asarray(out), golden, atol=1e-6)


class _TrainAware(nn.Module):
    feats: int = 6

    @nn.compact
    def __call__(self, x, train: bool = False):
        return nn.Dense(self.feats)(x)


class _NoTrainFlag(nn.Module):
    feats: int = 6

    @nn.compact
    def __call__(self, x):
        return nn.Dense(self.feats)(x)


def test_group_channel_concat_and_split(rng):
    m = misc.Group(models=[_TrainAware(feats=8)], groups=2)
    parts = [jnp.asarray(rng.standard_normal((2, 5, 3)), jnp.float32)
             for _ in range(2)]
    variables = m.init(KEY, parts)
    out = m.apply(variables, parts)
    assert isinstance(out, list) and len(out) == 2
    assert out[0].shape == (2, 5, 4)


def test_group_soft_label_selection(rng):
    m = misc.Group(models=[_TrainAware(feats=8)], groups=2)
    x = jnp.asarray(rng.standard_normal((2, 5, 6)), jnp.float32)
    labels = jnp.asarray(rng.uniform(0, 1, (2, 5, 2)), jnp.float32)
    variables = m.init(KEY, x, labels=labels)
    out = m.apply(variables, x, labels=labels)
    assert out.shape == (2, 5, 4)


def test_group_dispatches_on_signature(rng):
    # modules without a `train` kwarg are called without it — explicit
    # signature dispatch, not `except TypeError` duck-typing
    m = misc.Group(models=[_NoTrainFlag(feats=4)], groups=1)
    x = jnp.asarray(rng.standard_normal((2, 5, 3)), jnp.float32)
    variables = m.init(KEY, x)
    out = m.apply(variables, x, train=True)
    assert out[0].shape == (2, 5, 4)


def test_group_does_not_swallow_internal_type_errors():
    def bad_model(x, train=False):
        raise TypeError('inner bug')
    m = misc.Group(models=[bad_model], groups=1)
    with pytest.raises(TypeError, match='inner bug'):
        m.init(KEY, jnp.zeros((1, 2, 3)))


def test_batch_group_roundtrip_shapes(rng):
    m = misc.BatchGroup(models=[_TrainAware(feats=8)], groups=2)
    x = [[jnp.asarray(rng.standard_normal((2, 5, 3)), jnp.float32)
          for _ in range(3)] for _ in range(2)]     # x[group][batch]
    variables = m.init(KEY, x)
    out = m.apply(variables, x)
    assert len(out) == 2 and len(out[0]) == 3
    assert out[0][0].shape == (2, 5, 4)


def test_batch_group_label_selection(rng):
    m = misc.BatchGroup(models=[_TrainAware(feats=8)], groups=2)
    x = [[jnp.asarray(rng.standard_normal((2, 5, 3)), jnp.float32)
          for _ in range(3)] for _ in range(2)]
    labels = [jnp.asarray(rng.uniform(0, 1, (2, 5, 2)), jnp.float32)
              for _ in range(3)]
    variables = m.init(KEY, x, labels=labels)
    out = m.apply(variables, x, labels=labels)
    assert len(out) == 1 and len(out[0]) == 3
    assert out[0][0].shape == (2, 5, 4)
