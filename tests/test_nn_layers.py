"""Shape + torch-golden parity tests for NN building blocks (SURVEY.md §4b).

torch (CPU) is used as the golden implementation of the conv/attention
semantics the reference relies on; weights are copied between frameworks.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from a2m import constants
from a2m.nn import (AudioEncoder, ChannelAttention, ConvNormRelu,
                    ConvTranspose1D, DenseGATConv, DenseGraphConv, GCNStack,
                    ResBlock, SelfAttention, UNet1D, UNet1DFirstVersion)

KEY = jax.random.PRNGKey(0)
HIGHEST = jax.lax.Precision.HIGHEST


def init_and_run(module, x, train=False, **kwargs):
    variables = module.init({'params': KEY, 'dropout': KEY}, x, **kwargs)
    try:
        out = module.apply(variables, x, train=train,
                           rngs={'dropout': KEY} if train else None, **kwargs)
    except TypeError:  # module without a train flag (no dropout/BN)
        out = module.apply(variables, x, **kwargs)
    return out, variables


# ---------------------------------------------------------------------------
# ConvNormRelu vs torch
# ---------------------------------------------------------------------------

@pytest.mark.parametrize('downsample', [False, True])
def test_conv_norm_relu_1d_torch_parity(rng, downsample):
    B, T, Ci, Co = 2, 16, 8, 12
    x = rng.standard_normal((B, T, Ci)).astype(np.float32)
    m = ConvNormRelu(Ci, Co, type='1d', leaky=True, downsample=downsample,
                     precision=HIGHEST)
    out, variables = init_and_run(m, jnp.asarray(x))
    w = np.asarray(variables['params']['conv']['kernel'])   # (k, Ci, Co)
    b = np.asarray(variables['params']['conv']['bias'])

    k, s = (4, 2) if downsample else (3, 1)
    tm = torch.nn.Sequential(
        torch.nn.Conv1d(Ci, Co, k, stride=s, padding=int((k - s) / 2)),
        torch.nn.BatchNorm1d(Co),
        torch.nn.LeakyReLU(0.2),
    )
    tm.eval()
    with torch.no_grad():
        tm[0].weight.copy_(torch.from_numpy(w.transpose(2, 1, 0).copy()))
        tm[0].bias.copy_(torch.from_numpy(b))
        ty = tm(torch.from_numpy(x.transpose(0, 2, 1))).numpy()
    ty = ty.transpose(0, 2, 1)
    assert out.shape == ty.shape
    np.testing.assert_allclose(np.asarray(out), ty, atol=2e-5)


def test_conv_norm_relu_2d_shapes(rng):
    x = rng.standard_normal((2, 64, 128, 1)).astype(np.float32)
    m = ConvNormRelu(1, 64, type='2d', leaky=True, downsample=True)
    out, _ = init_and_run(m, jnp.asarray(x))
    assert out.shape == (2, 32, 64, 64)


def test_conv_transpose_doubles_time(rng):
    x = rng.standard_normal((2, 16, 8)).astype(np.float32)
    m = ConvTranspose1D(8, 6)
    out, _ = init_and_run(m, jnp.asarray(x))
    assert out.shape == (2, 32, 6)


def test_conv_transpose_torch_parity(rng):
    # raw transposed-conv semantics (pre-BN) vs torch
    B, T, Ci, Co = 2, 16, 8, 6
    x = rng.standard_normal((B, T, Ci)).astype(np.float32)
    kernel = rng.standard_normal((3, Ci, Co)).astype(np.float32)
    tm = torch.nn.ConvTranspose1d(Ci, Co, 3, stride=2, padding=1,
                                  output_padding=1, bias=False)
    with torch.no_grad():
        tm.weight.copy_(torch.from_numpy(kernel.transpose(1, 2, 0).copy()))
        ty = tm(torch.from_numpy(x.transpose(0, 2, 1).copy())).numpy()
    raw = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.flip(jnp.asarray(kernel), 0), (1,), [(1, 2)],
        lhs_dilation=(2,), dimension_numbers=('NWC', 'WIO', 'NWC'),
        precision=HIGHEST)
    np.testing.assert_allclose(np.asarray(raw), ty.transpose(0, 2, 1),
                               atol=1e-5)


# ---------------------------------------------------------------------------
# Attention blocks vs torch
# ---------------------------------------------------------------------------

def test_self_attention_torch_parity(rng):
    B, T, C = 2, 16, 32
    x = rng.standard_normal((B, T, C)).astype(np.float32)
    m = SelfAttention(C)
    out, variables = init_and_run(m, jnp.asarray(x))
    p = variables['params']

    def dense(name):
        return (np.asarray(p[name]['kernel']), np.asarray(p[name]['bias']))

    qw, qb = dense('query')
    kw, kb = dense('key')
    vw, vb = dense('value')
    q = x @ qw + qb
    k = x @ kw + kb
    v = x @ vw + vb
    attn = torch.softmax(torch.from_numpy(q @ k.transpose(0, 2, 1)), dim=-1)
    expected = np.asarray(attn) @ v * 0.0 + x  # gamma init 0 -> identity
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-6)


def test_channel_attention_gating(rng):
    B, T, C = 2, 16, 32
    x = rng.standard_normal((B, T, C)).astype(np.float32)
    m = ChannelAttention(C)
    out, _ = init_and_run(m, jnp.asarray(x))
    assert out.shape == x.shape
    # output is elementwise-gated input: |out| <= |x|
    assert (np.abs(np.asarray(out)) <= np.abs(x) + 1e-6).all()


def test_res_block_residual(rng):
    x = rng.standard_normal((2, 16, 32)).astype(np.float32)
    out, _ = init_and_run(ResBlock(32), jnp.asarray(x))
    assert out.shape == x.shape


# ---------------------------------------------------------------------------
# Dense graph convs vs edge-list numpy reference (PyG semantics)
# ---------------------------------------------------------------------------

def numpy_graph_conv(x, edges, w_rel, w_root, b_root):
    """PyG GraphConv (aggr='add'): out[i] = W_root x_i + b + W_rel sum_j x_j."""
    n = x.shape[0]
    agg = np.zeros_like(x)
    for src, dst in edges:
        agg[dst] += x[src]
    return x @ w_root + b_root + agg @ w_rel


def numpy_gat(x, edges, w, att_src, att_dst, bias, heads, slope=0.2):
    """PyG GATConv with self-loops, concat=False (head mean)."""
    n, f = x.shape
    fo = w.shape[1] // heads
    xw = (x @ w).reshape(n, heads, fo)
    edge_set = {(int(s), int(d)) for s, d in edges} | {(i, i) for i in range(n)}
    out = np.zeros((n, heads, fo))
    for i in range(n):
        srcs = sorted({s for (s, d) in edge_set if d == i})
        for h in range(heads):
            logits = []
            for s in srcs:
                e = (xw[s, h] * att_src[h]).sum() + (xw[i, h] * att_dst[h]).sum()
                logits.append(e if e > 0 else slope * e)
            logits = np.asarray(logits)
            alpha = np.exp(logits - logits.max())
            alpha /= alpha.sum()
            out[i, h] = sum(a * xw[s, h] for a, s in zip(alpha, srcs))
    return out.mean(axis=1) + bias


def test_dense_graph_conv_parity(rng):
    edges = constants.body_edges()
    adj = constants.adjacency_from_edges(edges, 10)
    x = rng.standard_normal((10, 16)).astype(np.float32)
    m = DenseGraphConv(16, adj, precision=HIGHEST)
    out, variables = init_and_run(m, jnp.asarray(x))
    p = variables['params']
    expected = numpy_graph_conv(
        x, edges, np.asarray(p['lin_rel']['kernel']),
        np.asarray(p['lin_root']['kernel']),
        np.asarray(p['lin_root']['bias']))
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-5)


def test_dense_gat_parity(rng):
    edges = constants.body_edges()
    adj = constants.adjacency_from_edges(edges, 10)
    x = rng.standard_normal((10, 16)).astype(np.float32)
    m = DenseGATConv(16, adj, heads=4, concat=False, precision=HIGHEST)
    out, variables = init_and_run(m, jnp.asarray(x))
    p = variables['params']
    expected = numpy_gat(
        x, edges, np.asarray(p['lin']['kernel']),
        np.asarray(p['att_src']), np.asarray(p['att_dst']),
        np.asarray(p['bias']), heads=4)
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-5)


def test_dense_gat_batched_matches_single(rng):
    edges = constants.hand_edges()
    adj = constants.adjacency_from_edges(edges, 42)
    x = rng.standard_normal((6, 42, 8)).astype(np.float32)
    m = DenseGATConv(8, adj, heads=2)
    variables = m.init(KEY, jnp.asarray(x))
    batched = np.asarray(m.apply(variables, jnp.asarray(x)))
    single0 = np.asarray(m.apply(variables, jnp.asarray(x[0])))
    np.testing.assert_allclose(batched[0], single0, atol=1e-5)


def test_gcn_stack_shapes(rng):
    adj = constants.adjacency_from_edges(constants.hand_edges(), 42)
    x = rng.standard_normal((4, 42, 64)).astype(np.float32)
    out, _ = init_and_run(GCNStack(64, adj, num_layers=5), jnp.asarray(x))
    assert out.shape == x.shape


def test_hand_graph_has_two_roots():
    parents = constants.hand_parents()
    assert parents.count(-1) == 2  # LHandRoot and RHandRoot
    assert len(constants.hand_triples()) > 0
    assert len(constants.body_triples()) > 0


# ---------------------------------------------------------------------------
# Encoders: reference shape traces (SURVEY.md §2.2)
# ---------------------------------------------------------------------------

def test_audio_encoder_shape_trace(rng):
    x = rng.standard_normal((2, 64, 128)).astype(np.float32)
    out, _ = init_and_run(AudioEncoder(), jnp.asarray(x))
    assert out.shape == (2, 64, 256)


def test_audio_encoder_flexible_time(rng):
    x = rng.standard_normal((2, 48, 128)).astype(np.float32)
    m = AudioEncoder()
    variables = m.init(KEY, jnp.asarray(x))
    out = m.apply(variables, jnp.asarray(x), time_steps=96)
    assert out.shape == (2, 96, 256)


def test_unet1d_shape(rng):
    x = rng.standard_normal((2, 64, 256)).astype(np.float32)
    out, _ = init_and_run(UNet1D(256, 256), jnp.asarray(x))
    assert out.shape == (2, 64, 256)


def test_unet1d_first_version(rng):
    x = rng.standard_normal((2, 64, 32)).astype(np.float32)
    m = UNet1DFirstVersion(32, 32, max_depth=2)
    out, _ = init_and_run(m, jnp.asarray(x))
    assert out.shape == (2, 64, 32)


def test_unet_first_version_asserts_divisibility(rng):
    x = rng.standard_normal((2, 60, 32)).astype(np.float32)
    with pytest.raises(AssertionError):
        init_and_run(UNet1DFirstVersion(32, 32, max_depth=3), jnp.asarray(x))


def test_batchnorm_train_updates_stats(rng):
    x = rng.standard_normal((8, 16, 4)).astype(np.float32) * 3 + 1
    m = ConvNormRelu(4, 4)
    variables = m.init({'params': KEY, 'dropout': KEY}, jnp.asarray(x))
    _, mutated = m.apply(variables, jnp.asarray(x), train=True,
                         rngs={'dropout': KEY}, mutable=['batch_stats'])
    new_mean = np.asarray(mutated['batch_stats']['norm']['mean'])
    old_mean = np.asarray(variables['batch_stats']['norm']['mean'])
    assert not np.allclose(new_mean, old_mean)


# ---------------------------------------------------------------------------
# mask-aware BatchNorm (a2m/nn/masking.py)
# ---------------------------------------------------------------------------

def test_masked_bn_matches_flax_unmasked():
    """No mask (or all-ones) == standard flax BatchNorm numerics."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from flax import linen as nn
    from a2m.nn.masking import MaskedBatchNorm, batch_mask

    x = jnp.asarray(np.random.default_rng(0).standard_normal((4, 8, 6)),
                    jnp.float32)
    ours = MaskedBatchNorm(use_running_average=False)
    ref = nn.BatchNorm(use_running_average=False, momentum=0.9,
                       epsilon=1e-5, dtype=jnp.float32,
                       use_fast_variance=False)
    vo = ours.init(jax.random.PRNGKey(0), x)
    vr = ref.init(jax.random.PRNGKey(0), x)
    yo, mo = ours.apply(vo, x, mutable=['batch_stats'])
    yr, mr = ref.apply(vr, x, mutable=['batch_stats'])
    np.testing.assert_allclose(np.asarray(yo), np.asarray(yr),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(mo['batch_stats']['mean']),
        np.asarray(mr['batch_stats']['mean']), rtol=1e-6)
    # all-ones mask identical to no mask
    with batch_mask(jnp.ones(4)):
        y1, m1 = ours.apply(vo, x, mutable=['batch_stats'])
    np.testing.assert_allclose(np.asarray(y1), np.asarray(yo), rtol=1e-6)


def test_masked_bn_excludes_padded_rows():
    """Masked moments == moments of the real-row sub-batch; padded-row
    corruption cannot change real rows' outputs or running stats."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from a2m.nn.masking import MaskedBatchNorm, batch_mask

    rng = np.random.default_rng(1)
    x_real = jnp.asarray(rng.standard_normal((3, 8, 6)), jnp.float32)
    x_pad = jnp.concatenate([x_real, 1000.0 * jnp.ones((1, 8, 6))], axis=0)
    mask = jnp.asarray([1.0, 1.0, 1.0, 0.0])

    bn = MaskedBatchNorm(use_running_average=False)
    v = bn.init(jax.random.PRNGKey(0), x_real)
    y_sub, m_sub = bn.apply(v, x_real, mutable=['batch_stats'])
    with batch_mask(mask):
        y_pad, m_pad = bn.apply(v, x_pad, mutable=['batch_stats'])
    # reduction trees differ between the 3- and 4-row shapes, so equality
    # is up to f32 summation rounding (same-shape inertness is bit-exact —
    # see test_train.py::test_ragged_batch_trains_with_masked_losses)
    np.testing.assert_allclose(np.asarray(y_pad[:3]), np.asarray(y_sub),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(m_pad['batch_stats']['mean']),
        np.asarray(m_sub['batch_stats']['mean']), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(m_pad['batch_stats']['var']),
        np.asarray(m_sub['batch_stats']['var']), rtol=1e-5, atol=1e-6)
