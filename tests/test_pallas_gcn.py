"""Fused Pallas GCN-stack tests (a2m/nn/pallas_gcn.py).

CPU runs in TPU-interpreter mode; parity golden is the XLA GCNStack.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.lax import Precision

from a2m import constants
from a2m.nn import pallas_gcn
from a2m.nn.graph import GCNStack

HAND_ADJ = constants.adjacency_from_edges(constants.hand_edges(), 42)
BODY_ADJ = constants.adjacency_from_edges(constants.body_edges(), 10)


def _setup(adj, f=16, heads=2, seed=0, shape=(2, 3)):
    stack = GCNStack(f, adj, num_layers=5, heads=heads,
                     precision=Precision.HIGHEST)
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((*shape, adj.shape[0], f)),
                    jnp.float32)
    v = stack.init(jax.random.PRNGKey(seed), x)
    return stack, v, x


def test_fused_precise_matches_xla_hand():
    """f32-matmul kernel == HIGHEST-precision XLA stack to ~1e-5 (exact
    math parity; the bf16 default is a precision choice on top)."""
    stack, v, x = _setup(HAND_ADJ)
    ref = np.asarray(stack.apply(v, x, train=False))
    got = np.asarray(pallas_gcn.fused_gcn_stack(
        x, pallas_gcn.extract_stack_params(v['params']), HAND_ADJ,
        heads=2, precise=True))
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_fused_precise_matches_xla_body():
    stack, v, x = _setup(BODY_ADJ, seed=1)
    ref = np.asarray(stack.apply(v, x, train=False))
    got = np.asarray(pallas_gcn.fused_gcn_stack(
        x, pallas_gcn.extract_stack_params(v['params']), BODY_ADJ,
        heads=2, precise=True))
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_fused_bf16_close_and_pads_ragged_rows():
    """Default bf16-matmul mode stays within bf16 tolerance, including the
    wrap-pad path (N=6 graphs, TILE=16 -> padded)."""
    stack, v, x = _setup(HAND_ADJ)
    ref = np.asarray(stack.apply(v, x, train=False))
    got = np.asarray(pallas_gcn.fused_gcn_stack(
        x, pallas_gcn.extract_stack_params(v['params']), HAND_ADJ, heads=2))
    scale = np.abs(ref).max()
    assert np.abs(got - ref).max() < 0.01 * scale


def test_generator_fused_flag_matches_unfused(rng):
    """GeneratorConfig.fused_gcn routes eval through the kernel; same param
    tree, output within bf16-matmul tolerance of the XLA path."""
    from a2m.config import GeneratorConfig
    from a2m.models import Generator
    cfg = GeneratorConfig(in_channels=16, out_channels=16, joint_feat_dim=8,
                          gat_heads=2)
    audio = jnp.asarray(rng.standard_normal((1, 64, 128)), jnp.float32)
    g = Generator(cfg)
    key = jax.random.PRNGKey(0)
    v = g.init({'params': key, 'dropout': key}, audio)
    ref = np.asarray(g.apply(v, audio, train=False))
    g_fused = Generator(dataclasses.replace(cfg, fused_gcn=True))
    # identical param tree: the fused path reuses the XLA-path params
    v2 = g_fused.init({'params': key, 'dropout': key}, audio)
    assert (jax.tree.structure(v2['params'])
            == jax.tree.structure(v['params']))
    got = np.asarray(g_fused.apply(v, audio, train=False))
    scale = np.abs(ref).max()
    assert np.abs(got - ref).max() < 0.02 * scale


# ---------------------------------------------------------------------------
# trainable fused stack (custom VJP + fused backward kernel)
# ---------------------------------------------------------------------------

def _grad_setup(adj, seed=0, shape=(2, 3), f=16, heads=2):
    stack, v, x = _setup(adj, f=f, heads=heads, seed=seed, shape=shape)
    params = pallas_gcn.extract_stack_params(v['params'])
    rng = np.random.default_rng(seed + 100)
    w = jnp.asarray(rng.standard_normal(
        (*shape, adj.shape[0], f)), jnp.float32)   # nontrivial cotangent
    return stack, v, x, params, w


def test_fused_trainable_primal_matches_eval_kernel():
    stack, v, x, params, _ = _grad_setup(HAND_ADJ)
    a = np.asarray(pallas_gcn.fused_gcn_stack(
        x, params, HAND_ADJ, heads=2, precise=True))
    b = np.asarray(pallas_gcn.fused_gcn_stack_trainable(
        x, params, HAND_ADJ, heads=2, precise=True))
    np.testing.assert_allclose(b, a, atol=1e-6)


def test_fused_trainable_grads_match_xla_hand():
    """d/dx and d/dparams of the fused stack == jax.grad of the XLA
    GCNStack (f32 kernels, HIGHEST XLA precision)."""
    stack, v, x, params, w = _grad_setup(HAND_ADJ)

    def loss_fused(x, params):
        y = pallas_gcn.fused_gcn_stack_trainable(x, params, HAND_ADJ,
                                                 heads=2, precise=True)
        return (y * w).sum()

    def loss_xla(x, pdict):
        y = stack.apply({'params': pdict}, x, train=False)
        return (y * w).sum()

    gx_f, gp_f = jax.grad(loss_fused, argnums=(0, 1))(x, params)
    gx_r, gp_r_tree = jax.grad(loss_xla, argnums=(0, 1))(x, v['params'])
    gp_r = pallas_gcn.extract_stack_params(gp_r_tree)  # same flattening

    scale = np.abs(np.asarray(gx_r)).max()
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r),
                               atol=2e-4 * scale)
    assert len(gp_f) == len(gp_r)
    for i, (a, b) in enumerate(zip(gp_f, gp_r)):
        s = max(np.abs(np.asarray(b)).max(), 1e-3)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4 * s, err_msg=f'param {i}')


def test_fused_rolled_eval_matches_unrolled():
    """rolled=True (fori_loop head loop, stacked per-head weights) is the
    same math as the unrolled kernel — exact in f32."""
    stack, v, x = _setup(HAND_ADJ)
    params = pallas_gcn.extract_stack_params(v['params'])
    a = np.asarray(pallas_gcn.fused_gcn_stack(
        x, params, HAND_ADJ, heads=2, precise=True))
    b = np.asarray(pallas_gcn.fused_gcn_stack(
        x, params, HAND_ADJ, heads=2, precise=True, rolled=True))
    # fori accumulation order differs from the unrolled sum -> f32 noise
    np.testing.assert_allclose(b, a, atol=1e-5)


def test_fused_rolled_grads_match_xla():
    """rolled trainable path: grads in the ORIGINAL param layout, matching
    jax.grad of the XLA stack."""
    stack, v, x, params, w = _grad_setup(HAND_ADJ, seed=3)

    def loss_fused(x, params):
        y = pallas_gcn.fused_gcn_stack_trainable(x, params, HAND_ADJ,
                                                 heads=2, precise=True,
                                                 rolled=True)
        return (y * w).sum()

    def loss_xla(x, pdict):
        y = stack.apply({'params': pdict}, x, train=False)
        return (y * w).sum()

    gx_f, gp_f = jax.grad(loss_fused, argnums=(0, 1))(x, params)
    gx_r, gp_r_tree = jax.grad(loss_xla, argnums=(0, 1))(x, v['params'])
    gp_r = pallas_gcn.extract_stack_params(gp_r_tree)
    scale = np.abs(np.asarray(gx_r)).max()
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r),
                               atol=2e-4 * scale)
    assert len(gp_f) == len(gp_r)
    for i, (a, b) in enumerate(zip(gp_f, gp_r)):
        assert a.shape == b.shape, f'param {i} layout'
        s = max(np.abs(np.asarray(b)).max(), 1e-3)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4 * s, err_msg=f'param {i}')


def test_fused_trainable_reused_across_two_jits():
    """The cached custom_vjp closure must survive a SECOND jit trace.

    g_step and d_step both jit the generator; the first trace populates
    _TRAINABLE_CACHE for the (adj, heads, layers) key, and the second trace
    reuses it.  Regression: the closure once captured jnp constants created
    inside the first trace (tracers) -> UnexpectedTracerError on the
    second trace (seen on the real TPU; interpret-mode single-trace tests
    missed it)."""
    pallas_gcn._TRAINABLE_CACHE.clear()
    stack, v, x, params, w = _grad_setup(BODY_ADJ, seed=7)

    @jax.jit
    def first(x, params):
        def loss(x, params):
            y = pallas_gcn.fused_gcn_stack_trainable(x, params, BODY_ADJ,
                                                     heads=2, precise=True)
            return (y * w).sum()
        return jax.grad(loss)(x, params)

    @jax.jit
    def second(x, params):  # distinct jit -> distinct trace, shared cache
        y = pallas_gcn.fused_gcn_stack_trainable(x, params, BODY_ADJ,
                                                 heads=2, precise=True)
        return y.sum()

    g1 = first(x, params)
    out = second(x, params)      # raised UnexpectedTracerError before fix
    assert np.isfinite(np.asarray(out))
    assert all(np.isfinite(np.asarray(g)).all() for g in jax.tree.leaves(g1))


def test_fused_trainable_grads_match_xla_body():
    stack, v, x, params, w = _grad_setup(BODY_ADJ, seed=2)

    def loss_fused(x, params):
        y = pallas_gcn.fused_gcn_stack_trainable(x, params, BODY_ADJ,
                                                 heads=2, precise=True)
        return (y * w).sum()

    def loss_xla(x, pdict):
        y = stack.apply({'params': pdict}, x, train=False)
        return (y * w).sum()

    gx_f, gp_f = jax.grad(loss_fused, argnums=(0, 1))(x, params)
    gx_r, gp_r_tree = jax.grad(loss_xla, argnums=(0, 1))(x, v['params'])
    gp_r = pallas_gcn.extract_stack_params(gp_r_tree)
    scale = np.abs(np.asarray(gx_r)).max()
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r),
                               atol=2e-4 * scale)
    for i, (a, b) in enumerate(zip(gp_f, gp_r)):
        s = max(np.abs(np.asarray(b)).max(), 1e-3)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4 * s, err_msg=f'param {i}')


def test_fused_tile_override_matches_default():
    """tile= changes only the grid blocking (incl. ragged padding to the
    larger tile): outputs are identical math."""
    stack, v, x = _setup(HAND_ADJ)          # leading dims (2, 3) -> n=6
    params = pallas_gcn.extract_stack_params(v['params'])
    a = np.asarray(pallas_gcn.fused_gcn_stack(
        x, params, HAND_ADJ, heads=2, precise=True, rolled=True))
    b = np.asarray(pallas_gcn.fused_gcn_stack(
        x, params, HAND_ADJ, heads=2, precise=True, rolled=True, tile=32))
    np.testing.assert_allclose(b, a, atol=1e-5)


def test_fused_tile_override_trainable_grads():
    """tile= on the trainable path: same grads as the XLA stack."""
    stack, v, x, params, w = _grad_setup(BODY_ADJ, seed=5)

    def loss_fused(x, params):
        y = pallas_gcn.fused_gcn_stack_trainable(x, params, BODY_ADJ,
                                                 heads=2, precise=True,
                                                 rolled=True, tile=32)
        return (y * w).sum()

    def loss_xla(x, pdict):
        y = stack.apply({'params': pdict}, x, train=False)
        return (y * w).sum()

    gx_f, _ = jax.grad(loss_fused, argnums=(0, 1))(x, params)
    gx_r, _ = jax.grad(loss_xla, argnums=(0, 1))(x, v['params'])
    scale = np.abs(np.asarray(gx_r)).max()
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r),
                               atol=2e-4 * scale)


def test_fused_edge_matches_xla_hand_and_body():
    """edge-incidence v2 kernel (constant S/D gather-GEMMs, (J, TILE, F)
    layout) == HIGHEST-precision XLA stack, incl. ragged padding."""
    for adj in (HAND_ADJ, BODY_ADJ):
        stack, v, x = _setup(adj)
        ref = np.asarray(stack.apply(v, x, train=False))
        params = pallas_gcn.extract_stack_params(v['params'])
        out = np.asarray(pallas_gcn.fused_gcn_stack(
            x, params, adj, heads=2, precise=True, edge_form=True, tile=8))
        np.testing.assert_allclose(out, ref, atol=2e-5)


def test_fused_edge_trainable_primal_and_grads():
    """edge primal under the trainable wrapper; grads route through the
    dense backward kernels and match jax.grad of the XLA stack."""
    stack, v, x, params, w = _grad_setup(HAND_ADJ, seed=7)

    def loss_fused(x, params):
        y = pallas_gcn.fused_gcn_stack_trainable(
            x, params, HAND_ADJ, heads=2, precise=True, rolled=True,
            edge_form=True, tile=8)
        return (y * w).sum()

    def loss_xla(x, pdict):
        y = stack.apply({'params': pdict}, x, train=False)
        return (y * w).sum()

    # primal parity
    y_f = pallas_gcn.fused_gcn_stack_trainable(
        x, params, HAND_ADJ, heads=2, precise=True, rolled=True,
        edge_form=True, tile=8)
    y_r = stack.apply(v, x, train=False)
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_r), atol=2e-5)

    gx_f, gp_f = jax.grad(loss_fused, argnums=(0, 1))(x, params)
    gx_r, gp_r_tree = jax.grad(loss_xla, argnums=(0, 1))(x, v['params'])
    gp_r = pallas_gcn.extract_stack_params(gp_r_tree)
    scale = np.abs(np.asarray(gx_r)).max()
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r),
                               atol=2e-4 * scale)
    for i, (a, b) in enumerate(zip(gp_f, gp_r)):
        s = max(np.abs(np.asarray(b)).max(), 1e-3)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4 * s, err_msg=f'param {i}')


def test_generator_fused_edge_flag_matches_unfused(rng):
    """Generator(fused_gcn + fused_edge) == Generator() at eval (within
    the kernel's bf16-matmul tolerance, as the dense-kernel twin test)."""
    import dataclasses as dc
    from a2m.config import GeneratorConfig
    from a2m.models import Generator

    cfg = GeneratorConfig(in_channels=16, out_channels=16, joint_feat_dim=8,
                          gat_heads=2)
    audio = jnp.asarray(rng.standard_normal((2, 64, 128)), jnp.float32)
    base = Generator(cfg)
    v = base.init({'params': jax.random.PRNGKey(0),
                   'dropout': jax.random.PRNGKey(1)}, audio)
    ref = np.asarray(base.apply(v, audio, train=False))
    fused = Generator(dc.replace(cfg, fused_gcn=True, fused_edge=True,
                                 fused_tile=8))
    out = np.asarray(fused.apply(v, audio, train=False))
    scale = np.abs(ref).max()
    assert np.abs(out - ref).max() < 0.02 * scale
