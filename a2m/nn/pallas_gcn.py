"""Fused 5-layer GCN stack as a single Pallas TPU kernel (eval mode).

Why: the device trace of the generator forward shows the GAT/GraphConv
stacks cost ~17 ms of a 35.6 ms forward at B=128 — not in FLOPs (the
per-graph matrices are tiny: J in {10, 42}, F = 64) but in HBM round trips
and layout copies between the 10+ XLA fusions a 5-layer stack lowers to.
Fused, the whole stack reads its (N, J, F) input from HBM once, runs all
five layers (GAT -> GraphConv -> ... with LayerNorm + LeakyReLU + residual,
`a2m/nn/graph.py::GCNStack` semantics, real_motion_model.py:172-201) out of
VMEM, and writes once.

Scope: inference only (train=False — no dropout, no gradient path).  The
training path keeps the XLA formulation; :class:`a2m.nn.graph.GCNStack`
switches here via its ``fused`` flag.

Layout: the N = B*T graph instances tile over the grid; weights are
broadcast to every program.  Matmuls run through the MXU as
(TILE*J, F) x (F, ...) GEMMs with bf16 operands and f32 accumulation —
the same contraction precision XLA picks for these layers at default
precision.  The attention application is a 3-D batched matmul
(TILE, J, J) @ (TILE, J, F) per head.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: rows (graph instances) processed per program — VMEM-bound: the unrolled
#: per-head attention keeps several (TILE, J, J) and (TILE*J, H*F) buffers
#: live.  Measured at J=42/F=64/H=4: TILE=64 needs 33.0 MB scoped VMEM,
#: TILE=32 needs 16.21 MB (216 KB over the 16 MB limit); 16 fits and is
#: also the fastest fitting tile (23.7 ms vs 24.5 ms at TILE=24).
TILE = 16
LN_EPS = 1e-6


def extract_stack_params(stack_params, num_layers: int = 5) -> tuple:
    """GCNStack variables['params'] subtree -> flat tuple in kernel order.

    Per layer i (1-based): GAT layers (odd i) contribute
    (lin/kernel, att_src, att_dst, bias); GraphConv layers (even i)
    (lin_rel/kernel, lin_root/kernel, lin_root/bias); every layer appends
    its (norm/scale, norm/bias).
    """
    flat = []
    for i in range(1, num_layers + 1):
        layer = stack_params[f'gcn{i}']
        if (i - 1) % 2 == 0:      # DenseGATConv
            flat += [layer['lin']['kernel'], layer['att_src'],
                     layer['att_dst'], layer['bias']]
        else:                     # DenseGraphConv
            flat += [layer['lin_rel']['kernel'],
                     layer['lin_root']['kernel'],
                     layer['lin_root']['bias']]
        norm = stack_params[f'norm{i}']
        flat += [norm['scale'], norm['bias']]
    return tuple(jnp.asarray(p) for p in flat)


def _layer_norm(x, scale, bias):
    x32 = x.astype(jnp.float32)
    mean = x32.mean(axis=-1, keepdims=True)
    var = ((x32 - mean) ** 2).mean(axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + LN_EPS)
    return y * scale + bias


def _mm(a, b, mm_dtype):
    """(M, K) @ (K, N) on the MXU with f32 accumulation."""
    return jax.lax.dot_general(
        a.astype(mm_dtype), b.astype(mm_dtype),
        (((a.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _gat(x, mask, w, att_src, att_dst, bias, heads: int, mm_dtype):
    """DenseGATConv eval semantics on a (TILE, J, F) block."""
    t, j, f = x.shape
    xw_flat = _mm(x.reshape(t * j, f), w, mm_dtype)    # (T*J, H*F)
    out = jnp.zeros((t, j, f), jnp.float32)
    neg_inf = jnp.float32(-jnp.inf)
    for h in range(heads):                              # unrolled: H is 2-4
        xwh = xw_flat[:, h * f:(h + 1) * f].reshape(t, j, f)
        a_src = (xwh * att_src[h]).sum(axis=-1)         # (T, J)
        a_dst = (xwh * att_dst[h]).sum(axis=-1)
        e = a_dst[:, :, None] + a_src[:, None, :]       # (T, Jd, Js)
        e = jnp.where(e >= 0, e, 0.2 * e)               # leaky_relu
        e = jnp.where(mask[None, :, :] > 0, e, neg_inf)
        alpha = jax.nn.softmax(e, axis=-1)
        out = out + jax.lax.dot_general(                # batched (J,J)@(J,F)
            alpha.astype(mm_dtype), xwh.astype(mm_dtype),
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
    return out / heads + bias


def _graph_conv(x, adj, w_rel, w_root, b, mm_dtype):
    """DenseGraphConv semantics on a (TILE, J, F) block."""
    t, j, f = x.shape
    neigh = jax.lax.dot_general(                        # adj @ x per graph
        jnp.broadcast_to(adj.astype(mm_dtype), (t, j, j)),
        x.astype(mm_dtype),
        (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    flat = _mm(neigh.reshape(t * j, f), w_rel, mm_dtype) + _mm(
        x.reshape(t * j, f), w_root, mm_dtype)
    return flat.reshape(t, j, f) + b


def _kernel(num_layers, heads, mm_dtype, x_ref, adj_ref, mask_ref, *refs):
    *param_refs, out_ref = refs
    x = x_ref[...].astype(jnp.float32)                  # (TILE, J, F)
    adj = adj_ref[...]
    mask = mask_ref[...]
    p = 0
    for i in range(num_layers):
        residual = x
        if i % 2 == 0:
            w, a_s, a_d, b = (r[...] for r in param_refs[p:p + 4])
            p += 4
            x = _gat(x, mask, w, a_s, a_d, b, heads, mm_dtype)
        else:
            w_rel, w_root, b = (r[...] for r in param_refs[p:p + 3])
            p += 3
            x = _graph_conv(x, adj, w_rel, w_root, b, mm_dtype)
        scale, bias = param_refs[p][...], param_refs[p + 1][...]
        p += 2
        x = _layer_norm(x, scale, bias)
        x = jnp.where(x >= 0, x, 0.2 * x) + residual    # leaky + residual
    out_ref[...] = x.astype(out_ref.dtype)


def fused_gcn_stack(x: jnp.ndarray, params: tuple, adjacency,
                    heads: int = 4, num_layers: int = 5,
                    precise: bool = False) -> jnp.ndarray:
    """Run the fused stack.  ``x``: (..., J, F); returns the same shape.

    ``params``: tuple from :func:`extract_stack_params`; ``adjacency``:
    (J, J) constant numpy float, A[dst, src] WITHOUT self-loops (GAT adds
    them, GraphConv does not — matching a2m/nn/graph.py).
    """
    adj_np = np.asarray(adjacency, np.float32)
    mask_np = (np.maximum(adj_np, np.eye(adj_np.shape[0]))
               > 0).astype(np.float32)
    args = (x, params, jnp.asarray(adj_np), jnp.asarray(mask_np), heads,
            num_layers, precise)
    if jax.default_backend() != 'tpu':
        # tests: eager TPU-interpreter execution (the context must be
        # active when pallas_call lowers, i.e. outside jit)
        with pltpu.force_tpu_interpret_mode():
            return _fused_impl(*args)
    return _fused_jit(*args)


def _fused_impl(x, params, adj, mask, heads, num_layers, precise=False):
    lead = x.shape[:-2]
    j, f = x.shape[-2:]
    n = int(np.prod(lead)) if lead else 1
    xf = x.reshape(n, j, f)
    pad = (-n) % TILE
    if pad:
        xf = jnp.concatenate([xf, jnp.zeros((pad, j, f), xf.dtype)], axis=0)
    n_pad = n + pad

    bcast = lambda s: pl.BlockSpec(s, lambda i: (0,) * len(s))  # noqa: E731
    in_specs = [pl.BlockSpec((TILE, j, f), lambda i: (i, 0, 0)),
                bcast((j, j)), bcast((j, j))]
    in_specs += [bcast(p.shape) for p in params]

    kernel = functools.partial(_kernel, num_layers, heads,
                               jnp.float32 if precise else jnp.bfloat16)
    call = pl.pallas_call(
        kernel,
        grid=(n_pad // TILE,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((TILE, j, f), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n_pad, j, f), x.dtype),
    )
    out = call(xf, adj, mask, *params)
    return out[:n].reshape(*lead, j, f)


_fused_jit = jax.jit(_fused_impl,
                     static_argnames=('heads', 'num_layers', 'precise'))
