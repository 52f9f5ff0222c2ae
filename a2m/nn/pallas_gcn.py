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

import contextlib
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret_ctx():
    """TPU-interpreter mode for non-TPU backends, active at the pallas_call
    site itself (backward kernels bind outside any caller-level context)."""
    if jax.default_backend() != 'tpu':
        return pltpu.force_tpu_interpret_mode()
    return contextlib.nullcontext()

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


def _attn_stats(xwh, mask, a_s, a_d):
    """(alpha, e) for one head from projected features (T, J, F).

    NOTE two "optimizations" were implemented and MEASURED SLOWER here on
    v5e (scripts/gcn_cost_probe.py attribution notwithstanding): a
    coarse-shift masked softmax (per-(T,) bound instead of the per-row
    masked max) and pair-wise head projection GEMMs — together hand stack
    26.2 vs 20.9 ms.  The straightforward -inf mask + jax.nn.softmax
    lowering is what Mosaic schedules best; keep it."""
    a_src = (xwh * a_s).sum(axis=-1)                    # (T, J)
    a_dst = (xwh * a_d).sum(axis=-1)
    e = a_dst[:, :, None] + a_src[:, None, :]           # (T, Jd, Js)
    el = jnp.where(e >= 0, e, 0.2 * e)
    em = jnp.where(mask[None, :, :] > 0, el, jnp.float32(-jnp.inf))
    return jax.nn.softmax(em, axis=-1), e


def _gat(x, mask, w, att_src, att_dst, bias, heads: int, mm_dtype):
    """DenseGATConv eval semantics on a (TILE, J, F) block.

    NOTE a concat-heads apply (one (T,J,H*J)x(T,H*J,F) GEMM replacing the
    H per-head batched applies) was implemented and MEASURED SLOWER on
    v5e (hand stack 36.3 vs 20.9 ms) — the concat buffers cost more than
    the batched-dispatch savings; the per-head applies stay."""
    t, j, f = x.shape
    xw_flat = _mm(x.reshape(t * j, f), w, mm_dtype)    # (T*J, H*F)
    out = jnp.zeros((t, j, f), jnp.float32)
    for h in range(heads):                              # unrolled: H is 2-4
        xwh = xw_flat[:, h * f:(h + 1) * f].reshape(t, j, f)
        alpha, _ = _attn_stats(xwh, mask, att_src[h], att_dst[h])
        out = out + jax.lax.dot_general(                # batched (J,J)@(J,F)
            alpha.astype(mm_dtype), xwh.astype(mm_dtype),
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
    return out / heads + bias


def _head_attention(x_flat, mask, wh, a_s, a_d, t, j, f, mm_dtype):
    """One head's (alpha, xwh, e) from per-head weight (F_in, F) and
    attention vectors (1, F) — shared by rolled forward and backward."""
    xwh = _mm(x_flat, wh, mm_dtype).reshape(t, j, f)
    alpha, e = _attn_stats(xwh, mask, a_s, a_d)
    return alpha, xwh, e


def _dyn_index0(a, h):
    """Value-level dynamic index along the leading axis, Mosaic-safe.

    Mosaic's TC lowering has no ``dynamic_slice`` rule for VALUES (only for
    ref loads), so ``lax.dynamic_index_in_dim`` inside a kernel fori_loop
    fails to lower on real TPU (interpret mode accepts it).  An iota mask +
    sum over the small leading head axis (H <= 4) lowers everywhere and
    reads the same selected slice exactly (zeros elsewhere)."""
    idx = jax.lax.broadcasted_iota(jnp.int32, a.shape, 0)
    return jnp.where(idx == h, a, jnp.zeros_like(a)).sum(axis=0)


def _dyn_add0(acc, h, upd):
    """``acc[h] += upd`` on a value, Mosaic-safe (see :func:`_dyn_index0`).

    ``upd`` broadcasts against ``acc[1:]``; rows other than ``h`` are
    unchanged (adds an exact 0)."""
    idx = jax.lax.broadcasted_iota(jnp.int32, acc.shape, 0)
    return acc + jnp.where(idx == h, jnp.broadcast_to(upd[None], acc.shape),
                           jnp.zeros_like(acc))


def _gat_rolled(x, mask, w_h, att_src, att_dst, bias, heads: int, mm_dtype):
    """:func:`_gat` with the head loop ROLLED (``lax.fori_loop``) — ~4x
    fewer Mosaic instructions, cutting the remote-compile wall per kernel.

    Rolled layout (see :func:`_roll_gat_params`): ``w_h`` (H, F_in, F) and
    ``att_src``/``att_dst`` (H, 1, F) so the per-head dynamic index lands on
    an UNTILED leading axis (sublane-aligned slicing is not required)."""
    t, j, f = x.shape
    x_flat = x.reshape(t * j, f)

    def body(h, out):
        wh = _dyn_index0(w_h, h)
        a_s = _dyn_index0(att_src, h)
        a_d = _dyn_index0(att_dst, h)
        alpha, xwh, _ = _head_attention(x_flat, mask, wh, a_s, a_d, t, j, f,
                                        mm_dtype)
        return out + jax.lax.dot_general(
            alpha.astype(mm_dtype), xwh.astype(mm_dtype),
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)

    out = jax.lax.fori_loop(0, heads, body,
                            jnp.zeros((t, j, f), jnp.float32))
    return out / heads + bias


def _roll_gat_params(params: tuple, num_layers: int) -> tuple:
    """Kernel-order tuple -> rolled-head layout for the GAT layers:
    w (F_in, H*F) -> (H, F_in, F); att_src/att_dst (H, F) -> (H, 1, F).
    Runs OUTSIDE the kernel (plain XLA ops, once per call)."""
    out = list(params)
    offs, _ = _param_offsets(num_layers)
    for i, (start, _cnt, _ln) in enumerate(offs):
        if i % 2 == 0:
            w, att_src = params[start], params[start + 1]
            h, f = att_src.shape
            f_in = w.shape[0]
            out[start] = w.reshape(f_in, h, f).transpose(1, 0, 2)
            out[start + 1] = att_src[:, None, :]
            out[start + 2] = params[start + 2][:, None, :]
    return tuple(out)


def _unroll_gat_grads(dparams: tuple, num_layers: int) -> tuple:
    """Inverse of :func:`_roll_gat_params` for the gradient tuple."""
    out = list(dparams)
    offs, _ = _param_offsets(num_layers)
    for i, (start, _cnt, _ln) in enumerate(offs):
        if i % 2 == 0:
            dw = dparams[start]                         # (H, F_in, F)
            h, f_in, f = dw.shape
            out[start] = dw.transpose(1, 0, 2).reshape(f_in, h * f)
            out[start + 1] = dparams[start + 1][:, 0, :]
            out[start + 2] = dparams[start + 2][:, 0, :]
    return tuple(out)


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


def _kernel(num_layers, heads, mm_dtype, rolled, x_ref, adj_ref, mask_ref,
            *refs):
    *param_refs, out_ref = refs
    x = x_ref[...].astype(jnp.float32)                  # (TILE, J, F)
    adj = adj_ref[...]
    mask = mask_ref[...]
    gat = _gat_rolled if rolled else _gat
    p = 0
    for i in range(num_layers):
        residual = x
        if i % 2 == 0:
            w, a_s, a_d, b = (r[...] for r in param_refs[p:p + 4])
            p += 4
            x = gat(x, mask, w, a_s, a_d, b, heads, mm_dtype)
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
                    precise: bool = False,
                    rolled: bool = False,
                    tile: int | None = None,
                    edge_form: bool = False) -> jnp.ndarray:
    """Run the fused stack.  ``x``: (..., J, F); returns the same shape.

    ``params``: tuple from :func:`extract_stack_params`; ``adjacency``:
    (J, J) constant numpy float, A[dst, src] WITHOUT self-loops (GAT adds
    them, GraphConv does not — matching a2m/nn/graph.py).  ``rolled``
    selects the fori_loop head loop (same math, ~4x fewer Mosaic
    instructions -> faster remote compile; see :func:`_gat_rolled`).
    ``tile`` overrides the rows-per-program block size (default
    :data:`TILE`, or :data:`EDGE_TILE` for the edge kernel; the rolled and
    edge layouts keep fewer live buffers, so larger tiles fit VMEM than
    the unrolled measurements suggest).  ``edge_form`` selects the v2
    kernel: (J, TILE, F) layout with constant edge-incidence GEMMs instead
    of per-graph batched matmuls (same math; ``rolled`` is ignored).
    """
    adj_np = np.asarray(adjacency, np.float32)
    mask_np = (np.maximum(adj_np, np.eye(adj_np.shape[0]))
               > 0).astype(np.float32)
    if edge_form:
        _check_edge_backend()
        s_mat, d_mat, dt_mat = edge_matrices(adj_np)
        args = (x, params, jnp.asarray(adj_np), jnp.asarray(mask_np),
                jnp.asarray(s_mat), jnp.asarray(d_mat), jnp.asarray(dt_mat),
                heads, num_layers, precise, tile)
        if jax.default_backend() != 'tpu':
            with pltpu.force_tpu_interpret_mode():
                return _fused_impl_edge(*args)
        return _fused_edge_jit(*args)
    if rolled:
        params = _roll_gat_params(params, num_layers)
    args = (x, params, jnp.asarray(adj_np), jnp.asarray(mask_np), heads,
            num_layers, precise, rolled, tile)
    if jax.default_backend() != 'tpu':
        # tests: eager TPU-interpreter execution (the context must be
        # active when pallas_call lowers, i.e. outside jit)
        with pltpu.force_tpu_interpret_mode():
            return _fused_impl(*args)
    return _fused_jit(*args)


def _default_tile(j: int) -> int:
    """Rows-per-program default by graph size (v5e sweep, rolled kernels):
    J=42 -> 16 (20.9 ms; 32 parity, 64 OOM), J=10 -> 64 (6.33 vs 7.67 ms
    at 16) — small graphs leave VMEM headroom for bigger tiles."""
    return 64 if j <= 16 else TILE


def _fused_impl(x, params, adj, mask, heads, num_layers, precise=False,
                rolled=False, tile=None):
    lead = x.shape[:-2]
    j, f = x.shape[-2:]
    tile = tile or _default_tile(j)
    n = int(np.prod(lead)) if lead else 1
    xf = x.reshape(n, j, f)
    pad = (-n) % tile
    if pad:
        xf = jnp.concatenate([xf, jnp.zeros((pad, j, f), xf.dtype)], axis=0)
    n_pad = n + pad

    bcast = lambda s: pl.BlockSpec(s, lambda i: (0,) * len(s))  # noqa: E731
    in_specs = [pl.BlockSpec((tile, j, f), lambda i: (i, 0, 0)),
                bcast((j, j)), bcast((j, j))]
    in_specs += [bcast(p.shape) for p in params]

    kernel = functools.partial(_kernel, num_layers, heads,
                               jnp.float32 if precise else jnp.bfloat16,
                               rolled)
    call = pl.pallas_call(
        kernel,
        grid=(n_pad // tile,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tile, j, f), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n_pad, j, f), x.dtype),
    )
    with _interpret_ctx():
        out = call(xf, adj, mask, *params)
    return out[:n].reshape(*lead, j, f)


_fused_jit = jax.jit(_fused_impl,
                     static_argnames=('heads', 'num_layers', 'precise',
                                      'rolled', 'tile'))


# ===========================================================================
# Trainable path: custom VJP with a fused backward kernel
# ===========================================================================
#
# The eval kernel above reads x from HBM once and writes y once.  For
# training, ``fused_gcn_stack_trainable`` adds:
#
# * a forward kernel that ALSO stashes the inputs to layers 1..L-1 (the only
#   residuals the backward needs — everything else is recomputed in VMEM,
#   flash-attention style);
# * a backward kernel that walks the 5 layers in reverse per block,
#   recomputing each layer's intermediates from its saved input and
#   producing dx plus all parameter gradients.  Parameter grads accumulate
#   across the (sequential) TPU grid into revisited output blocks.
#
# Padded rows are safe: every gradient is linear in the cotangent, and the
# pad rows' cotangent is zero.

#: rows per program in the backward kernel — more live buffers than forward
#: (d_xw, alpha, per-head grads), so a smaller tile keeps VMEM < 16 MB.
BWD_TILE = 8


def _ln_fwd(x, scale, bias):
    """Returns (y, xhat, inv_sigma) for reuse in backward."""
    x32 = x.astype(jnp.float32)
    mean = x32.mean(axis=-1, keepdims=True)
    var = ((x32 - mean) ** 2).mean(axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + LN_EPS)
    xhat = (x32 - mean) * inv
    return xhat * scale + bias, xhat, inv


def _ln_bwd(d_y, xhat, inv, scale):
    """LayerNorm backward over the last dim; returns (d_x, d_scale, d_bias)
    with d_scale/d_bias reduced over all leading dims."""
    d_scale = (d_y * xhat).sum(axis=tuple(range(d_y.ndim - 1)))
    d_bias = d_y.sum(axis=tuple(range(d_y.ndim - 1)))
    d_xhat = d_y * scale
    m1 = d_xhat.mean(axis=-1, keepdims=True)
    m2 = (d_xhat * xhat).mean(axis=-1, keepdims=True)
    return inv * (d_xhat - m1 - xhat * m2), d_scale, d_bias


def _gat_bwd(x, mask, w, att_src, att_dst, d_h, heads, mm_dtype):
    """Backward of :func:`_gat` on a (T, J, F) block given cotangent d_h.

    Returns (d_x, d_w, d_att_src, d_att_dst, d_bias); recomputes xw and the
    attention weights in VMEM rather than loading them from HBM.
    """
    t, j, f = x.shape
    x_flat = x.reshape(t * j, f)
    xw_flat = _mm(x_flat, w, mm_dtype)                  # (T*J, H*F)
    d_bias = d_h.sum(axis=(0, 1))
    d_outh = d_h / heads
    d_xw_cols = []
    d_att_src = []
    d_att_dst = []
    for h in range(heads):
        xwh = xw_flat[:, h * f:(h + 1) * f].reshape(t, j, f)
        a_src = (xwh * att_src[h]).sum(axis=-1)         # (T, J)
        a_dst = (xwh * att_dst[h]).sum(axis=-1)
        e = a_dst[:, :, None] + a_src[:, None, :]       # (T, Jd, Js)
        el = jnp.where(e >= 0, e, 0.2 * e)
        em = jnp.where(mask[None, :, :] > 0, el, jnp.float32(-jnp.inf))
        alpha = jax.nn.softmax(em, axis=-1)
        # d_alpha[t,i,s] = sum_f d_outh[t,i,f] * xwh[t,s,f]
        d_alpha = jax.lax.dot_general(
            d_outh.astype(mm_dtype), xwh.astype(mm_dtype),
            (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        # d_xwh (from alpha @ xwh term): sum_i alpha[t,i,s] d_outh[t,i,f]
        d_xwh = jax.lax.dot_general(
            alpha.astype(mm_dtype), d_outh.astype(mm_dtype),
            (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)         # (T, Js, F)
        # softmax + mask + leaky backward
        s = (alpha * d_alpha).sum(axis=-1, keepdims=True)
        d_em = alpha * (d_alpha - s)                    # 0 at masked entries
        d_e = d_em * jnp.where(e >= 0, 1.0, 0.2)
        d_a_dst = d_e.sum(axis=2)                       # (T, Jd)
        d_a_src = d_e.sum(axis=1)                       # (T, Js)
        d_xwh = d_xwh + (d_a_src[..., None] * att_src[h]
                         + d_a_dst[..., None] * att_dst[h])
        d_att_src.append((xwh * d_a_src[..., None]).sum(axis=(0, 1)))
        d_att_dst.append((xwh * d_a_dst[..., None]).sum(axis=(0, 1)))
        d_xw_cols.append(d_xwh.reshape(t * j, f))
    d_xw_flat = jnp.concatenate(d_xw_cols, axis=-1)     # (T*J, H*F)
    d_x = _mm(d_xw_flat, w.T, mm_dtype).reshape(t, j, f)
    d_w = _mm(x_flat.T, d_xw_flat, mm_dtype)
    return (d_x, d_w, jnp.stack(d_att_src), jnp.stack(d_att_dst), d_bias)


def _gat_bwd_rolled(x, mask, w_h, att_src, att_dst, d_h, heads, mm_dtype):
    """:func:`_gat_bwd` with the head loop rolled (see :func:`_gat_rolled`).

    Takes/returns the rolled param layout: w_h (H, F_in, F), att (H, 1, F);
    grads come back in the same layout (``_unroll_gat_grads`` restores the
    kernel-order shapes outside the kernel)."""
    t, j, f = x.shape
    x_flat = x.reshape(t * j, f)
    d_bias = d_h.sum(axis=(0, 1))
    d_outh = d_h / heads

    def body(h, carry):
        d_x, d_w, d_as, d_ad = carry
        wh = _dyn_index0(w_h, h)
        a_s = _dyn_index0(att_src, h)
        a_d = _dyn_index0(att_dst, h)
        alpha, xwh, e = _head_attention(x_flat, mask, wh, a_s, a_d, t, j, f,
                                        mm_dtype)
        d_alpha = jax.lax.dot_general(
            d_outh.astype(mm_dtype), xwh.astype(mm_dtype),
            (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        d_xwh = jax.lax.dot_general(
            alpha.astype(mm_dtype), d_outh.astype(mm_dtype),
            (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)         # (T, Js, F)
        s = (alpha * d_alpha).sum(axis=-1, keepdims=True)
        d_em = alpha * (d_alpha - s)                    # 0 at masked entries
        d_e = d_em * jnp.where(e >= 0, 1.0, 0.2)
        d_a_dst = d_e.sum(axis=2)                       # (T, Jd)
        d_a_src = d_e.sum(axis=1)                       # (T, Js)
        d_xwh = d_xwh + (d_a_src[..., None] * a_s
                         + d_a_dst[..., None] * a_d)
        d_flat = d_xwh.reshape(t * j, f)
        d_x = d_x + _mm(d_flat, wh.T, mm_dtype).reshape(t, j, f)
        d_w = _dyn_add0(d_w, h, _mm(x_flat.T, d_flat, mm_dtype))
        d_as = _dyn_add0(
            d_as, h, (xwh * d_a_src[..., None]).sum(axis=(0, 1))[None])
        d_ad = _dyn_add0(
            d_ad, h, (xwh * d_a_dst[..., None]).sum(axis=(0, 1))[None])
        return d_x, d_w, d_as, d_ad

    init = (jnp.zeros((t, j, f), jnp.float32),
            jnp.zeros(w_h.shape, jnp.float32),
            jnp.zeros(att_src.shape, jnp.float32),
            jnp.zeros(att_dst.shape, jnp.float32))
    d_x, d_w, d_as, d_ad = jax.lax.fori_loop(0, heads, body, init)
    return d_x, d_w, d_as, d_ad, d_bias


def _graph_conv_bwd(x, adj, w_rel, w_root, d_h, mm_dtype):
    """Backward of :func:`_graph_conv`; returns (d_x, d_w_rel, d_w_root,
    d_b)."""
    t, j, f = x.shape
    x_flat = x.reshape(t * j, f)
    neigh = jax.lax.dot_general(
        jnp.broadcast_to(adj.astype(mm_dtype), (t, j, j)),
        x.astype(mm_dtype),
        (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    d_flat = d_h.reshape(t * j, f)
    d_b = d_h.sum(axis=(0, 1))
    d_w_rel = _mm(neigh.reshape(t * j, f).T, d_flat, mm_dtype)
    d_w_root = _mm(x_flat.T, d_flat, mm_dtype)
    d_neigh = _mm(d_flat, w_rel.T, mm_dtype).reshape(t, j, f)
    # d_x from neigh = A @ x:  A^T @ d_neigh  (per graph)
    d_x = jax.lax.dot_general(
        jnp.broadcast_to(adj.T.astype(mm_dtype), (t, j, j)),
        d_neigh.astype(mm_dtype),
        (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    d_x = d_x + _mm(d_flat, w_root.T, mm_dtype).reshape(t, j, f)
    return d_x, d_w_rel, d_w_root, d_b


def _layer_fwd(i, x, adj, mask, params, p, heads, mm_dtype, rolled=False):
    """One stack layer forward from flat params at offset ``p``; returns
    (x_next, new_p)."""
    residual = x
    if i % 2 == 0:
        w, a_s, a_d, b = params[p:p + 4]
        p += 4
        gat = _gat_rolled if rolled else _gat
        h = gat(x, mask, w, a_s, a_d, b, heads, mm_dtype)
    else:
        w_rel, w_root, b = params[p:p + 3]
        p += 3
        h = _graph_conv(x, adj, w_rel, w_root, b, mm_dtype)
    scale, bias = params[p], params[p + 1]
    p += 2
    y, _, _ = _ln_fwd(h, scale, bias)
    return jnp.where(y >= 0, y, 0.2 * y) + residual, p


def _fwd_kernel(num_layers, heads, mm_dtype, rolled, x_ref, adj_ref,
                mask_ref, *refs):
    """Forward + residual stash: outputs (y, xs) where xs[k] is the input
    to layer k+1."""
    *param_refs, y_ref, xs_ref = refs
    x = x_ref[...].astype(jnp.float32)
    adj, mask = adj_ref[...], mask_ref[...]
    params = [r[...] for r in param_refs]
    p = 0
    for i in range(num_layers):
        if i > 0:
            xs_ref[i - 1, ...] = x.astype(xs_ref.dtype)
        x, p = _layer_fwd(i, x, adj, mask, params, p, heads, mm_dtype,
                          rolled)
    y_ref[...] = x.astype(y_ref.dtype)


def _param_offsets(num_layers):
    """Flat-tuple offset of each layer's params: (start, count, ln_start)."""
    offs = []
    p = 0
    for i in range(num_layers):
        n = 4 if i % 2 == 0 else 3
        offs.append((p, n, p + n))
        p += n + 2
    return offs, p


def _bwd_kernel(num_layers, heads, mm_dtype, rolled, x0_ref, xs_ref, g_ref,
                adj_ref, mask_ref, *refs):
    n_params = _param_offsets(num_layers)[1]
    param_refs = refs[:n_params]
    dx_ref = refs[n_params]
    dparam_refs = refs[n_params + 1:]
    assert len(dparam_refs) == n_params

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for r in dparam_refs:
            r[...] = jnp.zeros(r.shape, r.dtype)

    adj, mask = adj_ref[...], mask_ref[...]
    params = [r[...] for r in param_refs]
    offs, _ = _param_offsets(num_layers)
    g = g_ref[...].astype(jnp.float32)
    acc = {}

    def add(idx, val):
        acc[idx] = acc.get(idx, 0) + val

    for i in reversed(range(num_layers)):
        x = (x0_ref[...] if i == 0 else xs_ref[i - 1, ...]).astype(
            jnp.float32)
        start, cnt, ln = offs[i]
        scale, bias = params[ln], params[ln + 1]
        # recompute layer output pre-activation
        gat_fwd = _gat_rolled if rolled else _gat
        if i % 2 == 0:
            w, a_s, a_d, b = params[start:start + 4]
            h = gat_fwd(x, mask, w, a_s, a_d, b, heads, mm_dtype)
        else:
            w_rel, w_root, b = params[start:start + 3]
            h = _graph_conv(x, adj, w_rel, w_root, b, mm_dtype)
        y, xhat, inv = _ln_fwd(h, scale, bias)
        # x_{i+1} = leaky(y) + x  (residual)
        d_y = g * jnp.where(y >= 0, 1.0, 0.2)
        d_h, d_scale, d_bias_ln = _ln_bwd(d_y, xhat, inv, scale)
        add(ln, d_scale)
        add(ln + 1, d_bias_ln)
        if i % 2 == 0:
            gat_bwd = _gat_bwd_rolled if rolled else _gat_bwd
            d_x, d_w, d_as, d_ad, d_b = gat_bwd(
                x, mask, w, a_s, a_d, d_h, heads, mm_dtype)
            add(start, d_w)
            add(start + 1, d_as)
            add(start + 2, d_ad)
            add(start + 3, d_b)
        else:
            d_x, d_w_rel, d_w_root, d_b = _graph_conv_bwd(
                x, adj, w_rel, w_root, d_h, mm_dtype)
            add(start, d_w_rel)
            add(start + 1, d_w_root)
            add(start + 2, d_b)
        g = g + d_x            # residual cotangent + through-layer cotangent

    dx_ref[...] = g.astype(dx_ref.dtype)
    for idx, val in acc.items():
        dparam_refs[idx][...] += val.astype(dparam_refs[idx].dtype)


def _fwd_with_residuals(x, params, adj, mask, heads, num_layers, precise,
                        rolled=False, tile=None):
    lead = x.shape[:-2]
    j, f = x.shape[-2:]
    tile = tile or _default_tile(j)
    n = int(np.prod(lead)) if lead else 1
    xf = x.reshape(n, j, f)
    pad = (-n) % tile
    if pad:
        xf = jnp.concatenate([xf, jnp.zeros((pad, j, f), xf.dtype)], axis=0)
    n_pad = n + pad

    bcast = lambda s: pl.BlockSpec(s, lambda i: (0,) * len(s))  # noqa: E731
    in_specs = [pl.BlockSpec((tile, j, f), lambda i: (i, 0, 0)),
                bcast((j, j)), bcast((j, j))]
    in_specs += [bcast(p.shape) for p in params]
    kernel = functools.partial(_fwd_kernel, num_layers, heads,
                               jnp.float32 if precise else jnp.bfloat16,
                               rolled)
    with _interpret_ctx():
        y, xs = pl.pallas_call(
            kernel,
            grid=(n_pad // tile,),
            in_specs=in_specs,
            out_specs=[pl.BlockSpec((tile, j, f), lambda i: (i, 0, 0)),
                       pl.BlockSpec((num_layers - 1, tile, j, f),
                                    lambda i: (0, i, 0, 0))],
            out_shape=[jax.ShapeDtypeStruct((n_pad, j, f), jnp.float32),
                       jax.ShapeDtypeStruct((num_layers - 1, n_pad, j, f),
                                            jnp.float32)],
        )(xf, adj, mask, *params)
    return y, xs, n, n_pad


def _bwd_call(x, xs, g, params, adj, mask, heads, num_layers, precise,
              rolled=False):
    """x: (n_pad, J, F) padded input; xs: (L-1, n_pad, J, F); g: (n_pad,
    J, F) zero-padded cotangent.  Returns (dx (n_pad,J,F), dparams)."""
    n_pad, j, f = x.shape
    bcast = lambda s: pl.BlockSpec(s, lambda i: (0,) * len(s))  # noqa: E731
    in_specs = [pl.BlockSpec((BWD_TILE, j, f), lambda i: (i, 0, 0)),
                pl.BlockSpec((num_layers - 1, BWD_TILE, j, f),
                             lambda i: (0, i, 0, 0)),
                pl.BlockSpec((BWD_TILE, j, f), lambda i: (i, 0, 0)),
                bcast((j, j)), bcast((j, j))]
    in_specs += [bcast(p.shape) for p in params]
    out_specs = [pl.BlockSpec((BWD_TILE, j, f), lambda i: (i, 0, 0))]
    out_specs += [bcast(p.shape) for p in params]
    out_shape = [jax.ShapeDtypeStruct((n_pad, j, f), jnp.float32)]
    out_shape += [jax.ShapeDtypeStruct(p.shape, jnp.float32)
                  for p in params]
    kernel = functools.partial(_bwd_kernel, num_layers, heads,
                               jnp.float32 if precise else jnp.bfloat16,
                               rolled)
    with _interpret_ctx():
        outs = pl.pallas_call(
            kernel,
            grid=(n_pad // BWD_TILE,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
        )(x, xs, g, adj, mask, *params)
    return outs[0], tuple(outs[1:])


#: (adj_bytes, shape, heads, num_layers, precise) -> custom_vjp function
_TRAINABLE_CACHE: dict = {}


def fused_gcn_stack_trainable(x: jnp.ndarray, params: tuple, adjacency,
                              heads: int = 4, num_layers: int = 5,
                              precise: bool = False,
                              rolled: bool = False,
                              tile: int | None = None,
                              edge_form: bool = False) -> jnp.ndarray:
    """Differentiable fused stack: the primal runs the eval kernel; under
    ``jax.grad`` the forward stashes per-layer inputs and the backward is a
    second fused kernel producing dx + all parameter grads.

    Semantics identical to :class:`a2m.nn.graph.GCNStack`'s XLA path
    (real_motion_model.py:172-201) minus the trailing dropout (applied by
    the caller).  ``rolled`` rolls the per-head loop in every kernel
    (forward, residual-stash forward, backward) — same math, faster Mosaic
    compile; gradients come back in the caller's original param layout.
    ``edge_form`` routes the PRIMAL (gradient-free forwards) through the
    edge-incidence v2 kernel; the grad path keeps the dense stash/backward
    kernels (``tile`` applies to the primal only then).
    """
    adj_np = np.asarray(adjacency, np.float32)
    key = (adj_np.tobytes(), adj_np.shape, heads, num_layers, precise,
           rolled, tile, edge_form)
    if key not in _TRAINABLE_CACHE:
        _TRAINABLE_CACHE[key] = _make_trainable(adj_np, heads, num_layers,
                                                precise, rolled, tile,
                                                edge_form)
    # outer context: the custom_vjp primal's jaxpr executes after inner
    # per-site contexts exit; the sites keep their own contexts because the
    # backward is traced later (under grad machinery) where this scope is
    # already gone
    with _interpret_ctx():
        return _TRAINABLE_CACHE[key](x, params)


def _make_trainable(adj_np, heads, num_layers, precise, rolled=False,
                    tile=None, edge_form=False):
    # adjacency/mask stay NUMPY in the closure: the cached custom_vjp fn is
    # reused across traces (g_step AND d_step jit the generator), and a
    # jnp.asarray here would bake the FIRST trace's tracer into the closure
    # (UnexpectedTracerError on the second trace).  numpy constants are
    # lifted into each trace independently.
    mask_np = (np.maximum(adj_np, np.eye(adj_np.shape[0]))
               > 0).astype(np.float32)
    adj_c = np.asarray(adj_np, np.float32)
    mask_c = np.asarray(mask_np, np.float32)
    if edge_form:
        s_c, d_c, dt_c = edge_matrices(adj_np)

    @jax.custom_vjp
    def f(x, params):
        if edge_form:
            return _fused_impl_edge(x, params, adj_c, mask_c, s_c, d_c,
                                    dt_c, heads, num_layers, precise, tile)
        kp = _roll_gat_params(params, num_layers) if rolled else params
        return _fused_impl(x, kp, adj_c, mask_c, heads, num_layers,
                           precise, rolled, tile)

    def f_fwd(x, params):
        kp = _roll_gat_params(params, num_layers) if rolled else params
        # the grad path keeps the dense stash/backward kernels; an edge
        # primal's ``tile`` (EDGE_TILE-scaled) does not transfer to them
        y, xs, n, n_pad = _fwd_with_residuals(x, kp, adj_c, mask_c,
                                              heads, num_layers, precise,
                                              rolled,
                                              None if edge_form else tile)
        lead = x.shape[:-2]
        j, f_ = x.shape[-2:]
        out = y[:n].reshape(*lead, j, f_).astype(x.dtype)
        # residuals keep the padded layout so backward reuses it directly
        xf = x.reshape(n, j, f_)
        if n_pad > n:
            xf = jnp.concatenate(
                [xf, jnp.zeros((n_pad - n, j, f_), x.dtype)], axis=0)
        return out, (xf, xs, kp, x.shape)

    def f_bwd(res, g):
        xf, xs, kp, x_shape = res
        n_pad, j, f_ = xf.shape
        lead = x_shape[:-2]
        n = int(np.prod(lead)) if lead else 1
        gf = g.reshape(n, j, f_).astype(jnp.float32)
        if n_pad > n:
            gf = jnp.concatenate(
                [gf, jnp.zeros((n_pad - n, j, f_), jnp.float32)], axis=0)
        dx, dparams = _bwd_call(xf, xs, gf, kp, adj_c, mask_c, heads,
                                num_layers, precise, rolled)
        dx = dx[:n].reshape(x_shape).astype(jnp.float32)
        if rolled:
            dparams = _unroll_gat_grads(dparams, num_layers)
        return dx, tuple(dp.astype(jnp.float32) for dp in dparams)

    f.defvjp(f_fwd, f_bwd)
    return f


# ===========================================================================
# Edge-form kernel (v2): (J, TILE, F) layout + constant edge-incidence GEMMs
# ===========================================================================
#
# The dense kernel above runs each head's attention apply as a per-graph
# batched matmul — (TILE, J, J) @ (TILE, J, F) lowers to TILE tiny
# (J,J)x(J,F) MXU ops — ~200+ dispatches per program at J=42, which is why
# the hand stack measures ~21 ms at ~2% MXU efficiency: dispatch/shape
# bound, not FLOP- or HBM-bound (HBM in+out is ~0.2 ms worth of traffic).
#
# The skeleton graphs are FIXED trees, so message routing is a constant
# linear operator.  With S[e, src(e)] = 1 and D[e, dst(e)] = 1 over the
# E edges (self-loops included),
#
#   gather node values to edges : S @ V    (V in (J, cols) layout)
#   segment-sum edges to dst    : D.T @ Z  (exact: one 1 per row)
#
# so in a (J, TILE*F) layout every routing step is ONE GEMM shared by all
# TILE graphs, with the constant matrix on the left.  Per GAT head-layer:
# two value GEMMs ((E,J)x(J,TILE*F) and (J,E)x(E,TILE*F)) + four skinny f32
# gather GEMMs + dense VPU softmax stats on (J, J, TILE) — instead of TILE
# batched matmuls.  GraphConv's aggregation becomes one
# (J,J) x (J, TILE*F) GEMM.  Routing through 0/1 matrices is numerically
# EXACT in any mm dtype; value GEMMs keep the same bf16-operand/f32-accum
# contract as the dense kernel.
#
# The input is transposed to (J, N, F) once in XLA outside the kernel (and
# back after) — two cheap relayouts replacing per-program transposes.

#: default rows-per-program for the edge kernel: live buffers are ~4x
#: smaller than the dense kernel's per-head (TILE, J, J) stack, so larger
#: tiles fit VMEM and amortize the per-program fixed cost
EDGE_TILE = 64


def edge_matrices(adj_np: np.ndarray) -> tuple:
    """(S, D, D.T) constant incidence matrices from A[dst, src] (no self
    loops; they are added here, matching the GAT mask)."""
    j = adj_np.shape[0]
    mask = np.maximum(np.asarray(adj_np, np.float32),
                      np.eye(j, dtype=np.float32)) > 0
    dst, src = np.nonzero(mask)
    e = len(dst)
    s_mat = np.zeros((e, j), np.float32)
    d_mat = np.zeros((e, j), np.float32)
    s_mat[np.arange(e), src] = 1.0
    d_mat[np.arange(e), dst] = 1.0
    return s_mat, d_mat, np.ascontiguousarray(d_mat.T)


def _gat_edge(x, mask, s_mat, d_mat, dt_mat, w, att_src, att_dst, bias,
              heads: int, mm_dtype):
    """DenseGATConv eval semantics on a (J, T, F) block via edge GEMMs."""
    j, t, f = x.shape
    e_cnt = s_mat.shape[0]
    xw_flat = _mm(x.reshape(j * t, f), w, mm_dtype)     # (J*T, H*F)
    out = jnp.zeros((j, t, f), jnp.float32)
    for h in range(heads):                              # unrolled: H is 2-4
        xwh = xw_flat[:, h * f:(h + 1) * f].reshape(j, t, f)
        a_src = (xwh * att_src[h]).sum(axis=-1)         # (J, T)
        a_dst = (xwh * att_dst[h]).sum(axis=-1)
        # softmax stats densely (small VPU work, f32): logits[dst, src, t]
        e_dense = a_dst[:, None, :] + a_src[None, :, :]  # (Jd, Js, T)
        e_dense = jnp.where(e_dense >= 0, e_dense, 0.2 * e_dense)
        e_dense = jnp.where(mask[:, :, None] > 0, e_dense,
                            jnp.float32(-1e30))
        m = e_dense.max(axis=1)                          # (J, T)
        denom = jnp.where(mask[:, :, None] > 0,
                          jnp.exp(e_dense - m[:, None, :]),
                          jnp.float32(0.0)).sum(axis=1)  # (J, T)
        # edge-wise alpha via exact f32 gather GEMMs (0/1 left operands)
        se = _mm(s_mat, a_src, jnp.float32)              # (E, T)
        de = _mm(d_mat, a_dst, jnp.float32)
        me = _mm(d_mat, m, jnp.float32)
        dene = _mm(d_mat, denom, jnp.float32)
        logit = se + de
        logit = jnp.where(logit >= 0, logit, 0.2 * logit)
        alpha = jnp.exp(logit - me) / dene               # (E, T)
        # value path: gather -> weight -> segment-sum, shared GEMMs
        z = _mm(s_mat, xwh.reshape(j, t * f), mm_dtype)  # (E, T*F)
        z = z.reshape(e_cnt, t, f) * alpha[:, :, None]
        y = _mm(dt_mat, z.reshape(e_cnt, t * f), mm_dtype)
        out = out + y.reshape(j, t, f)
    return out / heads + bias


def _graph_conv_edge(x, adj, w_rel, w_root, b, mm_dtype):
    """DenseGraphConv eval semantics on a (J, T, F) block: the neighbor
    aggregation A @ X is ONE (J,J) x (J, T*F) GEMM shared by all graphs."""
    j, t, f = x.shape
    neigh = _mm(adj, x.reshape(j, t * f), mm_dtype).reshape(j, t, f)
    flat = _mm(neigh.reshape(j * t, f), w_rel, mm_dtype) + _mm(
        x.reshape(j * t, f), w_root, mm_dtype)
    return flat.reshape(j, t, f) + b


def _kernel_edge(num_layers, heads, mm_dtype, x_ref, adj_ref, mask_ref,
                 s_ref, d_ref, dt_ref, *refs):
    *param_refs, out_ref = refs
    x = x_ref[...].astype(jnp.float32)                  # (J, TILE, F)
    adj, mask = adj_ref[...], mask_ref[...]
    s_mat, d_mat, dt_mat = s_ref[...], d_ref[...], dt_ref[...]
    p = 0
    for i in range(num_layers):
        residual = x
        if i % 2 == 0:
            w, a_s, a_d, b = (r[...] for r in param_refs[p:p + 4])
            p += 4
            x = _gat_edge(x, mask, s_mat, d_mat, dt_mat, w, a_s, a_d, b,
                          heads, mm_dtype)
        else:
            w_rel, w_root, b = (r[...] for r in param_refs[p:p + 3])
            p += 3
            x = _graph_conv_edge(x, adj, w_rel, w_root, b, mm_dtype)
        scale, bias = param_refs[p][...], param_refs[p + 1][...]
        p += 2
        x = _layer_norm(x, scale, bias)
        x = jnp.where(x >= 0, x, 0.2 * x) + residual    # leaky + residual
    out_ref[...] = x.astype(out_ref.dtype)


def _fused_impl_edge(x, params, adj, mask, s_mat, d_mat, dt_mat, heads,
                     num_layers, precise=False, tile=None):
    tile = tile or EDGE_TILE
    lead = x.shape[:-2]
    j, f = x.shape[-2:]
    n = int(np.prod(lead)) if lead else 1
    xf = x.reshape(n, j, f)
    pad = (-n) % tile
    if pad:
        xf = jnp.concatenate([xf, jnp.zeros((pad, j, f), xf.dtype)], axis=0)
    n_pad = n + pad
    xt = jnp.transpose(xf, (1, 0, 2))                   # (J, n_pad, F)

    e_cnt = s_mat.shape[0]
    bcast = lambda s: pl.BlockSpec(s, lambda i: (0,) * len(s))  # noqa: E731
    in_specs = [pl.BlockSpec((j, tile, f), lambda i: (0, i, 0)),
                bcast((j, j)), bcast((j, j)),
                bcast((e_cnt, j)), bcast((e_cnt, j)), bcast((j, e_cnt))]
    in_specs += [bcast(p.shape) for p in params]

    kernel = functools.partial(_kernel_edge, num_layers, heads,
                               jnp.float32 if precise else jnp.bfloat16)
    with _interpret_ctx():
        call = pl.pallas_call(
            kernel,
            grid=(n_pad // tile,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((j, tile, f), lambda i: (0, i, 0)),
            out_shape=jax.ShapeDtypeStruct((j, n_pad, f), x.dtype),
        )
        out = call(xt, adj, mask, s_mat, d_mat, dt_mat, *params)
    return jnp.transpose(out, (1, 0, 2))[:n].reshape(*lead, j, f)


_fused_edge_jit = jax.jit(_fused_impl_edge,
                          static_argnames=('heads', 'num_layers', 'precise',
                                           'tile'))


def _check_edge_backend():
    """The edge kernel is CPU-interpret-only on this image: its
    (J, T, F) -> (J, T*F) lane-merge reshapes (and rank-3 dot_general with
    a 2-D constant) CRASH the Mosaic remote-compile helper on real TPU
    (HTTP 500 / subprocess exit 1 — a compiler crash, not a clean
    unsupported-op error).  Bisected with scripts/mosaic_probes.py:
    sublane-axis broadcasts/max-reductions, skinny 0/1 gather GEMMs, and
    lane/sublane concatenate all compile; only the merge reshape and the
    rank-3 dot crash.  The production speedup that came out of this design
    study is the concat-heads apply in the DENSE kernels (one
    (T, J, H*J) @ (T, H*J, F) batched GEMM per GAT layer)."""
    if jax.default_backend() == 'tpu':
        raise NotImplementedError(
            'fused_edge: the edge-form kernel crashes the Mosaic '
            'remote-compiler on this TPU backend (lane-merge reshape); '
            'it runs under CPU interpret mode only. Use the dense fused '
            'kernels (fused_rolled) on TPU.')
