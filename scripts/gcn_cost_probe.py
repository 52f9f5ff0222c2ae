"""Decompose the fused rolled GCN-stack kernel's runtime on the real TPU.

Runs the 5-layer stack at (B*T=8192, J=42, F=64, H=4, TILE=16) with
individual pieces stubbed out, to attribute the ~21 ms hand-stack time:

  full     baseline (all pieces)
  noapply  per-head batched (J,J)@(J,F) apply -> elementwise stand-in
  nostats  attention logits/softmax -> constant uniform alpha
  noxw     per-head (T*J,F)@(F,F) weight GEMM -> xwh := x
  nogconv  GraphConv layers -> identity
  nogat    GAT layers -> identity

NOT parity-correct math — a timing attribution tool only.  Carry-chained
timing with d2h sync (verify-skill rules).  Results feed the kernel
design notes in a2m/nn/pallas_gcn.py.
"""

from __future__ import annotations

import functools
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax                                                    # noqa: E402
import jax.numpy as jnp                                       # noqa: E402
from jax.experimental import pallas as pl                     # noqa: E402

from a2m import constants                                     # noqa: E402
from a2m.nn import pallas_gcn as pg                           # noqa: E402
from a2m.nn.graph import GCNStack                             # noqa: E402

TILE, HEADS, F = 16, 4, 64


def _gat_probe(x, mask, w_h, a_s_h, a_d_h, bias, mm_dtype, *, noapply,
               nostats, noxw):
    t, j, f = x.shape
    x_flat = x.reshape(t * j, f)
    deg = mask / mask.sum(axis=-1, keepdims=True)

    def body(h, out):
        wh = pg._dyn_index0(w_h, h)
        a_s = pg._dyn_index0(a_s_h, h)
        a_d = pg._dyn_index0(a_d_h, h)
        xwh = x if noxw else pg._mm(x_flat, wh, mm_dtype).reshape(t, j, f)
        if nostats:
            alpha = jnp.broadcast_to(deg[None], (t, j, j))
        else:
            a_src = (xwh * a_s).sum(axis=-1)
            a_dst = (xwh * a_d).sum(axis=-1)
            e = a_dst[:, :, None] + a_src[:, None, :]
            e = jnp.where(e >= 0, e, 0.2 * e)
            e = jnp.where(mask[None, :, :] > 0, e, jnp.float32(-jnp.inf))
            alpha = jax.nn.softmax(e, axis=-1)
        if noapply:
            return out + xwh * alpha[:, :, :1]
        return out + jax.lax.dot_general(
            alpha.astype(mm_dtype), xwh.astype(mm_dtype),
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)

    out = jax.lax.fori_loop(0, HEADS, body,
                            jnp.zeros((t, j, f), jnp.float32))
    return out / HEADS + bias


def _kernel(variant, x_ref, adj_ref, mask_ref, *refs):
    *param_refs, out_ref = refs
    x = x_ref[...].astype(jnp.float32)
    adj, mask = adj_ref[...], mask_ref[...]
    mm_dtype = jnp.bfloat16
    p = 0
    for i in range(5):
        residual = x
        if i % 2 == 0:
            w, a_s, a_d, b = (r[...] for r in param_refs[p:p + 4])
            p += 4
            if variant != 'nogat':
                x = _gat_probe(x, mask, w, a_s, a_d, b, mm_dtype,
                               noapply=variant == 'noapply',
                               nostats=variant == 'nostats',
                               noxw=variant == 'noxw')
        else:
            w_rel, w_root, b = (r[...] for r in param_refs[p:p + 3])
            p += 3
            if variant != 'nogconv':
                x = pg._graph_conv(x, adj, w_rel, w_root, b, mm_dtype)
        scale, bias = param_refs[p][...], param_refs[p + 1][...]
        p += 2
        x = pg._layer_norm(x, scale, bias)
        x = jnp.where(x >= 0, x, 0.2 * x) + residual
    out_ref[...] = x.astype(out_ref.dtype)


def run(variant):
    j = 42
    adj = constants.adjacency_from_edges(constants.hand_edges(), j)
    mask = (np.maximum(adj, np.eye(j)) > 0).astype(np.float32)
    stack = GCNStack(F, adj, heads=HEADS)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (8192, j, F)), jnp.float32)
    v = jax.jit(stack.init)(jax.random.PRNGKey(0), x)
    params = pg._roll_gat_params(pg.extract_stack_params(v['params']), 5)

    bcast = lambda s: pl.BlockSpec(s, lambda i: (0,) * len(s))  # noqa: E731
    in_specs = [pl.BlockSpec((TILE, j, F), lambda i: (i, 0, 0)),
                bcast((j, j)), bcast((j, j))]
    in_specs += [bcast(p.shape) for p in params]
    call = pl.pallas_call(
        functools.partial(_kernel, variant),
        grid=(8192 // TILE,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((TILE, j, F), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((8192, j, F), jnp.float32),
    )

    @jax.jit
    def step(x, carry):
        y = call(x + carry, jnp.asarray(adj), jnp.asarray(mask), *params)
        return y, carry + y.mean()

    try:
        carry = jnp.float32(0.0)
        y, carry = step(x, carry)
        float(carry)
        iters = 30
        t0 = time.perf_counter()
        for _ in range(iters):
            y, carry = step(x, carry)
        float(carry)
        ms = (time.perf_counter() - t0) / iters * 1e3
        print(json.dumps({'variant': variant, 'ms': round(ms, 2)}),
              flush=True)
    except Exception as e:
        print(json.dumps({'variant': variant,
                          'error': str(e).splitlines()[0][:160]}),
              flush=True)


if __name__ == '__main__':
    for variant in (sys.argv[1:] or ['full', 'noapply', 'nostats', 'noxw',
                                     'nogconv', 'nogat']):
        run(variant)
