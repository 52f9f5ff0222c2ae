"""Minimal pallas kernels probing Mosaic construct support on this TPU."""
import functools
import json
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

J, T, F, E = 42, 16, 64, 122


def k_reshape_mm(x_ref, adj_ref, o_ref):
    # (J,T,F) -> (J, T*F) lane-merge reshape + 2D mm  [GraphConv core]
    x = x_ref[...].astype(jnp.float32)
    adj = adj_ref[...]
    y = jax.lax.dot(adj, x.reshape(J, T * F),
                    preferred_element_type=jnp.float32)
    o_ref[...] = y.reshape(J, T, F)


def k_bcast_max(x_ref, adj_ref, o_ref):
    # middle-axis broadcast + masked max over axis 1  [softmax stats]
    x = x_ref[...].astype(jnp.float32)
    a = x.sum(axis=-1)                       # (J, T)
    e = a[:, None, :] + a[None, :, :]        # (J, J, T)
    m = e.max(axis=1)                        # (J, T)
    o_ref[...] = x + m[:, :, None]


def k_gather_mm(x_ref, s_ref, o_ref):
    # (E,J)@(J,T) skinny gather mm  [alpha gathers]
    x = x_ref[...].astype(jnp.float32)
    a = x.sum(axis=-1)                       # (J, T)
    s = s_ref[...]
    se = jax.lax.dot(s, a, preferred_element_type=jnp.float32)   # (E, T)
    back = jax.lax.dot(s.T, se, preferred_element_type=jnp.float32)
    o_ref[...] = x + back[:, :, None]


def k_edge_split(x_ref, s_ref, o_ref):
    # (E, T*F) -> (E, T, F) split + bcast-multiply + merge  [value path]
    x = x_ref[...].astype(jnp.float32)
    s = s_ref[...]
    z = jax.lax.dot(s, x.reshape(J, T * F),
                    preferred_element_type=jnp.float32)          # (E, T*F)
    a = jax.lax.dot(s, x.sum(axis=-1),
                    preferred_element_type=jnp.float32)          # (E, T)
    z = z.reshape(E, T, F) * a[:, :, None]
    y = jax.lax.dot(s.T, z.reshape(E, T * F),
                    preferred_element_type=jnp.float32)
    o_ref[...] = y.reshape(J, T, F)


def run(name, kern, extra):
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (J, 2 * T, F)), jnp.float32)
    bcast = lambda s: pl.BlockSpec(s, lambda i: (0,) * len(s))  # noqa
    try:
        call = pl.pallas_call(
            kern,
            grid=(2,),
            in_specs=[pl.BlockSpec((J, T, F), lambda i: (0, i, 0)),
                      bcast(extra.shape)],
            out_specs=pl.BlockSpec((J, T, F), lambda i: (0, i, 0)),
            out_shape=jax.ShapeDtypeStruct((J, 2 * T, F), jnp.float32),
        )
        out = jax.jit(lambda x, e: call(x, e))(x, extra)
        out.block_until_ready()
        print(json.dumps({'k': name, 'ok': True}), flush=True)
    except Exception as e:
        print(json.dumps({'k': name, 'err': str(e).splitlines()[0][:200]}),
              flush=True)


adj = jnp.asarray(np.eye(J, dtype=np.float32))
s_mat = jnp.asarray((np.arange(E)[:, None] % J ==
                     np.arange(J)[None, :]).astype(np.float32))

names = sys.argv[1:] or ['reshape_mm', 'bcast_max', 'gather_mm', 'edge_split']
for n in names:
    kern, extra = {'reshape_mm': (k_reshape_mm, adj),
                   'bcast_max': (k_bcast_max, adj),
                   'gather_mm': (k_gather_mm, s_mat),
                   'edge_split': (k_edge_split, s_mat)}[n]
    run(n, kern, extra)


# Findings on this image's Mosaic remote-compile backend (v5e), kept as the
# record behind a2m/nn/pallas_gcn.py design choices:
#   reshape_mm  (J,T,F)->(J,T*F) lane-merge reshape ... CRASHES (HTTP 500)
#   bcast_max   middle-axis broadcast + masked max   ... ok
#   gather_mm   skinny (E,J)@(J,T) 0/1 gather GEMM   ... ok
#   edge_split  (E,T*F)->(E,T,F) split + merge       ... CRASHES
#   rank-3 dot_general (E,J)x(J,T,F) contracting J   ... CRASHES
#   static int-array gather x[:, idx, :]             ... rejected (captured
#                                                        constant), untested
#   lane/sublane jnp.concatenate + (T,J,HJ)@(T,HJ,F) ... ok, but the
#       concat-heads apply MEASURED SLOWER end-to-end (hand stack 36.3 vs
#       20.9 ms; building the concat buffers costs more than the batched
#       per-head applies save) -> reverted, per-head applies stay
