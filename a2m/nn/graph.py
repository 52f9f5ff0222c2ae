"""Dense graph convolutions for small fixed skeleton graphs.

The reference runs torch_geometric ``GATConv``/``GraphConv`` over B*T stacked
copies of 10- and 42-node skeleton graphs (`real_motion_model.py:78-120`),
paying scatter/gather and (in the discriminator) a per-sample Python
``Batch.from_data_list`` loop (`real_motion_model.py:602-613`).

On TPU the graphs are tiny and constant, so message passing is reformulated
densely over a constant adjacency matrix and batched as ``(N, J, F)``
einsums — pure MXU work, no scatters, mathematically identical to the
torch_geometric layer definitions:

* ``GraphConv`` (Morris et al., aggr='add'):
  ``out = X @ W_root + (A @ X) @ W_neigh + b``  with A[dst, src].
* ``GATConv`` (Velickovic et al., PyG conventions): per head,
  ``e[i, j] = LeakyReLU_0.2(a_src . (W x_j) + a_dst . (W x_i))`` masked to
  edges (self-loops added, PyG default), softmax over incoming j,
  ``out[i] = sum_j alpha[i, j] W x_j``; ``concat=False`` -> head mean; + bias.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class DenseGraphConv(nn.Module):
    """torch_geometric ``GraphConv`` (add aggregation) in dense form.

    Input (..., J, F) with a constant (J, J) adjacency A[dst, src]
    (no self-loops — the root term handles self-information).
    """
    features: int
    adjacency: np.ndarray        # (J, J) float, A[dst, src]
    dtype: Any = jnp.float32
    precision: Any = None

    @nn.compact
    def __call__(self, x):
        adj = jnp.asarray(self.adjacency, dtype=self.dtype)
        w_neigh = nn.Dense(self.features, use_bias=False, dtype=self.dtype,
                           precision=self.precision, name='lin_rel')
        w_root = nn.Dense(self.features, use_bias=True, dtype=self.dtype,
                          precision=self.precision, name='lin_root')
        neigh = jnp.einsum('ij,...jf->...if', adj, x.astype(self.dtype),
                           precision=self.precision)
        return w_neigh(neigh) + w_root(x)


class DenseGATConv(nn.Module):
    """torch_geometric ``GATConv`` in dense masked-attention form.

    Input (..., J, F); constant (J, J) adjacency A[dst, src] WITHOUT
    self-loops (they are added here, matching PyG's add_self_loops=True).
    ``concat=False`` averages heads (the reference's configuration,
    real_motion_model.py:78).
    """
    features: int
    adjacency: np.ndarray
    heads: int = 4
    concat: bool = False
    negative_slope: float = 0.2
    dtype: Any = jnp.float32
    precision: Any = None

    @nn.compact
    def __call__(self, x):
        j = self.adjacency.shape[0]
        mask = np.maximum(self.adjacency, np.eye(j, dtype=np.float32)) > 0
        mask = jnp.asarray(mask)                       # (J, J) bool, [dst, src]

        h, f = self.heads, self.features
        w = nn.Dense(h * f, use_bias=False, dtype=self.dtype,
                     precision=self.precision, name='lin')
        xw = w(x).reshape(*x.shape[:-1], h, f)         # (..., J, H, F)

        att_src = self.param('att_src', nn.initializers.glorot_uniform(),
                             (h, f))
        att_dst = self.param('att_dst', nn.initializers.glorot_uniform(),
                             (h, f))
        # alpha contributions per node (..., J, H)
        a_src = jnp.einsum('...jhf,hf->...jh', xw, att_src.astype(self.dtype))
        a_dst = jnp.einsum('...jhf,hf->...jh', xw, att_dst.astype(self.dtype))
        # e[dst=i, src=j] = leaky(a_src[j] + a_dst[i])   (..., H, J_dst, J_src)
        e = (a_dst[..., :, None, :] + a_src[..., None, :, :])  # (..., Jd, Js, H)
        e = nn.leaky_relu(e, self.negative_slope)
        e = jnp.where(mask[..., :, :, None], e.astype(jnp.float32), -jnp.inf)
        alpha = jax.nn.softmax(e, axis=-2).astype(xw.dtype)  # softmax over src
        out = jnp.einsum('...ijh,...jhf->...ihf', alpha,
                         xw, precision=self.precision)  # (..., J, H, F)
        if self.concat:
            out = out.reshape(*out.shape[:-2], h * f)
            bias = self.param('bias', nn.initializers.zeros, (h * f,))
        else:
            out = out.mean(axis=-2)
            bias = self.param('bias', nn.initializers.zeros, (f,))
        return out + bias


class GCNStack(nn.Module):
    """The reference's 5-layer alternating GAT/GraphConv stack with per-layer
    LayerNorm + LeakyReLU(0.2) + residual (real_motion_model.py:172-201).

    LayerNorm is applied per-graph over (J, F) jointly, matching the
    reference's ``LayerNorm(joint_feat_dim)`` on a (N, J, F) view — i.e.
    normalization over the last dim only.
    """
    features: int
    adjacency: np.ndarray
    num_layers: int = 5
    heads: int = 4
    dropout: float = 0.2
    dtype: Any = jnp.float32
    precision: Any = None
    #: fast path: run all layers as ONE fused Pallas kernel
    #: (a2m/nn/pallas_gcn.py; measured 1.46x vs the XLA lowering on v5e),
    #: differentiable via a fused custom-VJP backward kernel.  Opt-in —
    #: each Mosaic kernel compile costs minutes on the remote-compile
    #: backend; init always uses the XLA path below (identical params).
    fused: bool = False
    #: rolled per-head fori_loop inside the fused kernels: same math,
    #: ~4x fewer Mosaic instructions -> faster remote compiles
    fused_rolled: bool = False
    #: rows-per-program override for the fused kernels (None = pallas_gcn
    #: default); must be a multiple of 8 (f32 sublane)
    fused_tile: Any = None
    #: edge-incidence v2 kernel for gradient-free forwards: constant
    #: S/D gather-GEMMs in a (J, TILE, F) layout instead of per-graph
    #: batched matmuls (a2m/nn/pallas_gcn.py::_fused_impl_edge)
    fused_edge: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.fused and not self.is_initializing():
            from a2m.nn import pallas_gcn
            params = pallas_gcn.extract_stack_params(
                self.variables['params'], self.num_layers)
            # trainable fused path: eval kernel as the primal, fused
            # forward-with-residuals + fused backward under jax.grad
            # (a2m/nn/pallas_gcn.py::fused_gcn_stack_trainable)
            out = pallas_gcn.fused_gcn_stack_trainable(
                x.astype(jnp.float32), params, self.adjacency,
                heads=self.heads, num_layers=self.num_layers,
                rolled=self.fused_rolled, tile=self.fused_tile,
                edge_form=self.fused_edge)
            out = out.astype(self.dtype)
            return nn.Dropout(self.dropout, deterministic=not train)(out)
        for i in range(self.num_layers):
            residual = x
            if i % 2 == 0:
                x = DenseGATConv(self.features, self.adjacency,
                                 heads=self.heads, concat=False,
                                 dtype=self.dtype, precision=self.precision,
                                 name=f'gcn{i + 1}')(x)
            else:
                x = DenseGraphConv(self.features, self.adjacency,
                                   dtype=self.dtype,
                                   precision=self.precision,
                                   name=f'gcn{i + 1}')(x)
            x = nn.LayerNorm(dtype=jnp.float32,
                             name=f'norm{i + 1}')(x).astype(self.dtype)
            x = nn.leaky_relu(x, 0.2) + residual
        return nn.Dropout(self.dropout, deterministic=not train)(x)
