"""Device mesh + GSPMD shardings.

The reference is strictly single-GPU (`version5_model_train.py:256-282`; no
torch.distributed anywhere — SURVEY.md §2.5).  This module supplies the
TPU-native scaling story:

* a ``Mesh('data', 'model')`` over all devices (ICI);
* batch sharding via ``NamedSharding(P('data'))`` on every batch array —
  gradient all-reduce becomes an XLA-inserted psum over ICI, no hand-written
  collectives;
* optional tensor-parallel rules for the widest kernels (the 2048-channel
  UNet bottleneck and discriminator conv3; SURVEY.md §2.5 TP row): conv
  kernels are sharded on the output-channel dim and the following layer on
  the input-channel dim, so XLA keeps activations sharded through the pair;
* multi-host data feeding hooks (``process_index``-strided interval
  assignment) for DCN-attached hosts.
"""

from __future__ import annotations

import re

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from a2m.config import MeshConfig


def make_mesh(cfg: MeshConfig = MeshConfig(), devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    model = max(1, cfg.model)
    data = cfg.data if cfg.data > 0 else n // model
    assert data * model == n, (
        f'mesh {data}x{model} != {n} devices; set mesh.data/-1 or mesh.model')
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, cfg.axis_names)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P('data'))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# -- tensor-parallel parameter rules ----------------------------------------

#: (regex on 'path/to/param', PartitionSpec) — first match wins.  Specs are
#: padded/truncated to the param rank with the spec aligned to trailing dims.
TP_RULES: list[tuple[str, tuple]] = [
    # UNet bottleneck pair: 1024 -> 2048 sharded on out, consumer on in
    (r'unet/bottleneck/conv/kernel', (None, None, 'model')),
    (r'unet/bottleneck_attention/(query|key|value)/kernel', ('model', None)),
    (r'unet/up0/kernel', (None, 'model', None)),
    # discriminator conv3 pair (512 -> 1024 -> 2048)
    (r'conv3b/conv/kernel', (None, None, 'model')),
    (r'conv3_attn/(query|key|value)/kernel', ('model', None)),
    (r'conv3c/conv/kernel', (None, 'model', None)),
]


def param_spec(path: str, shape: tuple, rules=None) -> P:
    rules = rules if rules is not None else TP_RULES
    for pattern, spec in rules:
        if re.search(pattern, path):
            spec = tuple(spec)[-len(shape):]
            spec = (None,) * (len(shape) - len(spec)) + tuple(spec)
            return P(*spec)
    return P()


def _path_str(path) -> str:
    parts = []
    for k in path:
        parts.append(str(getattr(k, 'key', getattr(k, 'idx', k))))
    return '/'.join(parts)


def param_shardings(tree, mesh: Mesh, tensor_parallel: bool = False):
    """NamedSharding tree for a parameter pytree.

    With ``tensor_parallel=False`` (or a 1-sized model axis) everything is
    replicated — pure data parallelism.
    """
    use_tp = tensor_parallel and mesh.shape.get('model', 1) > 1

    def spec_for(path, leaf):
        if not use_tp:
            return NamedSharding(mesh, P())
        return NamedSharding(mesh, param_spec(_path_str(path),
                                              np.shape(leaf)))

    return jax.tree_util.tree_map_with_path(spec_for, tree)


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Device-put numpy batch arrays with the batch axis sharded over
    'data'.  Non-array entries (meta) pass through."""
    sharding = batch_sharding(mesh)
    out = {}
    for k, v in batch.items():
        if isinstance(v, np.ndarray) and v.ndim >= 1:
            out[k] = jax.device_put(v, sharding)
        else:
            out[k] = v
    return out


def replicate_states(states, mesh: Mesh):
    return jax.device_put(states, replicated(mesh))


def global_put(tree, shardings):
    """Place host arrays as global jax.Arrays WITHOUT cross-process value
    verification.

    ``jax.device_put`` onto a sharding that spans processes runs a hidden
    ``multihost_utils.assert_equal`` — one eager Gloo allgather PER LEAF
    (jax dispatch.py::_device_put_sharding_impl).  For a parameter tree
    that is hundreds of collectives whose per-process compile skew can
    blow Gloo's 30 s context-init deadline (observed in the 2-process CPU
    integration run).  Training state is replicated-by-construction here
    (same seed, same checkpoint), so placement uses
    ``make_array_from_callback`` — zero communication, each process
    supplying its local shards.  ``shardings`` is a matching tree or a
    single sharding applied to every leaf.
    """
    import jax.tree_util as jtu
    one = isinstance(shardings, (NamedSharding,))

    def put(x, sh):
        x = np.asarray(x)
        return jax.make_array_from_callback(
            x.shape, sh, lambda idx: x[idx])

    if one:
        return jax.tree.map(lambda x: put(x, shardings), tree)
    return jtu.tree_map(put, tree, shardings)


def host_interval_slice(intervals: list, process_index: int | None = None,
                        process_count: int | None = None) -> list:
    """Multi-host data sharding: stride intervals across hosts over DCN so
    each host feeds its local devices distinct data.

    NOTE: striding balances interval COUNTS, not window counts — prefer
    :func:`balanced_host_slices` (what :class:`a2m.data.DataLoader` uses)
    when per-interval weights are known, so hosts execute near-equal
    numbers of collective-bearing steps.
    """
    pi = process_index if process_index is not None else jax.process_index()
    pc = process_count if process_count is not None else jax.process_count()
    return intervals[pi::pc]


def balanced_host_slices(intervals: list, weights: list | None = None,
                         process_count: int | None = None) -> list[list]:
    """Disjoint-complete partition of ``intervals`` across hosts with
    near-equal total ``weights`` (window counts) per host.

    Greedy LPT: heaviest interval first onto the currently-lightest host —
    deterministic (ties break on host index / interval order), so every
    host computes the SAME assignment from the same metadata and no
    host-to-host agreement round is needed.  Per-host step counts in a
    multi-process run must match or hosts desync at the first collective;
    the residual imbalance after LPT is bounded by one interval's windows
    and is removed by the DataLoader's truncate-to-global-min batch cap.
    """
    pc = process_count if process_count is not None else jax.process_count()
    if weights is None:
        return [intervals[i::pc] for i in range(pc)]
    assert len(weights) == len(intervals)
    order = sorted(range(len(intervals)),
                   key=lambda i: (-weights[i], i))
    loads = [0] * pc
    buckets: list[list[int]] = [[] for _ in range(pc)]
    for i in order:
        h = min(range(pc), key=lambda k: (loads[k], k))
        buckets[h].append(i)
        loads[h] += weights[i]
    return [[intervals[i] for i in sorted(b)] for b in buckets]


def make_sharded_train_steps(g_model, d_model, train_cfg, mesh: Mesh,
                             tensor_parallel: bool = False):
    """Jitted train steps with explicit GSPMD shardings.

    States are replicated (or TP-sharded by rule); batches are sharded on the
    data axis; XLA inserts the gradient psum over ICI.
    """
    from a2m.train.train_step import make_train_steps
    g_step, d_step, eval_step = make_train_steps(g_model, d_model, train_cfg,
                                                 donate=False,
                                                 jit_steps=False)
    bs = batch_sharding(mesh)
    rep = replicated(mesh)

    def wrap(fn, n_state_args: int, n_batch_args: int, n_scalar: int,
             n_trailing_batch: int = 0):
        # states: keep caller-placed shardings (replicated or TP-ruled);
        # batch arrays: data-sharded; scalars: replicated; trailing
        # optional style/mask: data-sharded ((B,) arrays; None args carry
        # no leaves so the spec is inert when omitted)
        in_sh = ((None,) * n_state_args + (bs,) * n_batch_args
                 + (rep,) * n_scalar + (bs,) * n_trailing_batch)
        return jax.jit(fn, in_shardings=in_sh)

    def g_full(g_state, d_state, audio, pose, mean, std, smooth, noise,
               key, style=None, mask=None):
        return g_step(g_state, d_state, audio, pose, mean, std, smooth,
                      noise, key, style=style, mask=mask)

    def d_full(g_state, d_state, audio, pose, mean, std, sr, sf, noise,
               key, style=None, mask=None):
        return d_step(g_state, d_state, audio, pose, mean, std, sr, sf,
                      noise, key, style=style, mask=mask)

    g_sharded = wrap(g_full, 2, 2, 5, 2)
    d_sharded = wrap(d_full, 2, 2, 6, 2)
    # eval(g_state, d_state, audio, pose, mean, std, mask, style)
    eval_sharded = jax.jit(eval_step, in_shardings=(
        None, None, bs, bs, rep, rep, bs, bs))
    return g_sharded, d_sharded, eval_sharded
