"""Checkpoint / resume via Orbax.

The reference only *saves* ``state_dict``s (G and D per epoch + Best_Gen,
`version5_model_train.py:501-516`) and has no resume path; optimizer and
controller state are never persisted.  Here a checkpoint is the complete
training state — (G, D) params + batch stats + optimizer states, controller
state, normalization stats, epoch — so training resumes exactly.
"""

from __future__ import annotations

import json
from pathlib import Path

import jax
import numpy as np
import orbax.checkpoint as ocp

from a2m.train.train_step import NetState


def _tree_to_pure(tree):
    return jax.tree.map(np.asarray, tree)


class CheckpointManager:
    def __init__(self, directory, max_to_keep: int = 5):
        self.directory = Path(directory).absolute()
        self.directory.mkdir(parents=True, exist_ok=True)
        self.manager = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                                 create=True))

    def save(self, epoch: int, g_state: NetState, d_state: NetState,
             controller_state: dict, mean, std,
             extra: dict | None = None) -> None:
        payload = dict(
            g_params=_tree_to_pure(g_state.params),
            g_batch_stats=_tree_to_pure(g_state.batch_stats),
            g_opt=_tree_to_pure(g_state.opt_state),
            d_params=_tree_to_pure(d_state.params),
            d_batch_stats=_tree_to_pure(d_state.batch_stats),
            d_opt=_tree_to_pure(d_state.opt_state),
            mean=np.asarray(mean), std=np.asarray(std),
        )
        self.manager.save(epoch, args=ocp.args.Composite(
            state=ocp.args.StandardSave(payload),
            controller=ocp.args.JsonSave(controller_state),
            extra=ocp.args.JsonSave(extra or {}),
        ))
        self.manager.wait_until_finished()

    def latest_epoch(self) -> int | None:
        return self.manager.latest_step()

    def restore(self, g_state: NetState, d_state: NetState,
                epoch: int | None = None):
        """Restore into the structure of freshly-initialized states."""
        epoch = epoch if epoch is not None else self.manager.latest_step()
        if epoch is None:
            return None
        template = dict(
            g_params=_tree_to_pure(g_state.params),
            g_batch_stats=_tree_to_pure(g_state.batch_stats),
            g_opt=_tree_to_pure(g_state.opt_state),
            d_params=_tree_to_pure(d_state.params),
            d_batch_stats=_tree_to_pure(d_state.batch_stats),
            d_opt=_tree_to_pure(d_state.opt_state),
            mean=np.zeros(104, np.float32), std=np.ones(104, np.float32),
        )
        restored = self.manager.restore(epoch, args=ocp.args.Composite(
            state=ocp.args.StandardRestore(template),
            controller=ocp.args.JsonRestore(),
            extra=ocp.args.JsonRestore(),
        ))
        st = restored['state']
        new_g = NetState(st['g_params'], st['g_batch_stats'], st['g_opt'])
        new_d = NetState(st['d_params'], st['d_batch_stats'], st['d_opt'])
        return dict(epoch=epoch, g_state=new_g, d_state=new_d,
                    controller=restored['controller'],
                    mean=st['mean'], std=st['std'],
                    extra=restored['extra'])

    def save_best_generator(self, g_state: NetState, mean=None,
                            std=None) -> None:
        """Standalone best-G checkpoint (reference Best_Gen,
        version5_model_train.py:508-510).

        ``mean``/``std``: the training normalization stats.  The reference's
        Best_Gen never carries them, so its inference script re-derives stats
        from whatever loader it builds (generate_motion_video.py:240-243) —
        wrong stats when eval data differs from training data (e.g. a
        multi-speaker checkpoint evaluated per-speaker).  Saving them here
        lets eval/viz denormalize with the stats the model was trained on.
        """
        path = self.directory / 'best_gen'
        payload = dict(params=_tree_to_pure(g_state.params),
                       batch_stats=_tree_to_pure(g_state.batch_stats))
        if mean is not None and std is not None:
            payload['mean'] = np.asarray(mean)
            payload['std'] = np.asarray(std)
        ckpt = ocp.StandardCheckpointer()
        ckpt.save(path, payload, force=True)
        ckpt.wait_until_finished()

    def load_best_generator(self, g_state: NetState) -> dict | None:
        return load_generator_ckpt(self.directory / 'best_gen', g_state)


def load_generator_ckpt(path, g_state: NetState) -> dict | None:
    """Restore a standalone generator checkpoint directory (the ``best_gen``
    layout written by :meth:`CheckpointManager.save_best_generator` and by
    ``python -m a2m.compat``).

    Returns dict(params, batch_stats[, mean, std]) — normalization stats
    present iff the checkpoint was saved with them (older checkpoints and
    reference imports load without).
    """
    path = Path(path).absolute()
    if not path.exists():
        return None
    ckpt = ocp.StandardCheckpointer()
    template = dict(params=_tree_to_pure(g_state.params),
                    batch_stats=_tree_to_pure(g_state.batch_stats))
    with_stats = dict(template, mean=np.zeros(104, np.float32),
                      std=np.ones(104, np.float32))
    try:
        return ckpt.restore(path, with_stats)
    except Exception:
        return ckpt.restore(path, template)


# ---------------------------------------------------------------------------
# Compact portable best-G weights (single .npz file, committable to a repo).
#
# The reference's Best_Gen is a torch ``state_dict`` pickle
# (`version5_model_train.py:508-510`) — not portable, no stats.  The npz
# flavor flattens the flax trees to ``params/<path>`` / ``batch_stats/
# <path>`` keys, stores weights as float16 (49.8M params -> ~100 MB; weight
# magnitudes sit far inside f16 range, and PCK of the restored model is
# verified equal in tests), and keeps normalization stats exact (f32).


def _flatten_tree(prefix: str, tree, out: dict) -> None:
    if isinstance(tree, dict):
        for k, v in tree.items():
            _flatten_tree(f'{prefix}/{k}', v, out)
    else:
        out[prefix] = np.asarray(tree)


def _unflatten(flat: dict) -> dict:
    root: dict = {}
    for key, val in flat.items():
        parts = key.split('/')
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val
    return root


def save_best_generator_npz(best: dict, out_path) -> Path:
    """Pack a ``load_generator_ckpt`` result dict into one .npz file.

    Weights are stored f16 (magnitudes sit far inside f16 range — verified
    per tensor below); ``batch_stats`` stay f32: GAN-trained BatchNorm
    variances exceed 65504 (f16 max -> inf -> dead BN layers; the round-5
    flagship packed at PCK 0.363 instead of 0.763 before this guard), and
    their total size is negligible next to the 38M params."""
    flat: dict = {}
    _flatten_tree('params', _tree_to_pure(best['params']), flat)
    bs_flat: dict = {}
    _flatten_tree('batch_stats', _tree_to_pure(best['batch_stats']), bs_flat)
    packed = {k: (v.astype(np.float16)
                  if v.dtype == np.float32
                  and np.abs(v).max(initial=0.0) < 6e4 else v)
              for k, v in flat.items()}
    packed.update(bs_flat)
    if 'mean' in best:
        packed['stats/mean'] = np.asarray(best['mean'], np.float32)
        packed['stats/std'] = np.asarray(best['std'], np.float32)
    out_path = Path(out_path)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    with open(out_path, 'wb') as f:
        np.savez(f, **packed)
    return out_path


def pack_best_generator_npz(ckpt_dir, out_path, g_state=None) -> Path:
    """Orbax ``best_gen`` checkpoint dir -> portable .npz."""
    if g_state is None:
        import jax.numpy as jnp
        from a2m.config import GeneratorConfig
        from a2m.models import Generator
        g = Generator(GeneratorConfig())
        variables = jax.eval_shape(
            g.init, {'params': jax.random.PRNGKey(0),
                     'dropout': jax.random.PRNGKey(0)},
            jnp.zeros((1, 64, 128), jnp.float32))
        g_state = NetState(
            jax.tree.map(lambda s: np.zeros(s.shape, s.dtype),
                         variables['params']),
            jax.tree.map(lambda s: np.zeros(s.shape, s.dtype),
                         variables.get('batch_stats', {})), None)
    best = load_generator_ckpt(Path(ckpt_dir) / 'best_gen', g_state)
    if best is None:
        best = load_generator_ckpt(ckpt_dir, g_state)
    if best is None:
        raise FileNotFoundError(f'no best_gen checkpoint under {ckpt_dir}')
    return save_best_generator_npz(best, out_path)


def load_best_generator_npz(path) -> dict:
    """Restore dict(params, batch_stats[, mean, std]); f16 -> f32."""
    with np.load(Path(path), allow_pickle=False) as z:
        flat = {k: z[k] for k in z.files}
    flat = {k: (v.astype(np.float32) if v.dtype == np.float16 else v)
            for k, v in flat.items()}
    tree = _unflatten(flat)
    out = dict(params=tree.get('params', {}),
               batch_stats=tree.get('batch_stats', {}))
    if 'stats' in tree:
        out['mean'] = tree['stats']['mean']
        out['std'] = tree['stats']['std']
    return out


def load_any_generator_ckpt(path, g_state: NetState) -> dict | None:
    """Best-G weights from any supported layout: a packed ``.npz`` file, a
    save dir containing ``best_gen``, or a ``best_gen`` dir itself."""
    p = Path(path)
    if p.suffix == '.npz':
        return load_best_generator_npz(p) if p.exists() else None
    best = load_generator_ckpt(p / 'best_gen', g_state)
    return best if best is not None else load_generator_ckpt(p, g_state)


def save_loss_history(path, loss_dict: dict) -> None:
    """Loss-history artifact (reference saves loss.npy via torch.save,
    version5_model_train.py:519-532)."""
    np.save(str(path), np.asarray(json.dumps(loss_dict)))


def load_loss_history(path) -> dict:
    return json.loads(str(np.load(str(path), allow_pickle=False)))
