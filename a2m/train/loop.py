"""Training loop: dynamic GAN schedule over jitted steps.

Reference flow (`version5_model_train.py:251-533`) with the fixes and TPU
restructuring documented in :mod:`a2m.train.train_step`:

epoch loop -> controller frequency/LR adjustment -> per batch: g_freq
generator steps, (conditional) d_freq discriminator steps, history update ->
per-epoch masked validation with loss breakdown -> Orbax checkpoint (+best
generator) -> loss-history artifact.  Resume is supported (the reference has
none).
"""

from __future__ import annotations

import contextlib
import dataclasses
import time
from pathlib import Path
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from a2m.config import Config
from a2m.data import get_mean_std_necksub
from a2m.models import Discriminator, Generator
from a2m.train import checkpoint as ckpt_lib
from a2m.train.controller import DynamicGANTraining
from a2m.train.train_step import init_states, make_train_steps, set_lr
from a2m.utils import profiling


class Trainer:
    def __init__(self, cfg: Config, dataloader, g_model: Generator | None = None,
                 d_model: Discriminator | None = None, seed: int = 0,
                 log_fn: Callable[[str], None] = print):
        from a2m.config import validate as validate_config
        self.cfg = cfg = validate_config(cfg)
        self.dataloader = dataloader
        # multi-process runtime (jax.distributed — a2m.parallel.launch):
        # only process 0 narrates; every process runs the same global
        # program, so the suppressed lines would be exact duplicates
        self.n_proc = jax.process_count()
        if self.n_proc > 1 and jax.process_index() != 0:
            # A2M_DIST_DEBUG=1: prefix instead of suppress (skew debugging)
            import os as _os
            if _os.environ.get('A2M_DIST_DEBUG'):
                _pid, _t0 = jax.process_index(), time.time()
                self.log = lambda s: log_fn(
                    f'[p{_pid} +{time.time() - _t0:.1f}s] {s}')
            else:
                self.log = lambda s: None
        elif self.n_proc > 1:
            import os as _os
            if _os.environ.get('A2M_DIST_DEBUG'):
                _t0 = time.time()
                self.log = lambda s: log_fn(
                    f'[p0 +{time.time() - _t0:.1f}s] {s}')
            else:
                self.log = log_fn
        else:
            self.log = log_fn
        import jax.numpy as _jnp
        compute_dtype = (_jnp.bfloat16 if cfg.train.compute_dtype == 'bf16'
                         else _jnp.float32)
        self.g_model = g_model or Generator(cfg.generator,
                                            dtype=compute_dtype)
        self.d_model = d_model or Discriminator(cfg.discriminator,
                                                dtype=compute_dtype)
        self.controller = DynamicGANTraining(cfg.train.controller)
        # train.rng_impl: hardware RNG ('rbg') inside the jitted steps
        # (dropout + label noise) is -4.9 ms/g_step at B=128 on v5e; None =
        # auto-select it on a real TPU (threefry elsewhere, keeping CPU
        # tests deterministic vs history).  Typed keys (jax.random.key)
        # carry their impl through split/fold_in.
        rng_impl = cfg.train.rng_impl
        if rng_impl is None and jax.default_backend() == 'tpu':
            rng_impl = 'rbg'
        self.key = (jax.random.key(seed, impl=rng_impl)
                    if rng_impl else jax.random.PRNGKey(seed))

        self.key, init_key = jax.random.split(self.key)
        self.log('init: building model/optimizer states')
        self.g_state, self.d_state = init_states(
            self.g_model, self.d_model, init_key,
            batch_size=cfg.data.batch_size,
            time_steps=cfg.generator.time_steps,
            g_lr=cfg.train.controller.g_lr, d_lr=cfg.train.controller.d_lr,
            grad_clip_norm=cfg.train.grad_clip_norm)

        # GSPMD mesh training (SURVEY §7.7): any mesh larger than one device
        # switches to the sharded train steps — states replicated (or
        # TP-ruled), batches sharded over 'data', gradient psum over ICI.
        # The reference is strictly single-GPU (version5_model_train.py:
        # 256-282); mesh.data=1 (default) keeps the single-device steps.
        self.mesh = None
        data_ax, model_ax = cfg.mesh.resolved_shape(jax.device_count())
        if self.n_proc > 1:
            # multi-process REQUIRES one global mesh over every device: jit
            # in a multi-controller runtime is a collective program, and a
            # 1x1 "mesh" would leave each process computing alone while the
            # runtime expects them to rendezvous.  Default config silently
            # upgrades to all-device data-parallel; an explicit partial
            # mesh is a config error.
            if data_ax * model_ax == 1:
                data_ax, model_ax = jax.device_count(), 1
                self.log(f'multi-process run: auto mesh {data_ax}x1')
            if data_ax * model_ax != jax.device_count():
                raise ValueError(
                    f'multi-process run needs mesh covering all '
                    f'{jax.device_count()} global devices, got '
                    f'{data_ax}x{model_ax}; set mesh.data=-1')
            if data_ax % self.n_proc:
                raise ValueError(
                    f'mesh data axis {data_ax} must divide evenly across '
                    f'{self.n_proc} processes')
            mesh_cfg = dataclasses.replace(cfg.mesh, data=data_ax,
                                           model=model_ax)
        else:
            mesh_cfg = cfg.mesh
        if data_ax * model_ax > 1:
            from a2m.parallel import (make_mesh, make_sharded_train_steps,
                                      param_shardings, replicated)
            # data.batch_size is per process: each process's loader yields
            # its own local batch, assembled into a global array of
            # batch_size * n_proc rows spread over the data axis
            local_data_ax = data_ax // self.n_proc
            if cfg.data.batch_size % local_data_ax:
                raise ValueError(
                    f'data.batch_size={cfg.data.batch_size} (per process) '
                    f'not divisible by local mesh data share '
                    f'{local_data_ax}')
            self.mesh = make_mesh(mesh_cfg)
            tp = model_ax > 1
            rep = replicated(self.mesh)
            # multi-process: device_put onto a cross-process sharding runs
            # a hidden per-leaf assert_equal allgather — use the
            # communication-free global_put (state is replicated by
            # construction: same seed / same checkpoint on every process)
            if self.n_proc > 1:
                from a2m.parallel import global_put as put
            else:
                put = jax.device_put

            def place(state):
                return state._replace(
                    params=put(state.params,
                               param_shardings(state.params, self.mesh,
                                               tp)),
                    batch_stats=put(state.batch_stats, rep),
                    opt_state=put(state.opt_state, rep))

            self._place_state = place
            self.g_state, self.d_state = place(self.g_state), place(
                self.d_state)
            g_s, d_s, e_s = make_sharded_train_steps(
                self.g_model, self.d_model, cfg.train, self.mesh,
                tensor_parallel=tp)
            if self.n_proc > 1:
                # first-execution alignment: compile AOT, host-barrier,
                # THEN execute, so per-process compile skew (minutes under
                # cold caches / CPU contention) can never trip Gloo's 30 s
                # collective-context deadline (a2m.parallel.launch)
                g_s = self._align_first_call(g_s, 'g_step')
                d_s = self._align_first_call(d_s, 'd_step')
                e_s = self._align_first_call(e_s, 'eval_step')
            # the sharded steps take style/mask as explicit positionals
            # (in_shardings must match the positional arg count); adapt to
            # the Trainer's keyword calling convention
            self.g_step = lambda *a, style=None, mask=None: g_s(*a, style,
                                                                mask)
            self.d_step = lambda *a, style=None, mask=None: d_s(*a, style,
                                                                mask)
            self.eval_step = lambda *a, style=None: e_s(*a, style)
            self.log(f'mesh training: {data_ax}x{model_ax} (data x model)'
                     + (' + tensor-parallel rules' if tp else ''))
        else:
            self._place_state = lambda s: s
            self.g_step, self.d_step, self.eval_step = make_train_steps(
                self.g_model, self.d_model, cfg.train,
                donate=cfg.train.donate_buffers)

        self.log('init: states placed; computing normalization stats')
        # train-set normalization stats (reference
        # version5_model_train.py:296; computed once, checkpointed).  In a
        # multi-process run each host sees only its interval slice, so the
        # per-host partial moments are all-reduced to the exact global
        # statistics before finalizing — every process MUST hold identical
        # stats (they parameterize the jitted global program).
        if self.n_proc > 1:
            from a2m.data.normalization import (finalize_moments_necksub,
                                                get_moments_necksub)
            from a2m.parallel.launch import sync_global_moments
            mean, std = finalize_moments_necksub(*sync_global_moments(
                *get_moments_necksub(dataloader.train)))
        else:
            mean, std = get_mean_std_necksub(dataloader.train)
        self.mean = self._rep(mean)
        self.std = self._rep(std)

        self.log('init: normalization stats ready')
        self.ckpt = ckpt_lib.CheckpointManager(
            Path(cfg.train.save_dir) / 'ckpt')
        self.start_epoch = 0
        self._mfu_done = not cfg.train.log_mfu
        self._mfu_times: dict[str, list] = {'g': [], 'd': []}
        self.loss_history: dict[str, list] = dict(
            train_g=[], train_d=[], val_g=[], val_d=[])

        if cfg.train.init_from:
            self._init_from(cfg.train.init_from)

        if cfg.train.resume:
            restored = self.ckpt.restore(self.g_state, self.d_state)
            if restored is not None:
                self.g_state = restored['g_state']
                self.d_state = restored['d_state']
                self.controller.load_state_dict(restored['controller'])
                self.mean = self._rep(restored['mean'])
                self.std = self._rep(restored['std'])
                self.start_epoch = restored['epoch'] + 1
                self.loss_history = restored['extra'].get(
                    'loss_history', self.loss_history)
                self.log(f'resumed from epoch {restored["epoch"]}')

        # restored/warm-started states are host trees — (re)apply the mesh
        # placement so the sharded steps see properly placed inputs
        if self.mesh is not None and (cfg.train.resume or cfg.train.init_from):
            self.g_state = self._place_state(self.g_state)
            self.d_state = self._place_state(self.d_state)

    # ------------------------------------------------------------------

    def _init_from(self, path) -> None:
        """Warm-start from a checkpoint directory holding a standalone
        ``best_gen`` (and optionally ``imported_disc``) — the layout written
        by ``python -m a2m.compat`` and by ``save_best_generator``.  Params,
        BN stats, and (when saved with the checkpoint) normalization stats
        load; optimizer state stays fresh (the reference never persisted it,
        version5_model_train.py:509-515)."""
        import numpy as _np
        import orbax.checkpoint as ocp
        p = Path(path)
        best = ckpt_lib.load_any_generator_ckpt(p, self.g_state)
        if best is None:
            raise FileNotFoundError(
                f'train.init_from: no best_gen checkpoint under {p}')
        self.g_state = self.g_state._replace(
            params=best['params'], batch_stats=best['batch_stats'])
        loaded = 'G'
        if 'mean' in best:
            # adopt the stats the warm-start model was trained with — its
            # outputs live in that normalization space
            self.mean = self._rep(best['mean'])
            self.std = self._rep(best['std'])
            loaded += '+stats'
        d_dir = (p / 'imported_disc').absolute()
        if d_dir.exists():
            ckpt = ocp.StandardCheckpointer()
            tmpl = dict(params=jax.tree.map(_np.asarray,
                                            self.d_state.params),
                        batch_stats=jax.tree.map(_np.asarray,
                                                 self.d_state.batch_stats))
            rd = ckpt.restore(d_dir, tmpl)
            self.d_state = self.d_state._replace(
                params=rd['params'], batch_stats=rd['batch_stats'])
            loaded += '+D'
        self.log(f'initialized {loaded} from {p}')

    def _align_first_call(self, fn, name: str):
        """Multi-process wrapper: AOT-compile on first call, barrier, run.

        The compiled executable is kept and reused (shapes are static for
        the whole run); anything that doesn't match its signature falls
        back to the jitted ``fn``."""
        from a2m.parallel.launch import host_barrier
        holder: dict = {}

        def wrapper(*args):
            if 'compiled' not in holder:
                self.log(f'{name}: compiling (pre-execution alignment)')
                holder['compiled'] = fn.lower(*args).compile()
                host_barrier(f'a2m_first_{name}')
                self.log(f'{name}: all processes aligned; executing')
            try:
                return holder['compiled'](*args)
            except TypeError:
                return fn(*args)

        return wrapper

    def _next_key(self):
        self.key, sub = jax.random.split(self.key)
        return sub

    def _rep(self, x):
        """Stage a replicated array (mesh-aware device placement)."""
        if self.mesh is not None:
            from a2m.parallel import global_put, replicated
            if self.n_proc > 1:   # no hidden assert_equal collective
                return global_put(np.asarray(x), replicated(self.mesh))
            return jax.device_put(jnp.asarray(x), replicated(self.mesh))
        return jnp.asarray(x)

    def _batch_put(self, x):
        """Stage a batch array, sharded over the mesh data axis when on.

        Multi-process: the local batch is this process's shard of the
        global batch — ``make_array_from_process_local_data`` assembles the
        global jax.Array (global batch = local x n_proc) without any
        cross-host data movement."""
        if x is None:
            return None
        if self.mesh is not None:
            from a2m.parallel import batch_sharding
            if self.n_proc > 1:
                return jax.make_array_from_process_local_data(
                    batch_sharding(self.mesh), np.asarray(x))
            return jax.device_put(jnp.asarray(x), batch_sharding(self.mesh))
        return jnp.asarray(x)

    def _mfu_report(self, args, style, mask):
        """Log per-step MFU once, from timings of the live training steps.

        Timings come from instrumented *real* step calls (donation-safe —
        nothing is replayed on stale state); FLOPs come from XLA's
        client-side HLO cost analysis (no extra compile).  The reference has
        no perf accounting at all (SURVEY §5).
        """
        import numpy as _np
        from a2m.utils import mfu as mfu_lib
        g_args, d_args = args
        self._mfu_done = True
        dtype = self.cfg.train.compute_dtype
        # first sample of each phase includes the compile — drop it
        g_s = float(_np.median(self._mfu_times['g'][1:]
                               or self._mfu_times['g']))
        g_fl = mfu_lib.compiled_flops(self.g_step, *g_args, style=style,
                                      mask=mask)
        self.log(mfu_lib.format_mfu_line('g_step', g_fl, g_s, dtype))
        b = g_args[2].shape[0]
        line = f'throughput: {b / g_s:.0f} samples/s (g)'
        if self._mfu_times['d']:
            d_s = float(_np.median(self._mfu_times['d'][1:]
                                   or self._mfu_times['d']))
            d_fl = mfu_lib.compiled_flops(self.d_step, *d_args, style=style,
                                          mask=mask)
            self.log(mfu_lib.format_mfu_line('d_step', d_fl, d_s, dtype))
            line += f', {b / d_s:.0f} samples/s (d)'
        self.log(line)

    def _style_ids(self, batch):
        """(B,) int32 speaker ids when style conditioning / aux CE is on."""
        if (self.cfg.generator.num_style_speakers <= 0
                and self.cfg.train.lambda_aux <= 0):
            return None
        style = np.asarray(batch['style'])
        if style.ndim > 1:
            style = style[:, 0]
        if self.cfg.train.lambda_aux > 0:
            # one_hot maps out-of-range labels to an all-zero row, which
            # would make the aux CE silently contribute zero for those
            # samples — fail loudly instead
            n = self.cfg.discriminator.aux_classes
            if style.max(initial=0) >= n:
                raise ValueError(
                    f'aux CE: speaker id {int(style.max())} >= '
                    f'discriminator.aux_classes={n}; raise aux_classes to '
                    f'cover every speaker style id')
        return jnp.asarray(style.astype(np.int32))

    def _prefetch(self, iterator):
        """Stage (audio, pose, style, mask) on-device ahead of consumption.

        Host->device transfers on the tunnel backend cost ~150 ms per
        full-size batch; a worker thread issues batch i+1's transfers while
        batch i computes, so the device never waits on input
        (cfg.train.prefetch_batches deep; 0 = fully synchronous).
        """
        depth = self.cfg.train.prefetch_batches
        to_device = lambda b: (self._batch_put(b['audio/log_mel_512']),  # noqa: E731
                               self._batch_put(b['pose/data']),
                               self._batch_put(self._style_ids(b)),
                               self._batch_put(b['mask']))
        if depth <= 0:
            for batch in iterator:
                yield to_device(batch)
            return
        import queue
        import threading
        q: queue.Queue = queue.Queue(maxsize=depth)
        done = object()
        stop = threading.Event()   # consumer abandoned the epoch: unblock

        def put(item) -> bool:
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        def worker():
            try:
                for batch in iterator:
                    if not put(to_device(batch)):
                        return         # consumer gone — release h5 handles
            except BaseException as e:          # surface in the main thread
                put(e)
                return
            put(done)

        threading.Thread(target=worker, daemon=True).start()
        try:
            while (item := q.get()) is not done:
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()             # end the worker if we exit early

    def train_epoch(self, epoch: int) -> tuple[float, float]:
        cfg = self.cfg
        ctrl = self.controller
        g_freq, d_freq = ctrl.adjust_training_frequency(epoch)
        g_lr, d_lr = ctrl.adjust_learning_rates(epoch)
        self.g_state = self.g_state._replace(
            opt_state=set_lr(self.g_state.opt_state, g_lr))
        self.d_state = self.d_state._replace(
            opt_state=set_lr(self.d_state.opt_state, d_lr))

        real_lp = ctrl.label_params(epoch, is_real=True)
        fake_lp = ctrl.label_params(epoch, is_real=False)
        last_g = last_d = 0.0
        n_batches = 0
        # Deferred metric drain: a host<->device round trip on this backend
        # costs ~34 ms, and the controller's per-batch decision only needs
        # loss history through the PREVIOUS batch (the synchronous loop also
        # appended batch i's losses after batch i finished).  So batch i-1's
        # metrics are fetched while batch i's G update is in flight — the
        # device pipeline never stalls on the tunnel, and the controller
        # sees exactly the same loss sequence as a fully synchronous loop.
        pending: tuple | None = None        # previous batch's (gm, dm|None)

        def drain(p) -> None:
            nonlocal last_g, last_d
            gm_p, dm_p = p
            last_g = float(gm_p['g_loss'])
            if dm_p is not None:
                last_d = float(dm_p['d_loss'])
            ctrl.update_loss_history(last_d, last_g)

        # mask is always passed (all-ones == plain mean) so full and
        # wrap-padded ragged batches share ONE compiled step
        for i, (audio, pose, style, mask) in enumerate(
                self._prefetch(self.dataloader.train)):

            measuring = not self._mfu_done
            tracing = (measuring and self.cfg.train.profile_dir and i == 2)
            trace_ctx = (profiling.device_trace(self.cfg.train.profile_dir)
                         if tracing else contextlib.nullcontext())
            with trace_ctx:
                for _ in range(g_freq):
                    t0 = time.perf_counter()
                    with profiling.trace_annotation('a2m.g_step'):
                        self.g_state, new_d_bs, gm = self.g_step(
                            self.g_state, self.d_state, audio, pose,
                            self.mean, self.std, real_lp.smooth_real,
                            real_lp.noise_std, self._next_key(), style=style,
                            mask=mask)
                    self.d_state = self.d_state._replace(
                        batch_stats=new_d_bs)
                    if measuring:
                        # d2h sync: block_until_ready does not synchronize
                        # on remote-tunnel backends (round-1 gotcha)
                        float(gm['g_loss'])
                        self._mfu_times['g'].append(time.perf_counter() - t0)
                # drain batch i-1's metrics while batch i's G is in flight
                if pending is not None:
                    drain(pending)

                dm = None
                if ctrl.should_train_discriminator():
                    for _ in range(d_freq):
                        t0 = time.perf_counter()
                        with profiling.trace_annotation('a2m.d_step'):
                            self.d_state, self.g_state, dm = self.d_step(
                                self.g_state, self.d_state, audio, pose,
                                self.mean, self.std, real_lp.smooth_real,
                                fake_lp.smooth_fake, real_lp.noise_std,
                                self._next_key(), style=style, mask=mask)
                        if measuring:
                            float(dm['d_loss'])
                            self._mfu_times['d'].append(
                                time.perf_counter() - t0)
                # else dm stays None: reuse last_d at drain time
                # (version5_model_train.py:407-411)
                pending = (gm, dm)
            if tracing:
                self.log(f'device trace -> {self.cfg.train.profile_dir}')
            min_batch = 2 if self.cfg.train.profile_dir else 1
            if (measuring and i >= min_batch
                    and len(self._mfu_times['g']) >= 2):
                self._mfu_report(self._mfu_args(audio, pose, real_lp,
                                                fake_lp), style, mask)

            n_batches += 1
            if i % cfg.train.log_every_batches == cfg.train.log_every_batches - 1:
                # last_g/last_d reflect the previous drained batch (one
                # batch of display lag; training behavior is unaffected)
                rd, rg = ctrl.get_recent_avg_loss()
                self.log(f'[Epoch {epoch}] [Batch {i + 1}] '
                         f'[D {last_d:.4f}] [G {last_g:.4f}] '
                         f'[recent D {rd:.4f} G {rg:.4f}] '
                         f'[freq G{g_freq}/D{d_freq}]')
                self.loss_history['train_g'].append(last_g)
                self.loss_history['train_d'].append(last_d)
        if pending is not None:
            drain(pending)           # final batch completes the history
        if not self._mfu_done and self._mfu_times['g'] and n_batches:
            # epochs shorter than the in-loop report threshold would
            # otherwise keep measuring mode (and its per-step d2h syncs)
            # on forever — finish with whatever samples this epoch produced
            self._mfu_report(self._mfu_args(audio, pose, real_lp, fake_lp),
                             style, mask)
        return last_g, last_d

    def _mfu_args(self, audio, pose, real_lp, fake_lp):
        g_args = (self.g_state, self.d_state, audio, pose, self.mean,
                  self.std, real_lp.smooth_real, real_lp.noise_std, self.key)
        d_args = (self.g_state, self.d_state, audio, pose, self.mean,
                  self.std, real_lp.smooth_real, fake_lp.smooth_fake,
                  real_lp.noise_std, self.key)
        return g_args, d_args

    def best_score(self, val: dict[str, float]) -> float:
        """Scalar to MINIMIZE for best-G selection, per cfg.train.best_metric
        ('val_pck' is a quality metric — negated so higher PCK wins)."""
        m = self.cfg.train.best_metric
        if m not in val:
            raise KeyError(f'train.best_metric={m!r} not in validation '
                           f'metrics {sorted(val)}')
        return -val[m] if m == 'val_pck' else val[m]

    def initial_best_score(self) -> float:
        """Resume-safe starting 'best' for checkpoint selection."""
        hist = self.loss_history.get('best_score')
        if hist:
            return min(hist)
        if self.cfg.train.best_metric == 'val_g':
            # pre-best_metric checkpoints tracked best via val_g history
            return min(self.loss_history['val_g'], default=float('inf'))
        return float('inf')

    def save_best(self, epoch: int, val: dict[str, float]) -> None:
        self.loss_history.setdefault('best_score', []).append(
            self.best_score(val))
        # multi-process: EVERY process must enter the save — orbax
        # coordinates its own cross-process barriers and writes from the
        # primary host only; a process-0-only call deadlocks the primary
        # against peers that never arrive (observed in the 2-process
        # integration run)
        self.ckpt.save_best_generator(self.g_state, self.mean, self.std)
        m = self.cfg.train.best_metric
        self.log(f'new best G at epoch {epoch} ({m} {val[m]:.4f})')

    def validate(self) -> dict[str, float]:
        sums: dict[str, float] = {}
        steps = 0
        for batch in self.dataloader.dev:
            audio = self._batch_put(batch['audio/log_mel_512'])
            pose = self._batch_put(batch['pose/data'])
            mask = self._batch_put(batch['mask'])
            metrics = self.eval_step(self.g_state, self.d_state, audio, pose,
                                     self.mean, self.std, mask,
                                     style=self._batch_put(
                                         self._style_ids(batch)))
            # one d2h transfer for the whole metric dict (each float() is a
            # separate ~ms round trip on the tunnel backend)
            for k, v in jax.device_get(metrics).items():
                sums[k] = sums.get(k, 0.0) + float(v)
            steps += 1
        return {k: v / max(steps, 1) for k, v in sums.items()}

    def fit(self, n_epochs: int | None = None) -> dict:
        cfg = self.cfg
        n_epochs = n_epochs if n_epochs is not None else cfg.train.n_epochs
        best_val = self.initial_best_score()
        for epoch in range(self.start_epoch, n_epochs):
            t0 = time.perf_counter()
            self.train_epoch(epoch)
            val = self.validate()
            self.loss_history['val_g'].append(val.get('val_g', 0.0))
            self.loss_history['val_d'].append(val.get('val_d', 0.0))
            self.log(f'[Validation] Epoch {epoch}/{n_epochs} | '
                     f'G {val.get("val_g", 0):.4f} D {val.get("val_d", 0):.4f} | '
                     f'bone {val.get("bone", 0):.4f} angle {val.get("angle", 0):.4f} '
                     f'smooth {val.get("smooth", 0):.4f} jerk {val.get("jerk", 0):.4f} | '
                     f'{time.perf_counter() - t0:.1f}s')

            # empty dev split -> no metrics to select on; skip best-G
            # selection (best_score raises on a mistyped metric NAME, but an
            # absent dev set is a legitimate tiny-fixture configuration)
            if val:
                score = self.best_score(val)
                if score < best_val:
                    best_val = score
                    self.save_best(epoch, val)

            if epoch % cfg.train.save_every_epochs == 0:
                # all processes enter (orbax coordinates multi-process
                # writes itself — see save_best); plain-file artifacts are
                # primary-host-only
                self.ckpt.save(epoch, self.g_state, self.d_state,
                               self.controller.state_dict(), self.mean,
                               self.std,
                               extra=dict(loss_history=self.loss_history))
                if jax.process_index() == 0:
                    ckpt_lib.save_loss_history(
                        Path(cfg.train.save_dir) / 'loss.npy',
                        self.loss_history)
        return self.loss_history
