"""Typed configuration for the whole framework.

The reference scatters hyperparameters as module-level constants in each
entry script (`version5_model_train.py:184-205`,
`generate_motion_video.py:220-232`) plus an argparse grid helper
(`pats/argsUtils.py:7-52`).  Here every subsystem is configured by one
dataclass tree with CLI overrides (see :func:`apply_overrides`).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Sequence


@dataclass(frozen=True)
class AudioConfig:
    """Audio frontend selection; specs live in :mod:`a2m.constants`."""
    method: str = 'log_mel_512'     # 'log_mel_512' | 'log_mel_400' | 'vggish'
    # fused Pallas mel kernel for modality preprocessing:
    # 'auto' = Pallas on a real TPU backend, XLA elsewhere; 'on' | 'off'
    # force it.  (Measured A/B: XLA and Pallas are within 3% on TPU.)
    use_pallas: str = 'auto'

    def pallas_mode(self) -> bool | None:
        """Tri-state for :class:`a2m.data.modalities.Audio`."""
        return {'auto': None, 'on': True, 'off': False}[self.use_pallas]


@dataclass(frozen=True)
class DataConfig:
    path2data: str = './pats/data'
    speakers: tuple[str, ...] = ('oliver', 'noah', 'seth', 'shelly',
                                 'ellen', 'angelica', 'almaram', 'chemistry')
    modalities: tuple[str, ...] = ('pose/data', 'audio/log_mel_512')
    fs_new: tuple[int, ...] = (15, 15)
    batch_size: int = 128
    window_hop: int = 5
    window_seconds: float = 4.3
    shuffle: bool = True
    seed: int = 0
    # truncate each split to N intervals for quick runs (reference
    # dataUtils.py:231-237 `load_data=False` -> 5 intervals)
    max_intervals_per_split: int | None = None
    style_iters: int = 0            # fixed-iteration alternating-style sampler
    num_training_sample: int | None = None  # few-shot subsample per speaker
    quantile_sample: float | None = None    # rebalance by length/velocity
    quantile_num_training_sample: int | None = None
    weighted: int = 0               # weighted sampler draws per epoch
    repeat_text: int = 1
    filler: int = 0
    # multi-host data feeding: each process loads intervals[i::count]
    # (a2m/parallel/mesh.py::host_interval_slice).  None = no sharding;
    # process_count=-1 resolves both from jax.process_index()/count()
    process_index: int | None = None
    process_count: int | None = None
    # a2m extension (off = reference parity): bounded-RAM data loading.
    # The reference holds every interval in RAM (dataUtils.py:530-540 —
    # tens of GB at real-PATS scale); lazy mode reads shape metadata at
    # startup and window payloads through a bounded LRU at access time
    # (a2m/data/dataset.py::_lazy_interval_array)
    lazy_intervals: bool = False
    # a2m extension (off = reference parity): drift-free windowing.  The
    # reference's stride-slicing resample drifts k/267 s per window between
    # the 89 Hz mel grid and 15 fps pose (LEARNING.md "fixture drift");
    # exact mode gathers each output frame's nearest source row instead
    # (a2m/data/windowing.py::ExactWindowIndex)
    exact_windows: bool = False


@dataclass(frozen=True)
class GeneratorConfig:
    time_steps: int = 64
    in_channels: int = 256
    out_channels: int = 256
    out_feats: int = 104
    body_feats: int = 20
    num_body_joints: int = 10
    num_hand_joints: int = 42
    joint_feat_dim: int = 64
    dropout: float = 0.2
    gat_heads: int = 4
    # opt-in speaker-style conditioning: >0 adds a learned speaker embedding
    # to the encoder features (the reference's Style module is a stub,
    # model_layers.py:913-923; here it is a real capability)
    num_style_speakers: int = 0
    # fused Pallas GCN stacks (a2m/nn/pallas_gcn.py): 1.46x the XLA
    # lowering on v5e at eval, and trainable via a custom-VJP fused
    # backward kernel — but ~15 min Mosaic compile per kernel instance on
    # the remote-compile backend, so opt-in for deployments where the
    # compile amortizes
    fused_gcn: bool = False
    # rolled per-head fori_loop in the fused kernels — same math, ~4x
    # fewer Mosaic instructions (faster remote compile); see
    # a2m/nn/pallas_gcn.py::_gat_rolled
    fused_rolled: bool = False
    # rows-per-program for the fused kernels (None = pallas_gcn.TILE);
    # multiple of 8. The rolled layout keeps fewer live VMEM buffers, so
    # larger tiles fit than the unrolled kernel's 16-row limit
    fused_tile: Optional[int] = None
    # edge-incidence v2 eval kernel (pallas_gcn._fused_impl_edge): message
    # routing as constant S/D gather-GEMMs shared by all graphs in a
    # (J, TILE, F) layout — removes the per-graph batched matmuls that
    # dominate the dense kernel at J=42. Applies to gradient-free
    # forwards; the grad path keeps the dense stash/backward kernels
    fused_edge: bool = False


@dataclass(frozen=True)
class DiscriminatorConfig:
    in_channels: int = 104
    out_channels: int = 64
    n_downsampling: int = 2
    dropout: float = 0.3
    groups: int = 1
    aux_classes: int = 10
    # the aux gesture-type classifier head is dead compute unless its CE
    # loss is applied (train.lambda_aux > 0); gated off by default —
    # the reference's head would crash if enabled (real_motion_model.py:572)
    use_aux_classifier: bool = False
    out_shape: int = 1
    joint_feat_dim: int = 64
    gat_heads: int = 4
    # optional audio conditioning of D (real_motion_model.py:564,624-628):
    # the train/eval steps pass the batch's log-mel features into every D
    # forward (adaptive-pooled onto D's time axis and concatenated before
    # the logits conv).  Off by default — the reference defines the branch
    # but never drives it either
    audio_fusion: bool = False


@dataclass(frozen=True)
class ControllerConfig:
    """DynamicGANTraining parameters (reference version5_model_train.py:12-180)."""
    g_lr: float = 5e-4
    d_lr: float = 1e-3
    d_strong_threshold: float = 0.20
    g_weak_threshold: float = 0.80
    g_strong_threshold: float = 0.10
    init_d_freq: int = 1
    init_g_freq: int = 3
    min_d_freq: int = 1
    max_d_freq: int = 2
    min_g_freq: int = 2
    max_g_freq: int = 6
    real_label_smooth: float = 0.98
    fake_label_smooth: float = 0.02
    dynamic_smooth: bool = False
    history_cap: int = 100
    window: int = 10
    # label noise annealing
    max_noise_std: float = 0.01
    min_noise_std: float = 0.002
    anneal_start_epoch: int = 0
    anneal_end_epoch: int = 60
    max_smooth_offset: float = 0.05
    # a2m extension (OFF by default = exact reference parity): bounds on the
    # multiplicative LR adaptation.  The reference law multiplies g_lr by
    # 1.05 every epoch while recent_d < d_strong_threshold with no clamp
    # (version5_model_train.py:96-133) — measured at full scale this
    # compounds 26x over 80 epochs and diverges training (LEARNING.md run
    # B).  g_lr_max caps the growth; d_lr_min floors the 0.9x decay so a
    # skipped D can recover.  0.0 disables either bound.
    g_lr_max: float = 0.0
    d_lr_min: float = 0.0


@dataclass(frozen=True)
class TrainConfig:
    n_epochs: int = 500
    lambda_d: float = 1.0
    lambda_gan: float = 1.0
    lambda_smooth: float = 0.1
    lambda_jerk: float = 0.05
    # aux gesture/speaker-classifier CE on the D's real branch
    # (real_motion_model.py:635-640, optional there too); requires
    # discriminator.use_aux_classifier=true
    lambda_aux: float = 0.0
    # a2m extension (default 0 = exact reference objective): L1 on absolute
    # normalized pose.  The reference supervises only frame diffs
    # (version5_model_train.py:367-376), so absolute position — what PCK
    # measures — is a free integration constant; the round-3 campaign
    # (LEARNING.md) showed trained PCK cannot beat a static mean pose under
    # that objective.  lambda_pos > 0 pins it.
    lambda_pos: float = 0.0
    save_dir: str = './save/multi_speaker'
    save_every_epochs: int = 1
    # validation metric that selects the best-G checkpoint.  'val_g'
    # (reference parity, version5_model_train.py:508-510) is the total dev G
    # loss — under an active GAN it is dominated by the drifting adversarial
    # term and selects pre-convergence checkpoints (LEARNING.md run GP60).
    # 'pos' selects on absolute-position L1; 'val_pck' on dev PCK@0.2
    # (higher is better — the only maximized choice).
    best_metric: str = 'val_g'
    log_every_batches: int = 200
    resume: bool = True             # resume from latest checkpoint if present
    # warm-start from a migrated/standalone checkpoint directory (e.g. the
    # output of `python -m a2m.compat`): loads `best_gen` into G and, when
    # present, `imported_disc` into D before training; optimizer state
    # starts fresh (the reference never persisted it).  A later `resume`
    # restore (same run dir) takes precedence.
    init_from: str = ''
    controller: ControllerConfig = field(default_factory=ControllerConfig)
    # precision policy: 'f32' or 'bf16' (matmul/conv compute dtype).
    # bf16 is numerically stable (losses.safe_norm fixed the exact-zero
    # gradient NaNs) and converges within 2% of f32, but is NOT faster for
    # this model family (measured: g_step 101.8 ms bf16 vs 96.5 ms f32 at
    # B=128 — the graph is non-MXU-bound at these channel widths), so f32
    # is the default.
    compute_dtype: str = 'f32'
    # route gradient-FREE generator forwards (the no-grad fake generation
    # inside d_step, and eval_step) through the fused Pallas GCN eval
    # kernel while g_step keeps the XLA path.  Measured on v5e at B=128
    # f32: d_step 54.7 -> 39.0 ms (1.4x); the fully-fused g_step is SLOWER
    # (144.7 ms — the fused backward loses to XLA's), so this hybrid is
    # the profitable split.  None = auto: ON for the single-chip jitted
    # steps on a real TPU (first-time Mosaic compiles cost ~1-3 min/kernel
    # on the remote-compile backend), OFF on CPU and in the sharded
    # wrappers (Pallas partitioning untested under GSPMD).
    fused_gcn_eval: Optional[bool] = None
    # global-norm gradient clipping; 0 disables (reference parity: none)
    grad_clip_norm: float = 0.0
    # PRNG implementation for the training key.  None = auto: 'rbg' (the
    # TPU's hardware RNG path — measured 4.9 ms faster g_step at B=128,
    # scripts/step_time_ablation.py) on a real TPU, 'threefry2x32'
    # elsewhere.  Draw STREAMS differ between impls, so seeds are not
    # reproducible across impls (set one explicitly to pin).
    rng_impl: Optional[str] = None
    # rematerialization of the G loss forward: '' (off), 'dots' (keep
    # matmul outputs, recompute elementwise chains in the backward), or
    # 'full' — a bandwidth-for-FLOPs trade on the memory-bound step (see
    # README roofline); numerics unchanged
    remat: str = ''
    donate_buffers: bool = True
    # observability (SURVEY §5 tracing/profiling): measure per-step MFU once
    # at start of training; capture a jax.profiler device trace of the first
    # few steps into profile_dir when set
    log_mfu: bool = True
    profile_dir: str = ''
    # input-pipeline depth: batches staged on-device ahead of consumption by
    # a worker thread (h2d costs ~150 ms/batch on the tunnel backend);
    # 0 = fully synchronous feeding
    prefetch_batches: int = 2


@dataclass(frozen=True)
class MeshConfig:
    """Device mesh for GSPMD sharding.

    ``data=1, model=1`` (default) keeps the single-device train steps
    (donation on, no collectives).  Any larger product makes the
    :class:`~a2m.train.loop.Trainer` build a ``Mesh(('data','model'))``,
    place states replicated (or TP-ruled when ``model > 1``), shard every
    batch over the ``data`` axis, and use the GSPMD train steps
    (:func:`a2m.parallel.make_sharded_train_steps`) — gradient all-reduce
    becomes an XLA-inserted psum over ICI.  ``data=-1`` means "all devices
    divided by ``model``" (e.g. ``python -m a2m.train mesh.data=-1``).
    """
    data: int = 1                   # batch (data-parallel) axis; -1 = all
    model: int = 1                  # optional channel-dim (tensor) axis
    axis_names: tuple[str, str] = ('data', 'model')

    def resolved_shape(self, n_devices: int) -> tuple[int, int]:
        """(data, model) with -1 resolved against ``n_devices``."""
        model = max(1, self.model)
        data = self.data if self.data > 0 else max(1, n_devices // model)
        return data, model


@dataclass(frozen=True)
class DistConfig:
    """Multi-process (multi-host) runtime bootstrap.

    The reference is strictly single-process/single-GPU
    (`version5_model_train.py:256-282`); the TPU-native equivalent of a
    comm backend is ``jax.distributed.initialize`` + a global mesh
    (SURVEY.md §2.5).  Configure either via CLI overrides::

        python -m a2m.train dist.coordinator=10.0.0.1:8476 \
            dist.num_processes=2 dist.process_id=0 mesh.data=-1

    or via env (``A2M_COORDINATOR`` / ``A2M_NUM_PROCESSES`` /
    ``A2M_PROCESS_ID`` — one launch command for every process), or
    ``dist.auto=true`` on TPU pods where jax infers everything from the
    runtime.  When active, :class:`~a2m.train.loop.Trainer` meshes over all
    global devices, the loader feeds per-process interval slices
    (``data.process_index/-count``), and every batch is assembled into a
    global array — ``data.batch_size`` stays the PER-PROCESS batch size.
    """
    coordinator: str = ''      # 'host:port' of process 0; '' = single-process
    num_processes: int = 0     # total process count (0 = from env / auto)
    process_id: int = -1       # this process's id (-1 = from env / auto)
    auto: bool = False         # bare jax.distributed.initialize() (TPU pods)


@dataclass(frozen=True)
class Config:
    audio: AudioConfig = field(default_factory=AudioConfig)
    data: DataConfig = field(default_factory=DataConfig)
    generator: GeneratorConfig = field(default_factory=GeneratorConfig)
    discriminator: DiscriminatorConfig = field(default_factory=DiscriminatorConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    dist: DistConfig = field(default_factory=DistConfig)


#: validation metrics the eval step reports (train.best_metric choices)
BEST_METRICS = ('val_g', 'val_d', 'reg', 'pos', 'gan', 'bone', 'angle',
                'smooth', 'jerk', 'val_pck')


def validate(cfg: Config, backend: str | None = None) -> Config:
    """Cross-field checks that would otherwise fail deep inside a jitted
    forward (or worse, on-device at first step).  Entry points (Trainer,
    ``python -m a2m.train``) call this; returns ``cfg`` unchanged.
    """
    if backend is None:
        import jax
        backend = jax.default_backend()
    if cfg.generator.fused_edge and backend == 'tpu':
        raise ValueError(
            'generator.fused_edge is a CPU-interpret-only design study: the '
            'edge-form Pallas kernel crashes the Mosaic compiler on real '
            'TPU (a2m/nn/pallas_gcn.py::_check_edge_backend). Use the dense '
            'fused kernels (generator.fused_gcn / fused_rolled) on TPU.')
    if cfg.train.best_metric not in BEST_METRICS:
        raise ValueError(
            f'train.best_metric={cfg.train.best_metric!r} not one of '
            f'{BEST_METRICS}')
    if cfg.train.lambda_aux > 0 and not cfg.discriminator.use_aux_classifier:
        raise ValueError(
            'train.lambda_aux > 0 requires discriminator.use_aux_classifier')
    return cfg


def _set_nested(cfg: Any, dotted: str, value: str) -> Any:
    head, _, rest = dotted.partition('.')
    if not hasattr(cfg, head):
        raise KeyError(f'unknown config field {head!r} on {type(cfg).__name__}')
    if rest:
        sub = _set_nested(getattr(cfg, head), rest, value)
        return dataclasses.replace(cfg, **{head: sub})
    cur = getattr(cfg, head)
    if isinstance(cur, bool):
        parsed: Any = value.lower() in ('1', 'true', 'yes')
    elif isinstance(cur, int):
        parsed = int(value)
    elif isinstance(cur, float):
        parsed = float(value)
    elif isinstance(cur, tuple):
        elem = type(cur[0]) if cur else str
        parsed = tuple(elem(v) for v in value.split(','))
    elif cur is None:
        low = value.lower()
        if low in ('true', 'false', 'yes', 'no'):
            parsed = low in ('true', 'yes')
        elif low in ('none', 'null'):
            parsed = None
        elif value.replace('.', '', 1).isdigit():
            parsed = float(value) if '.' in value else int(value)
        else:
            parsed = value
    else:
        parsed = value
    return dataclasses.replace(cfg, **{head: parsed})


def apply_overrides(cfg: Config, overrides: Sequence[str]) -> Config:
    """Apply ``key.path=value`` CLI overrides (one config source of truth).

    Example: ``apply_overrides(cfg, ["data.batch_size=4", "train.n_epochs=1"])``
    """
    for item in overrides:
        key, _, value = item.partition('=')
        cfg = _set_nested(cfg, key.strip(), value.strip())
    return cfg


def config_grid(base: Config, grid: dict[str, Sequence[str]]) -> list[Config]:
    """Cartesian product of per-key value lists -> list of configs.

    TPU-native equivalent of the reference's argparse grid-search helper
    (`pats/argsUtils.py:7-42`).
    """
    import itertools
    keys = list(grid.keys())
    configs = []
    for values in itertools.product(*(grid[k] for k in keys)):
        configs.append(apply_overrides(
            base, [f'{k}={v}' for k, v in zip(keys, values)]))
    return configs
