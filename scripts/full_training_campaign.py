"""Full-size TPU training campaign (VERDICT r2 item 1).

Trains the flagship 256-channel default config at reference scale
(`version5_model_train.py:184-205` hyperparameters: batch 128, 8 speakers,
window_hop 5, dynamic controller) on a realistic-size correlated synthetic
multi-speaker PATS tree, long enough to observe:

* a monotone-ish decreasing val G trajectory at full model size,
* the controller's skip-D / frequency / LR transitions actually firing
  (`version5_model_train.py:62-133` semantics at scale),
* harness PCK of the trained best checkpoint clearly above the
  untrained-init PCK (the reference never wires PCK at all — SURVEY §4).

Artifacts: per-epoch JSON progress -> ``<save>/campaign_progress.json``;
final summary (trajectory + controller events + PCK before/after) printed
as JSON and written to ``<save>/campaign_summary.json``.

Usage::

    python scripts/full_training_campaign.py [epochs] [--fresh] [--env] \
        [--tag NAME] [--seed N] [key.path=value ...]

Default fixtures are ``deterministic`` (pose a deterministic function of the
mel bands — absolute positions learnable, so PCK can beat the mean-pose
predictor); ``--env`` selects the envelope-correlated mode (motion
statistics learnable, positions not — run A of LEARNING.md).

``--tag`` names a separate save root (``/tmp/a2m_campaign_<mode>_<tag>``)
so ablations coexist; the dataset lives at ``/tmp/a2m_data_<mode>`` and is
shared across tags.  Trailing ``key.path=value`` args are standard config
overrides (``a2m.config.apply_overrides``), e.g. ``train.lambda_gan=0
controller.d_strong_threshold=0`` for a supervised-only diagnostic.
"""

from __future__ import annotations

import json
import pathlib
import shutil
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

MODE = 'det'
OVERRIDES: list[str] = []
ROOT = pathlib.Path('/tmp/a2m_campaign')
SPEAKERS = ('oliver', 'noah', 'seth', 'shelly',
            'ellen', 'angelica', 'almaram', 'chemistry')


def build_dataset() -> pathlib.Path:
    """8 speakers x 5 intervals x 120 s, 3/1/1 train/dev/test — ~8.2k train
    windows (65 batches @ B=128), correlated audio->motion structure.

    Shared across campaign tags at ``/tmp/a2m_data_<mode>`` (migrates a
    pre-tag ``<root>/data`` tree if one exists)."""
    from a2m.data.synthetic import make_synthetic_pats
    data = pathlib.Path(f'/tmp/a2m_data_{MODE}')
    marker = data / '.complete'
    if marker.exists():
        return data
    legacy = pathlib.Path(f'/tmp/a2m_campaign_{MODE}') / 'data'
    if (legacy / '.complete').exists():
        shutil.move(str(legacy), str(data))
        return data
    if data.exists():
        shutil.rmtree(data)
    t0 = time.perf_counter()
    make_synthetic_pats(data, speakers=SPEAKERS, intervals_per_speaker=5,
                        duration_s=120.0, seed=0,
                        correlated=(MODE == 'env'),
                        deterministic=(MODE == 'det'),
                        splits=('train', 'train', 'train', 'dev', 'test'))
    marker.touch()
    print(f'dataset built in {time.perf_counter() - t0:.1f}s', flush=True)
    return data


def instrument_controller(ctrl, events: list):
    """Record every controller decision change (the reference prints these —
    version5_model_train.py:94,100,120,127,411)."""
    orig_freq = ctrl.adjust_training_frequency
    orig_lr = ctrl.adjust_learning_rates
    orig_skip = ctrl.should_train_discriminator
    state = dict(skips=0, epoch=0)

    def adj_freq(epoch):
        state['epoch'] = epoch
        before = (ctrl.g_train_freq, ctrl.d_train_freq)
        out = orig_freq(epoch)
        if out != before:
            events.append(dict(epoch=epoch, kind='freq',
                               g=out[0], d=out[1],
                               prev_g=before[0], prev_d=before[1]))
        return out

    def adj_lr(epoch):
        before = (ctrl.g_lr_current, ctrl.d_lr_current)
        out = orig_lr(epoch)
        if out != before:
            events.append(dict(epoch=epoch, kind='lr',
                               g_lr=out[0], d_lr=out[1]))
        return out

    def skip():
        out = orig_skip()
        if not out:
            state['skips'] += 1
        return out

    ctrl.adjust_training_frequency = adj_freq
    ctrl.adjust_learning_rates = adj_lr
    ctrl.should_train_discriminator = skip
    return state


def main(epochs: int = 80, fresh: bool = False, seed: int = 0) -> None:
    if fresh and (ROOT / 'save').exists():
        shutil.rmtree(ROOT / 'save')
    data = build_dataset()

    from a2m.config import Config, DataConfig, TrainConfig, apply_overrides
    from a2m.data import DataLoader
    from a2m.train.loop import Trainer

    save = ROOT / 'save'
    cfg = Config(
        data=DataConfig(path2data=str(data), speakers=SPEAKERS),
        train=TrainConfig(n_epochs=epochs, save_every_epochs=25,
                          save_dir=str(save), resume=True,
                          log_every_batches=50),
    )
    # CLI overrides: bare keys address TrainConfig/ControllerConfig directly
    qualified = [(o if o.split('=')[0].split('.')[0] in
                  ('audio', 'data', 'generator', 'discriminator', 'train',
                   'mesh')
                  else ('train.controller.' + o if o.startswith(
                      ('d_', 'g_', 'init_', 'min_', 'max_', 'real_', 'fake_',
                       'dynamic_', 'history_', 'window', 'anneal_'))
                        else 'train.' + o))
                 for o in OVERRIDES]
    if qualified:
        cfg = apply_overrides(cfg, qualified)
        print(f'config overrides: {qualified}', flush=True)
    dl = DataLoader(path2data=cfg.data.path2data,
                    speaker=list(cfg.data.speakers),
                    modalities=list(cfg.data.modalities),
                    fs_new=list(cfg.data.fs_new),
                    batch_size=cfg.data.batch_size,
                    window_hop=cfg.data.window_hop,
                    shuffle=cfg.data.shuffle, seed=cfg.data.seed)
    print(f'train batches/epoch: {len(dl.train)}  dev: {len(dl.dev)}  '
          f'test: {len(dl.test)}', flush=True)

    trainer = Trainer(cfg, dl, seed=seed)
    events: list[dict] = []
    skip_state = instrument_controller(trainer.controller, events)

    epoch_log: list[dict] = []
    progress_path = save / 'campaign_progress.json'
    best_val = trainer.initial_best_score()
    for epoch in range(trainer.start_epoch, epochs):
        t0 = time.perf_counter()
        skip_before = skip_state['skips']
        trainer.train_epoch(epoch)
        val = trainer.validate()
        wall = time.perf_counter() - t0
        trainer.loss_history['val_g'].append(val.get('val_g', 0.0))
        trainer.loss_history['val_d'].append(val.get('val_d', 0.0))
        row = dict(epoch=epoch, wall_s=round(wall, 1),
                   g_freq=trainer.controller.g_train_freq,
                   d_freq=trainer.controller.d_train_freq,
                   g_lr=trainer.controller.g_lr_current,
                   d_lr=trainer.controller.d_lr_current,
                   skip_d_batches=skip_state['skips'] - skip_before,
                   **{k: round(float(v), 4) for k, v in val.items()})
        epoch_log.append(row)
        print(json.dumps(row), flush=True)

        score = trainer.best_score(val)
        if score < best_val:
            best_val = score
            trainer.save_best(epoch, val)
        if (epoch + 1) % cfg.train.save_every_epochs == 0 or epoch == epochs - 1:
            trainer.ckpt.save(epoch, trainer.g_state, trainer.d_state,
                              trainer.controller.state_dict(), trainer.mean,
                              trainer.std,
                              extra=dict(loss_history=trainer.loss_history))
        progress_path.write_text(json.dumps(
            dict(epochs=epoch_log, events=events)))

    # -- PCK: untrained init vs trained best checkpoint --------------------
    from a2m.eval.harness import evaluate_speaker
    pck = {}
    for name, ckpt in (('untrained', None), ('trained', str(save / 'ckpt'))):
        r = evaluate_speaker(str(data), 'oliver', ckpt_dir=ckpt,
                             batch_size=128, alpha=(0.2, 0.1))
        pck[name] = dict(pck=r['pck'], pck_by_alpha=r['pck_by_alpha'],
                         l2=r['l2'], n_clips=r['n_clips'])
        print(f'PCK[{name}] = {r["pck_by_alpha"]}  L2 = {r["l2"]:.2f}',
              flush=True)

    summary = dict(mode=MODE, overrides=OVERRIDES,
                   epochs_run=len(epoch_log), events=events,
                   val_g=[e['val_g'] for e in epoch_log],
                   val_d=[e['val_d'] for e in epoch_log],
                   best_val_g=best_val, pck=pck,
                   total_skip_d=skip_state['skips'],
                   epoch_log=epoch_log)
    (save / 'campaign_summary.json').write_text(json.dumps(summary))
    print('CAMPAIGN_SUMMARY ' + json.dumps(
        {k: summary[k] for k in ('epochs_run', 'best_val_g', 'pck',
                                 'total_skip_d')}), flush=True)


# ---------------------------------------------------------------------------
# Turnkey recipe: the proven two-stage GANFT pipeline (VERDICT r4 item 2).
#
# Stage 1 reproduces run pos60r4 (supervised position training, val_pck
# best-checkpoint selection, dead D) and stage 2 reproduces run ganft1
# (GAN fine-tune warm-started from stage 1, clamped D LR, val_pck
# selection) — the recorded recipe that reached test PCK@0.2 = 0.812 on the
# deterministic fixture (artifacts/campaign_ganft1_summary.json; LEARNING.md
# runs P60r4/GANFT1).  One command, empty /tmp -> trained flagship best_gen
# + StableHLO export + manifest under artifacts/.

RECIPE_S1 = [
    'train.lambda_pos=1.0', 'train.lambda_gan=0', 'train.lambda_smooth=0',
    'train.lambda_jerk=0', 'train.best_metric=val_pck',
    'train.controller.d_strong_threshold=0', 'train.controller.g_lr=0.001',
]
RECIPE_S2 = [
    'train.lambda_pos=1.0', 'train.best_metric=val_pck',
    'd_lr=2e-4', 'd_lr_min=2e-4', 'g_lr_max=1e-3',
]


def run_recipe_ganft(tag: str = 'ganft', seed: int = 0,
                     epochs=(60, 60)) -> None:
    """Run both stages in subprocesses (fresh jax state per stage; each
    stage resumes from its periodic checkpoints if interrupted), then
    export + evaluate the trained flagship and write a manifest."""
    import hashlib
    import subprocess
    here = pathlib.Path(__file__).resolve()
    repo = here.parent.parent
    stages = [
        (f'{tag}_s1', epochs[0], list(RECIPE_S1)),
        (f'{tag}_s2', epochs[1], list(RECIPE_S2) + [
            f'train.init_from=/tmp/a2m_campaign_det_{tag}_s1/save/ckpt']),
    ]
    t_all = time.time()
    for stage_tag, eps, ovs in stages:
        root = pathlib.Path(f'/tmp/a2m_campaign_det_{stage_tag}')
        if (root / 'save' / 'campaign_summary.json').exists():
            print(f'[recipe] stage {stage_tag}: complete, skipping',
                  flush=True)
            continue
        cmd = [sys.executable, str(here), str(eps), '--tag', stage_tag,
               '--seed', str(seed)] + ovs
        print(f'[recipe] stage {stage_tag}: {" ".join(cmd)}', flush=True)
        t0 = time.time()
        # The remote-compile tunnel flakes transiently ("response body
        # closed", service restarts); each stage resumes from its periodic
        # checkpoints, so retrying with backoff is cheap and rides out
        # outages of up to a few hours.
        for attempt in range(40):
            try:
                subprocess.run(cmd, check=True)
                break
            except subprocess.CalledProcessError as e:
                wait = min(300, 30 * (attempt + 1))
                print(f'[recipe] stage {stage_tag} attempt {attempt} '
                      f'failed ({e}); retrying in {wait}s', flush=True)
                time.sleep(wait)
        else:
            raise RuntimeError(f'stage {stage_tag} failed after retries')
        print(f'[recipe] stage {stage_tag} done in '
              f'{time.time() - t0:.0f}s', flush=True)

    s2_root = pathlib.Path(f'/tmp/a2m_campaign_det_{tag}_s2')
    ckpt = s2_root / 'save' / 'ckpt'
    summary = json.loads(
        (s2_root / 'save' / 'campaign_summary.json').read_text())

    # StableHLO serving artifact (weights + shipped stats baked in)
    from a2m.export import main as export_main
    shlo = pathlib.Path('/tmp/a2m_flagship/a2m_pose.shlo')
    export_info = export_main(['--ckpt', str(ckpt), '--out', str(shlo),
                               '--check'])

    # compact in-repo weights: best_gen params/bn as bf16 npz + f32 stats
    from a2m.train.checkpoint import pack_best_generator_npz
    npz_path = repo / 'artifacts' / 'flagship_best_gen.npz'
    pack_best_generator_npz(ckpt, npz_path)

    manifest = dict(
        recipe='ganft', seed=seed, epochs=list(epochs),
        stage_overrides={'s1': RECIPE_S1, 's2': RECIPE_S2},
        ckpt_dir=str(ckpt), export=export_info,
        npz=str(npz_path.relative_to(repo)),
        npz_sha256=hashlib.sha256(npz_path.read_bytes()).hexdigest(),
        npz_bytes=npz_path.stat().st_size,
        pck=summary.get('pck'), wall_s=round(time.time() - t_all, 1),
        data_root=f'/tmp/a2m_data_det',
    )
    out = repo / 'artifacts' / 'flagship_manifest.json'
    out.write_text(json.dumps(manifest, indent=1) + '\n')
    print('[recipe] manifest -> ' + str(out), flush=True)
    print('RECIPE_SUMMARY ' + json.dumps(
        dict(pck=manifest['pck'], wall_s=manifest['wall_s'])), flush=True)


if __name__ == '__main__':
    argv = sys.argv[1:]
    if '--recipe' in argv:
        i = argv.index('--recipe')
        name = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
        if name != 'ganft':
            raise SystemExit(f'unknown recipe {name!r} (have: ganft)')
        tag_r = 'ganft'
        if '--tag' in argv:
            j = argv.index('--tag')
            tag_r = argv[j + 1]
            argv = argv[:j] + argv[j + 2:]
        seed_r = 0
        if '--seed' in argv:
            j = argv.index('--seed')
            seed_r = int(argv[j + 1])
            argv = argv[:j] + argv[j + 2:]
        eps = [int(a) for a in argv if a.isdigit()] or [60, 60]
        run_recipe_ganft(tag_r, seed_r,
                         tuple(eps * 2)[:2])
        raise SystemExit(0)
    tag = ''
    if '--tag' in argv:
        i = argv.index('--tag')
        tag = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    seed = 0
    if '--seed' in argv:                 # training RNG (model init, dropout,
        i = argv.index('--seed')         # label noise, data shuffle chain)
        seed = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]
    args = [a for a in argv if not a.startswith('--')]
    OVERRIDES = [a for a in args if '=' in a]
    args = [a for a in args if '=' not in a]
    if '--env' in argv:
        MODE = 'env'
    ROOT = pathlib.Path(f'/tmp/a2m_campaign_{MODE}' + (f'_{tag}' if tag
                                                       else ''))
    main(int(args[0]) if args else 80, fresh='--fresh' in argv, seed=seed)
