"""Data pipeline tests on a synthetic PATS fixture (SURVEY.md §4 strategy c)."""

import numpy as np
import pytest

from a2m import constants
from a2m.data import (Batcher, DataLoader, IntervalData, hdf5_io,
                      make_synthetic_pats, normalization, window_index)
from a2m.data.dataset import (AlternateClassSampler, BalanceClassSampler,
                              ConcatIntervals, SequentialSampler)


@pytest.fixture(scope='module')
def pats_root(tmp_path_factory):
    root = tmp_path_factory.mktemp('pats')
    return make_synthetic_pats(root, speakers=('oliver', 'noah'),
                               intervals_per_speaker=4, duration_s=12.0)


@pytest.fixture(scope='module')
def loader(pats_root):
    return DataLoader(path2data=pats_root, speaker=['oliver', 'noah'],
                      modalities=['pose/data', 'audio/log_mel_512'],
                      fs_new=[15, 15], batch_size=8, window_hop=5, seed=0)


def test_use_pallas_reaches_audio_modality(pats_root):
    """config audio.use_pallas plumbs DataLoader -> Audio frontends."""
    from a2m.config import AudioConfig
    assert AudioConfig(use_pallas='off').pallas_mode() is False
    assert AudioConfig().pallas_mode() is None          # auto
    dl = DataLoader(path2data=pats_root, speaker=['oliver'],
                    modalities=['pose/data', 'audio/log_mel_512'],
                    fs_new=[15, 15], batch_size=4, use_pallas=False)
    assert dl.modality_classes['audio/log_mel_512'].use_pallas is False
    assert not dl.modality_classes['audio/log_mel_512']._pallas_active()


# ---------------------------------------------------------------------------
# window arithmetic
# ---------------------------------------------------------------------------

def test_window_index_reference_arithmetic():
    # pose: fs 15 -> window 64, stride 1; audio: fs 89 -> window 382, stride 6
    wp = window_index(148, 15, 15, 4.3, window_hop=5)
    wa = window_index(849, 89, 15, 4.3, window_hop=5)
    assert wp.window == 64 and wp.stride == 1 and wp.out_len == 64
    assert wa.window == 382 and wa.stride == 6 and wa.out_len == 64
    # hop: 5 pose frames == 30 audio rows
    assert np.all(np.diff(wp.starts) == 5)
    assert np.all(np.diff(wa.starts) == 30)
    # same number of windows for aligned durations
    # (148-64)/5 vs (849-382)/30 — reference relies on these matching closely
    assert abs(len(wp) - len(wa)) <= 2


def test_window_slice_resampling():
    w = window_index(849, 89, 15, 4.3, window_hop=5)
    data = np.arange(849 * 2, dtype=np.float32).reshape(849, 2)
    out = w.slice(data, 1)
    assert out.shape == (64, 2)
    np.testing.assert_array_equal(out[0], data[30])
    np.testing.assert_array_equal(out[1], data[36])


# ---------------------------------------------------------------------------
# interval data / loader
# ---------------------------------------------------------------------------

def test_interval_shapes(loader):
    ds = loader.datasets['train']
    item = ds[0]
    assert item['pose/data'].shape == (64, 104)
    assert item['audio/log_mel_512'].shape == (64, 128)
    assert item['style'].shape == (64,)
    assert item['pose/data'].dtype == np.float32
    assert 'interval_id' in item['meta']
    assert item['idx'] == 0


def test_split_assignment(loader):
    # splits cycle train,train,dev,test per speaker (4 intervals each)
    assert len(loader.datasets['train'].datasets) == 4  # 2 speakers x 2
    assert len(loader.datasets['dev'].datasets) == 2
    assert len(loader.datasets['test'].datasets) == 2


def test_styles_match_speakers(loader):
    styles = {d.style for d in loader.datasets['train'].datasets}
    assert styles == {0, 1}


def test_batcher_static_shapes(loader):
    batches = list(loader.dev)
    n = len(loader.datasets['dev'])
    assert len(batches) == -(-n // 8)
    for b in batches:
        assert b['pose/data'].shape == (8, 64, 104)
        assert b['audio/log_mel_512'].shape == (8, 64, 128)
        assert b['mask'].shape == (8,)
    # final batch mask marks padding
    total = sum(int(b['mask'].sum()) for b in batches)
    assert total == n


def test_train_shuffled_deterministic(pats_root):
    l1 = DataLoader(path2data=pats_root, speaker=['oliver'],
                    modalities=['pose/data', 'audio/log_mel_512'],
                    fs_new=[15, 15], batch_size=4, window_hop=5, seed=7)
    l2 = DataLoader(path2data=pats_root, speaker=['oliver'],
                    modalities=['pose/data', 'audio/log_mel_512'],
                    fs_new=[15, 15], batch_size=4, window_hop=5, seed=7)
    b1 = next(iter(l1.train))
    b2 = next(iter(l2.train))
    np.testing.assert_array_equal(b1['idx'], b2['idx'])


def test_det_fixture_frame_locked(tmp_path):
    """Deterministic fixture stays frame-locked to pose through the loader's
    stride-slicing resample for EVERY window, including late ones.

    Guards the LEARNING.md "fixture drift" fix: at the nominal 89 Hz grid the
    stride-6 slice drifts k/267 s per window k, which silently destroys
    frame-diff (motion) predictability while leaving early-window envelope
    correlation near 1 — so this asserts on the LAST window."""
    from a2m.data.synthetic import make_synthetic_pats

    make_synthetic_pats(tmp_path, speakers=('oliver',),
                        intervals_per_speaker=1, duration_s=40.0, seed=0,
                        deterministic=True, splits=('train',))
    dl = DataLoader(path2data=str(tmp_path), speaker=['oliver'],
                    modalities=['pose/data', 'audio/log_mel_512'],
                    fs_new=[15, 15], batch_size=512, window_hop=5,
                    shuffle=False)
    b = next(iter(dl.train))
    mel, pose, m = b['audio/log_mel_512'], b['pose/data'], b['mask'] > 0
    mel, pose = mel[m], pose[m]
    env_a = (mel.reshape(*mel.shape[:2], 8, 16).mean(-1) + 6.0) / 4.0
    # recover pose-side envelopes by projecting onto the known basis
    from a2m.data.synthetic import _det_basis, _rest_pose
    basis = _det_basis().reshape(8, 104)
    resid = pose - _rest_pose().reshape(104)
    env_p = np.linalg.lstsq(basis.T, resid.reshape(-1, 104).T,
                            rcond=None)[0].T.reshape(*pose.shape[:2], 8)
    # absolute error, not correlation (a flat envelope in one window makes
    # corr noise-limited): mel noise is 0.1/4/sqrt(16 bins) = 0.006 per
    # band-frame; drift in the pre-fix fixture produced errors ~0.1+ on
    # late windows (env slope ~0.3/s x 1.3 s)
    for w in (0, len(mel) // 2, len(mel) - 1):       # first / mid / LAST
        rms = np.sqrt(((env_a[w] - env_p[w]) ** 2).mean(axis=0))
        assert rms.max() < 0.02, f'window {w}: band rms {rms}'


def test_exact_windowing_drift_bound():
    """ExactWindowIndex timestamp error is bounded by half a source sample
    for EVERY window; the reference stride slicing drifts linearly in the
    window index (>1 s by the end of a 120 s interval at 89 Hz/15 fps)."""
    from a2m.data.windowing import exact_window_index, window_index

    fs, fs_new, time, hop, n_rows = 89, 15, 4.3, 5, int(120 * 89) + 1
    wi = window_index(n_rows, fs, fs_new, time, hop)
    we = exact_window_index(n_rows, fs, fs_new, time, hop)
    assert we.out_len == wi.out_len == 64

    def worst_err(rows_fn, starts_frame):
        err = 0.0
        for k in range(0, len(starts_frame), 25):
            target_t = (starts_frame[k] + np.arange(64)) / fs_new
            err = max(err, np.abs(rows_fn(k) / fs - target_t).max())
        return err

    # exact mode: every gathered row within half a sample of its frame time
    e_exact = worst_err(
        lambda k: np.rint((we.start_frames[k] + np.arange(64))
                          * (fs / fs_new)),
        we.start_frames)
    assert e_exact <= 0.5 / fs + 1e-9
    # stride mode: source row = start + 6*i, window starts every 30 rows
    e_stride = worst_err(
        lambda k: wi.starts[k] + np.arange(64) * wi.stride,
        np.arange(len(wi)) * 5)
    assert e_stride > 1.0   # seconds of drift by the late windows


def test_exact_windows_loader_frame_locked(tmp_path):
    """DataLoader(exact_windows=True) frame-locks a NOMINAL-grid det fixture
    (reference stride mode drifts on it — that is the extension's point)."""
    from a2m.data.synthetic import _det_basis, _rest_pose, make_synthetic_pats

    make_synthetic_pats(tmp_path, speakers=('oliver',),
                        intervals_per_speaker=1, duration_s=40.0, seed=0,
                        deterministic=True, det_grid='nominal',
                        splits=('train',))

    def env_rms_last_window(exact):
        dl = DataLoader(path2data=str(tmp_path), speaker=['oliver'],
                        modalities=['pose/data', 'audio/log_mel_512'],
                        fs_new=[15, 15], batch_size=512, window_hop=5,
                        shuffle=False, exact_windows=exact)
        b = next(iter(dl.train))
        m = b['mask'] > 0
        mel, pose = b['audio/log_mel_512'][m], b['pose/data'][m]
        env_a = (mel.reshape(*mel.shape[:2], 8, 16).mean(-1) + 6.0) / 4.0
        basis = _det_basis().reshape(8, 104)
        resid = (pose - _rest_pose().reshape(104)).reshape(-1, 104)
        env_p = np.linalg.lstsq(basis.T, resid.T,
                                rcond=None)[0].T.reshape(*pose.shape[:2], 8)
        w = len(mel) - 1
        return float(np.sqrt(((env_a[w] - env_p[w]) ** 2).mean()))

    assert env_rms_last_window(exact=True) < 0.02
    assert env_rms_last_window(exact=False) > 0.05   # the reference drift


def test_missing_interval_exclusion(pats_root):
    md = hdf5_io.MissingData(pats_root)
    # mark one known interval missing and reload
    all_ids = sorted(hdf5_io.MissingData(pats_root).load_intervals())
    loader0 = DataLoader(path2data=pats_root, speaker=['oliver'],
                         modalities=['pose/data', 'audio/log_mel_512'],
                         fs_new=[15, 15], batch_size=4, window_hop=5)
    n0 = len(loader0.datasets['train'].datasets)
    first_id = loader0.datasets['train'].datasets[0].path2h5
    iid = first_id.split('/')[-1].replace('.h5', '')
    md.save_intervals([iid])
    loader1 = DataLoader(path2data=pats_root, speaker=['oliver'],
                         modalities=['pose/data', 'audio/log_mel_512'],
                         fs_new=[15, 15], batch_size=4, window_hop=5)
    assert len(loader1.datasets['train'].datasets) == n0 - 1
    md.save([])  # reset registry for other tests


def test_scan_missing_keys(pats_root):
    missing = hdf5_io.scan_missing_keys(pats_root, 'oliver', ['999999'])
    assert missing == ['999999']


# ---------------------------------------------------------------------------
# samplers
# ---------------------------------------------------------------------------

def test_alternate_class_sampler_interleaves():
    s = AlternateClassSampler([10, 10], num_samples=8, seed=0)
    idx = list(s)
    assert len(idx) == 8
    # even positions from class 0 block, odd from class 1 block
    assert all(i < 10 for i in idx[0::2])
    assert all(10 <= i < 20 for i in idx[1::2])


def test_balance_class_sampler():
    s = BalanceClassSampler([np.arange(5), np.arange(100, 103)], 10, seed=0)
    idx = list(s)
    assert len(idx) == 10
    assert all(i < 5 for i in idx[0::2])
    assert all(100 <= i < 103 for i in idx[1::2])


def test_style_iters_sampler(pats_root):
    loader = DataLoader(path2data=pats_root, speaker=['oliver', 'noah'],
                        modalities=['pose/data', 'audio/log_mel_512'],
                        fs_new=[15, 15], batch_size=4, window_hop=5,
                        style_iters=2)
    batches = list(loader.train)
    assert len(batches) == 2
    for b in batches:
        # alternating styles within each batch
        styles = b['pose/data'] is not None and b['style'][:, 0]
        assert set(np.unique(styles)) == {0.0, 1.0}


def test_quantile_sampler(pats_root):
    loader = DataLoader(path2data=pats_root, speaker=['oliver'],
                        modalities=['pose/data', 'audio/log_mel_512'],
                        fs_new=[15, 15], batch_size=4, window_hop=5,
                        quantile_sample=0.5)
    n_total = len(loader.datasets['train'])
    n_sampled = len(loader.train.sampler)
    assert 0 < n_sampled < n_total  # above-median-velocity subset


def test_weighted_and_fixed_iters(pats_root):
    kw = dict(path2data=pats_root, speaker=['oliver'],
              modalities=['pose/data', 'audio/log_mel_512'],
              fs_new=[15, 15], batch_size=4, window_hop=5)
    lw = DataLoader(weighted=3, **kw)
    assert len(list(lw.train)) == 3
    ln = DataLoader(num_training_iters=2, **kw)
    assert len(list(ln.train)) == 2


def test_load_data_false_truncates(pats_root):
    loader = DataLoader(path2data=pats_root, speaker=['oliver', 'noah'],
                        modalities=['pose/data', 'audio/log_mel_512'],
                        fs_new=[15, 15], batch_size=4, window_hop=5,
                        load_data=False)
    assert len(loader.datasets['train'].datasets) <= 5


def test_max_intervals_truncates(pats_root):
    loader = DataLoader(path2data=pats_root, speaker=['oliver', 'noah'],
                        modalities=['pose/data', 'audio/log_mel_512'],
                        fs_new=[15, 15], batch_size=4, window_hop=5,
                        max_intervals=1)
    for split in ('train', 'dev', 'test'):
        assert len(loader.datasets[split].datasets) == 1


# ---------------------------------------------------------------------------
# cached per-interval norm stats (reference dataUtils.py:563-582, 656-663)
# ---------------------------------------------------------------------------

def test_norm_stats_read_path(tmp_path):
    root = make_synthetic_pats(tmp_path / 'ns', speakers=('oliver',),
                               intervals_per_speaker=2, duration_s=12.0,
                               with_norm_stats=True)
    fp = hdf5_io.interval_path(root, 'oliver', '100001')
    stats = hdf5_io.load_norm_stats(fp, 'pose/data')
    assert stats is not None
    mean, std = stats
    assert mean.shape == (104,) and std.shape == (104,)

    from a2m.data import load_modality_classes
    classes = load_modality_classes(['pose/data'], root, ['oliver'])
    iv = IntervalData(fp, ['pose/data'], [15], 4.3, classes, window_hop=5)
    assert 'pose/data' in iv.norm_stats
    got = iv[0]['pose/data']
    raw = hdf5_io.load_array(fp, 'pose/data')[0:64]
    expect = (raw - mean) / np.where(std < 1e-7, 1.0, std)
    np.testing.assert_allclose(got, expect, rtol=1e-5)
    # windows are standardized (approximately zero-mean over the interval)
    assert abs(got.mean()) < 2.0

    # 'pose/normalize' has no norm_stats key derivation -> None, no error
    assert hdf5_io.load_norm_stats(fp, 'pose/normalize') is None


def test_norm_stats_malformed_raises(tmp_path):
    root = make_synthetic_pats(tmp_path / 'nsbad', speakers=('oliver',),
                               intervals_per_speaker=1, duration_s=12.0)
    fp = hdf5_io.interval_path(root, 'oliver', '100001')
    with hdf5_io.h5_open(fp, 'a') as h5:
        h5.create_dataset('pose/norm_stats/mean', data=np.zeros(104))
        # missing std
    with pytest.raises(ValueError, match='norm_stats'):
        hdf5_io.load_norm_stats(fp, 'pose/data')


# ---------------------------------------------------------------------------
# text modality through the loader (reference dataUtils.py:660-712)
# ---------------------------------------------------------------------------

@pytest.fixture(scope='module')
def text_root(tmp_path_factory):
    root = tmp_path_factory.mktemp('pats_text')
    return make_synthetic_pats(root, speakers=('oliver', 'noah'),
                               intervals_per_speaker=4, duration_s=12.0,
                               with_text=True)


def test_text_meta_reader(text_root):
    from a2m.data import read_text_meta
    fp = hdf5_io.interval_path(text_root, 'oliver', '100001')
    df = read_text_meta(fp)
    assert df is not None
    assert set(df.columns) >= {'start_frame', 'end_frame', 'Word'}
    assert len(df) >= 2 and df['start_frame'].iloc[0] == 0
    # no text/meta at all -> None
    from a2m.data.synthetic import synth_interval
    bare = text_root / 'bare.h5'
    synth_interval(bare, 6.0, np.random.default_rng(0), with_text=False)
    assert read_text_meta(bare) is None


def test_text_meta_write_roundtrip(tmp_path):
    """write_text_meta -> read_text_meta roundtrip through the public write
    path (pandas-HDF when pytables exists, plain-h5 fallback here)."""
    from a2m.data.dataset import read_text_meta, write_text_meta
    from a2m.data.synthetic import synth_interval
    fp = tmp_path / 'wt.h5'
    synth_interval(fp, 6.0, np.random.default_rng(0), with_text=False)
    table = dict(start_frame=np.array([0, 30, 60]),
                 end_frame=np.array([30, 60, 90]),
                 Word=['hello', 'um', 'world'])
    fmt = write_text_meta(fp, table)
    assert fmt in ('pandas', 'plain')
    df = read_text_meta(fp)
    np.testing.assert_array_equal(df['start_frame'], table['start_frame'])
    np.testing.assert_array_equal(df['end_frame'], table['end_frame'])
    assert list(df['Word']) == table['Word']
    # overwrite replaces, not appends
    table2 = dict(start_frame=np.array([0]), end_frame=np.array([90]),
                  Word=['only'])
    write_text_meta(fp, table2)
    assert list(read_text_meta(fp)['Word']) == ['only']
    # force_plain exercises the fallback layout explicitly
    write_text_meta(fp, table, force_plain=True)
    assert len(read_text_meta(fp)) == 3


def test_text_meta_malformed_raises(text_root, tmp_path):
    from a2m.data import read_text_meta
    bad = tmp_path / 'bad_meta.h5'
    from a2m.data.synthetic import synth_interval
    synth_interval(bad, 6.0, np.random.default_rng(0), with_text=False)
    with hdf5_io.h5_open(bad, 'a') as h5:
        h5.create_dataset('text/meta/start_frame', data=np.arange(3))
        # missing end_frame/Word
    with pytest.raises(ValueError, match='text/meta'):
        read_text_meta(bad)


def test_text_through_loader_repeat(text_root):
    """modalities=[..., 'text/w2v'] with repeat_text=1 + filler: padded
    batches carry text/filler and text/token_duration."""
    dl = DataLoader(path2data=text_root, speaker=['oliver', 'noah'],
                    modalities=['pose/data', 'audio/log_mel_512', 'text/w2v'],
                    fs_new=[15, 15, 15], batch_size=8, window_hop=5,
                    filler=1, seed=0)
    batch = next(iter(dl.train))
    assert batch['text/w2v'].shape == (8, 64, 300)
    assert batch['text/filler'].shape == (8, 64)       # frame-repeated mask
    assert 'text/token_duration' in batch
    # the vocab contains stopwords -> some filler frames are 1 somewhere
    total = sum(b['text/filler'].sum() for b in dl.train)
    assert total > 0
    # durations of each sample's words cover the 64-frame window
    dur = batch['text/token_duration']
    lens = batch.get('text/token_duration_len')
    for i in range(dur.shape[0]):
        k = int(lens[i]) if lens is not None else dur.shape[1]
        assert dur[i, :k].sum() == 64


def test_text_through_loader_norepeat(text_root):
    """repeat_text=0 collapses text to one vector per word (ragged ->
    padded with _len)."""
    dl = DataLoader(path2data=text_root, speaker=['oliver'],
                    modalities=['pose/data', 'audio/log_mel_512', 'text/w2v'],
                    fs_new=[15, 15, 15], batch_size=4, window_hop=5,
                    repeat_text=0, filler=1, seed=0)
    batch = next(iter(dl.train))
    assert batch['text/w2v'].shape[0] == 4
    n_words = batch['text/w2v'].shape[1]
    assert 1 <= n_words < 64                 # per-word, not per-frame
    assert batch['text/filler'].shape[1] == n_words
    # ragged word counts across a batch are padded with _len bookkeeping
    if 'text/w2v_len' in batch:
        assert batch['text/w2v_len'].shape == (4,)
    # word boundaries match the fixture's text/meta table
    from a2m.data import read_text_meta
    iv = dl.datasets['train'].datasets[0]
    df = read_text_meta(iv.path2h5)
    item = iv[0]
    in_window = df[(0 <= df['end_frame']) & (64 > df['start_frame'])]
    assert item['text/w2v'].shape[0] == len(in_window)


# ---------------------------------------------------------------------------
# config -> loader plumbing (every DataConfig field reaches DataLoader)
# ---------------------------------------------------------------------------

def test_dataconfig_field_map_total():
    import dataclasses
    from a2m.config import DataConfig
    from a2m.data import DATACONFIG_FIELD_MAP
    assert ({f.name for f in dataclasses.fields(DataConfig)}
            == set(DATACONFIG_FIELD_MAP))


def test_loader_from_config(text_root):
    from a2m.config import DataConfig
    from a2m.data import loader_from_config
    cfg = DataConfig(path2data=str(text_root), speakers=('oliver',),
                     modalities=('pose/data', 'audio/log_mel_512',
                                 'text/w2v'),
                     fs_new=(15, 15, 15), batch_size=4, window_hop=5,
                     max_intervals_per_split=1, repeat_text=0, filler=1,
                     seed=3)
    dl = loader_from_config(cfg)
    assert dl.max_intervals == 1 and dl.repeat_text == 0 and dl.filler == 1
    assert dl.time == cfg.window_seconds and dl.seed == 3
    assert len(dl.datasets['train'].datasets) == 1
    batch = next(iter(dl.train))
    assert 'text/filler' in batch


# ---------------------------------------------------------------------------
# multi-host data feeding (SURVEY §2.5 DP row)
# ---------------------------------------------------------------------------

def test_multihost_disjoint_complete(pats_root):
    def intervals_of(dl, split):
        from pathlib import Path
        return {Path(d.path2h5).stem for d in dl.datasets[split].datasets}

    kw = dict(path2data=pats_root, speaker=['oliver', 'noah'],
              modalities=['pose/data', 'audio/log_mel_512'],
              fs_new=[15, 15], batch_size=4, window_hop=5)
    full = DataLoader(**kw)
    hosts = [DataLoader(**kw, process_index=i, process_count=2)
             for i in range(2)]
    for split in ('train', 'dev', 'test'):
        shards = [intervals_of(h, split) for h in hosts]
        assert not (shards[0] & shards[1])                   # disjoint
        assert shards[0] | shards[1] == intervals_of(full, split)  # complete
    # each host has an independent batcher over its shard
    assert len(hosts[0].train) >= 1 and len(hosts[1].train) >= 1
    b0 = next(iter(hosts[0].train))
    assert b0['pose/data'].shape == (4, 64, 104)


# ---------------------------------------------------------------------------
# normalization
# ---------------------------------------------------------------------------

def test_necksub_stats(loader):
    mean, std = normalization.get_mean_std_necksub(loader.train)
    assert mean.shape == (104,) and std.shape == (104,)
    # neck entries: mean 0, std pinned to 1
    assert mean[0] == 0.0 and mean[52] == 0.0
    assert std[0] == 1.0 and std[52] == 1.0
    assert (std[1:52] > 0).all()


def test_normalize_roundtrip(loader):
    mean, std = normalization.get_mean_std_necksub(loader.train)
    batch = next(iter(loader.dev))
    pose = batch['pose/data']
    norm = normalization.normalize_pose(pose, mean, std)
    # normalized neck is exactly 0
    assert np.abs(norm[..., 0]).max() == 0.0
    assert np.abs(norm[..., 52]).max() == 0.0
    # denormalize inverts standardization (not the neck offset)
    den = normalization.denormalize_pose(norm, mean, std)
    necksub = normalization.neck_subtract(pose)
    np.testing.assert_allclose(den, necksub, atol=1e-3)


def test_mean_std_plain(loader):
    mean, std = normalization.get_mean_std(loader.train)
    assert (std > 0).all()


# ---------------------------------------------------------------------------
# hdf5 utils
# ---------------------------------------------------------------------------

def test_h5_roundtrip(tmp_path):
    fp = tmp_path / 'x.h5'
    hdf5_io.append(fp, 'a/b', np.arange(10.0))
    assert hdf5_io.is_dataset_in_file(fp, 'a/b')
    arr = hdf5_io.load_array(fp, 'a/b')
    assert arr.dtype == np.float32
    np.testing.assert_array_equal(arr, np.arange(10, dtype=np.float32))
    lines = hdf5_io.tree(fp)
    assert any('a/b' in ln for ln in lines)


def test_restore_interval_shape(tmp_path):
    fp = tmp_path / 'p.h5'
    data = np.arange(3 * 2 * 52, dtype=np.float64).reshape(3, 2, 52)
    hdf5_io.append(fp, 'pose/data', data)
    hdf5_io.restore_interval_shape(fp)
    out = hdf5_io.load_array(fp, 'pose/data', np.float64)
    assert out.shape == (3, 104)
    np.testing.assert_array_equal(out, data.reshape(3, 104))


def test_correlated_fixture(tmp_path):
    from a2m.data import hdf5_io, make_synthetic_pats
    root = make_synthetic_pats(tmp_path / 'corr', speakers=('oliver',),
                               intervals_per_speaker=1, duration_s=10.0,
                               correlated=True)
    pose = hdf5_io.load_array(hdf5_io.interval_path(root, 'oliver', '100001'),
                              'pose/data')
    mel = hdf5_io.load_array(hdf5_io.interval_path(root, 'oliver', '100001'),
                             'audio/log_mel_512')
    motion = np.abs(np.diff(pose, axis=0)).mean(1)
    energy = mel.mean(1)
    e15 = np.interp(np.linspace(0, len(energy) - 1, len(motion)),
                    np.arange(len(energy)), energy)
    assert np.corrcoef(motion, e15)[0, 1] > 0.8  # learnable mapping


def test_restore_all_intervals(tmp_path):
    from a2m.data import hdf5_io
    for iid in ('1', '2'):
        fp = hdf5_io.interval_path(tmp_path, 'sp', iid)
        hdf5_io.append(fp, 'pose/data',
                       np.arange(3 * 2 * 52, dtype=np.float64).reshape(3, 2, 52))
    n = hdf5_io.restore_all_intervals(tmp_path, 'sp')
    assert n == 2
    out = hdf5_io.load_array(hdf5_io.interval_path(tmp_path, 'sp', '1'),
                             'pose/data', np.float64)
    assert out.shape == (3, 104)
    # idempotent
    assert hdf5_io.restore_all_intervals(tmp_path, 'sp') == 0


def test_multihost_balanced_equal_batches(pats_root):
    """VERDICT r3 item 3: per-host batch counts are EQUAL for every split
    (balanced interval assignment + truncate-to-global-min), so hosts in a
    real multi-process run execute the same number of collective-bearing
    steps per epoch."""
    kw = dict(path2data=pats_root, speaker=['oliver', 'noah'],
              modalities=['pose/data', 'audio/log_mel_512'],
              fs_new=[15, 15], batch_size=4, window_hop=5)
    hosts = [DataLoader(**kw, process_index=i, process_count=2)
             for i in range(2)]
    for split in ('train', 'dev', 'test'):
        lens = [len(getattr(h, split)) for h in hosts]
        assert lens[0] == lens[1], (split, lens)
        assert lens[0] >= 1
        # iteration honors the cap exactly
        counts = [sum(1 for _ in getattr(h, split)) for h in hosts]
        assert counts == lens
    # metadata-only window counts agree with the loaded datasets
    h0 = hosts[0]
    from pathlib import Path
    for ds in h0.datasets['train'].datasets:
        iid = Path(ds.path2h5).stem
        assert h0._interval_n_windows(iid) == len(ds)
    # quantile sampling is data-dependent per host -> loud failure
    import pytest
    with pytest.raises(ValueError, match='quantile'):
        DataLoader(**kw, process_index=0, process_count=2,
                   quantile_sample=0.5)


def test_lazy_intervals_equal_output(pats_root):
    """DataLoader(lazy_intervals=True) yields byte-identical batches to the
    eager loader (VERDICT r4 item 7: bounded-RAM mode), with no interval
    payloads resident at startup."""
    from a2m.data.dataset import _LAZY_H5

    kw = dict(path2data=pats_root, speaker=['oliver', 'noah'],
              modalities=['pose/data', 'audio/log_mel_512'],
              fs_new=[15, 15], batch_size=8, window_hop=20, shuffle=False)
    eager = DataLoader(**kw)
    _LAZY_H5.clear()
    lazy = DataLoader(**kw, lazy_intervals=True)
    for d in lazy.train.dataset.datasets:
        assert d.data == [] and d.lazy        # nothing resident at startup
    for split in ('train', 'dev', 'test'):
        be = list(getattr(eager, split))
        bl = list(getattr(lazy, split))
        assert len(be) == len(bl) >= 1
        for e, l in zip(be, bl):
            assert set(e) == set(l)
            for k in e:
                if isinstance(e[k], np.ndarray):
                    np.testing.assert_array_equal(e[k], l[k])
    assert _LAZY_H5.hits + _LAZY_H5.misses > 0
