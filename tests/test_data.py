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
