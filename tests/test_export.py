"""Serialized-inference artifact tests (a2m/export.py).

The artifact must be self-contained: weights/stats baked in, loadable with
jax.export.deserialize alone, numerically identical to the live model.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from a2m import export as aex
from a2m.config import GeneratorConfig
from a2m.models import Generator

TINY = GeneratorConfig(in_channels=16, out_channels=16, joint_feat_dim=8,
                       gat_heads=2)


@pytest.fixture(scope='module')
def gen_and_vars():
    g = Generator(TINY)
    key = jax.random.PRNGKey(0)
    v = jax.jit(g.init)({'params': key, 'dropout': key},
                        jnp.zeros((1, 64, 128), jnp.float32))
    return g, v


def test_pose_artifact_roundtrip_matches_live_model(gen_and_vars, rng,
                                                    tmp_path):
    g, v = gen_and_vars
    mean = rng.standard_normal(104).astype(np.float32)
    std = np.abs(rng.standard_normal(104)).astype(np.float32) + 0.5
    exported = aex.export_pose_fn(g, v, mean, std, batch_size=2)
    path = aex.save_artifact(exported, tmp_path / 'tiny.shlo')
    assert path.exists() and path.with_suffix('.shlo.meta').exists()

    fn = aex.load_artifact(path)
    feats = jnp.asarray(rng.standard_normal((2, 64, 128)), jnp.float32)
    got = np.asarray(fn(feats))
    live = np.asarray(g.apply(v, feats, train=False)) * std + mean
    np.testing.assert_allclose(got, live, atol=1e-5)


def test_audio_artifact_runs(gen_and_vars, tmp_path, rng):
    g, v = gen_and_vars
    exported = aex.export_audio_to_pose(g, v, np.zeros(104), np.ones(104),
                                        batch_size=1)
    fn = aex.load_artifact(aex.save_artifact(exported, tmp_path / 'a.shlo'))
    wave = jnp.asarray(rng.standard_normal((1, int(45600 * 4.3))) * 0.1,
                       jnp.float32)
    pose = np.asarray(fn(wave))
    assert pose.shape == (1, 64, 104)
    assert np.isfinite(pose).all()


def test_cli_builds_artifact(tmp_path, rng):
    """python -m a2m.export without a checkpoint (fresh init, identity
    stats) writes + checks an artifact."""
    from unittest import mock
    from a2m.config import Config
    tiny_cfg = Config(generator=TINY)
    with mock.patch.object(aex, 'Config', lambda: tiny_cfg):
        out = aex.main(['--out', str(tmp_path / 'cli.shlo'), '--check'])
    assert (tmp_path / 'cli.shlo').exists()
    assert out['bytes'] > 1000
