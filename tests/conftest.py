"""Test harness configuration.

Tests run hermetically on a virtual 8-device CPU mesh — the fake-backend
mechanism the reference lacks (SURVEY.md §4): GSPMD shardings are exercised
without TPU hardware, compiles are fast, and numerics are deterministic.
The env vars must be set before jax is imported anywhere.
"""

import os

# Force CPU even when the session pre-imports jax pinned to a TPU platform
# (a sitecustomize may import jax before conftest runs, making env vars
# alone too late — the jax.config update below is authoritative as long as
# no backend has been initialized yet).
os.environ['JAX_PLATFORMS'] = 'cpu'
flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

jax.config.update('jax_platforms', 'cpu')

# Persistent XLA compile cache: the suite's cost is dominated by CPU
# compiles of the full GAN train steps (~55 min across test_train/
# test_parallel, measured 2026-08); with the cache warm the same tests
# reload executables in seconds.  Keyed by HLO hash — stale hits are
# impossible; edits to any traced code recompile exactly what changed.
# (The 'prefer-no-scatter/gather machine feature' stderr warnings on cache
# load are XLA pseudo-features, not host instructions — harmless on the
# machine that wrote the cache.)
jax.config.update('jax_compilation_cache_dir',
                  os.environ.get('A2M_TEST_COMPILE_CACHE',
                                 '/tmp/a2m_jax_test_cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 2.0)

# NOTE: matmul precision is NOT globally raised here — that makes CPU conv
# compiles painfully slow.  Parity tests construct modules with an explicit
# precision=HIGHEST; everything else runs at the fast default.

HIGHEST = jax.lax.Precision.HIGHEST


@pytest.fixture
def rng():
    return np.random.default_rng(0)
