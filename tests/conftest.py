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

# NOTE: matmul precision is NOT globally raised here — that makes CPU conv
# compiles painfully slow.  Parity tests construct modules with an explicit
# precision=HIGHEST; everything else runs at the fast default.

HIGHEST = jax.lax.Precision.HIGHEST


@pytest.fixture
def rng():
    return np.random.default_rng(0)
