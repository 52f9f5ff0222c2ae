"""Test harness configuration.

Tests run hermetically on a virtual 8-device CPU mesh — the fake-backend
mechanism the reference lacks (SURVEY.md §4): GSPMD shardings are exercised
without TPU hardware, compiles are fast, and numerics are deterministic.
The env vars must be set before jax is imported anywhere.
"""

import os

os.environ.setdefault('JAX_PLATFORMS', 'cpu')
flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
