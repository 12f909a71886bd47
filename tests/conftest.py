# Test harness: force an 8-device virtual CPU mesh so all sharding /
# collective paths are exercised without TPU hardware.
#
# Note: the environment preloads jax with a TPU platform plugin before
# conftest runs, so plain env vars are too late — use jax.config directly.
import os

os.environ['JAX_PLATFORMS'] = 'cpu'
flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()

import jax

jax.config.update('jax_platforms', 'cpu')

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(7)
