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

# Persistent compile cache for the test suite: the full suite is dominated
# by XLA:CPU compiles of tiny pipelines (round-1 wall time >10 min), and
# re-runs recompile everything.  CPU AOT artifacts are only unsafe across
# machines with different CPU features (can SIGILL), so key the cache dir
# by a CPU fingerprint — same-host re-runs hit, foreign caches never match.
import hashlib


def _cpu_cache_dir() -> str:
    try:
        with open('/proc/cpuinfo') as f:
            sig = next(line for line in f if line.startswith('flags'))
    except Exception:
        import platform
        sig = platform.platform()
    h = hashlib.sha1(sig.encode()).hexdigest()[:12]
    return f'/tmp/ctrlhair_xla_test_cache_{h}'


jax.config.update('jax_compilation_cache_dir', _cpu_cache_dir())
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(7)
