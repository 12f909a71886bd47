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


# fast-iteration subset: `pytest -m quick` (pure-op + geometry modules, no
# editor/trainer compiles)
_QUICK_MODULES = {
    'test_ops', 'test_blend', 'test_metrics', 'test_data', 'test_crop',
    'test_warp', 'test_landmarks', 'test_direction_finder', 'test_prep',
}


def pytest_collection_modifyitems(items):
    for item in items:
        if item.module.__name__ in _QUICK_MODULES:
            item.add_marker(pytest.mark.quick)


def tiny_pipeline_cfg():
    """The shared tiny PipelineConfig for CPU pipeline tests."""
    from ctrlhair_tpu.config import (
        BiSeNetConfig, ColorTextureConfig, PipelineConfig, SEANConfig,
        ShapeConfig)
    return PipelineConfig(
        sean=SEANConfig(crop_size=64, ngf=4, zencoder_ngf=4, style_dim=64),
        bisenet=BiSeNetConfig(input_size=128),
        color_texture=ColorTextureConfig(style_dim=64),
        shape=ShapeConfig(img_size=64, layer_num=5, max_channel=64,
                          hidden_in_channel=8),
        edit_size=64,
        poisson_iterations=60,
        compute_dtype='float32',
    )


@pytest.fixture(scope='session')
def tiny_editor():
    """ONE HairEditorTPU shared across every module that only READS params.

    Each HairEditorTPU re-jits its pipeline programs (jit caches are
    per-instance), so module-scoped editors recompiled the same tiny
    programs once per module — the dominant cold-suite cost on this 1-core
    host.  Tests that mutate params (checkpoint loading) must build their
    own instance.
    """
    from ctrlhair_tpu.pipeline.editor import HairEditorTPU
    return HairEditorTPU(tiny_pipeline_cfg())
