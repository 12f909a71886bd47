# Smoke-test the runnable training drivers end to end (synthetic batches,
# a handful of steps, checkpoint + resume through the generic loop).
import os

import numpy as np
import pytest

import jax

from ctrlhair_tpu.training.loop import run_training, MetricsWriter


def test_run_predictor_synthetic(tmp_path, monkeypatch):
    from ctrlhair_tpu.training import run_predictor
    state = run_predictor.main([
        '--which', 'rgb', '--synthetic', '--steps', '4',
        '--out-dir', str(tmp_path / 'pred')])
    assert int(state.step) == 4
    assert os.path.exists(tmp_path / 'pred' / 'checkpoints')


def test_run_color_texture_synthetic(tmp_path):
    from ctrlhair_tpu.training import run_color_texture
    state = run_color_texture.main([
        '--synthetic', '--steps', '2', '--batch-size', '8',
        '--out-dir', str(tmp_path / 'ct')])
    assert int(state.step) == 2


def test_loop_resume(tmp_path):
    import jax.numpy as jnp
    import flax.struct

    @flax.struct.dataclass
    class S:
        step: jnp.ndarray
        val: jnp.ndarray

    def step_fn(state, batch, rng):
        return S(step=state.step + 1, val=state.val + batch), \
            {'total': state.val}

    ck = str(tmp_path / 'ck')
    s0 = S(step=jnp.zeros((), jnp.int32), val=jnp.zeros(()))
    s1, _ = run_training(s0, step_fn, lambda i: jnp.ones(()), 5,
                         rng=jax.random.PRNGKey(0), ckpt_dir=ck,
                         model_save_step=2, sample_step=10 ** 9,
                         verbose=False)
    assert int(s1.step) == 5
    # resume: restored from the step-4 checkpoint, continues to 8.  The
    # passed-in state is POISONED so a silent restart-from-scratch (resume
    # not loading) is distinguishable: restored val is 5 (+3 more steps),
    # a restart would end at -100 + 8.
    poisoned = S(step=jnp.zeros((), jnp.int32), val=jnp.full((), -100.0))
    s2, _ = run_training(poisoned, step_fn, lambda i: jnp.ones(()), 8,
                         rng=jax.random.PRNGKey(0), ckpt_dir=ck,
                         model_save_step=100, sample_step=10 ** 9,
                         verbose=False)
    assert int(s2.step) == 8
    assert float(s2.val) == 8.0  # 5 restored + 3 continued steps


def test_metrics_writer_fallback(tmp_path):
    w = MetricsWriter(str(tmp_path / 'tb'))
    w.scalars('t', {'a': 1.0, 'b': np.float32(2.0)}, 0)
    w.close()


def test_direction_finder_roundtrip(tmp_path):
    from ctrlhair_tpu.pipeline.direction_finder import (
        load_directions, random_orthogonal_direction, save_direction)
    rng = np.random.default_rng(0)
    d0 = random_orthogonal_direction(8, [], rng)
    d1 = random_orthogonal_direction(8, [d0], rng)
    assert abs(np.dot(d0, d1)) < 1e-6
    assert abs(np.linalg.norm(d1) - 1) < 1e-6
    save_direction(str(tmp_path / 'dirs'), 0, d0)
    save_direction(str(tmp_path / 'dirs'), 1, d1)
    loaded = load_directions(str(tmp_path / 'dirs'))
    np.testing.assert_allclose(loaded[0], d0)
    np.testing.assert_allclose(loaded[1], d1)


def test_native_checkpoints_load_into_pipeline(tmp_path):
    """Train -> deploy round trip with OUR OWN checkpoints: run-driver
    output loads into the editing pipeline's parameter tree via
    convert.load.load_native_params (the native analog of the reference's
    model_trained/ sweep, ref: hair_editor.py:45-119)."""
    import jax.numpy as jnp

    from ctrlhair_tpu.config import PipelineConfig
    from ctrlhair_tpu.convert.load import load_native_params
    from ctrlhair_tpu.models.color_texture import (CTDiscriminator,
                                                   Predictor, make_generator)
    from ctrlhair_tpu.training import run_color_texture, run_predictor

    run_color_texture.main([
        '--synthetic', '--steps', '2', '--batch-size', '8',
        '--out-dir', str(tmp_path / 'ct')])
    run_predictor.main([
        '--which', 'rgb', '--synthetic', '--steps', '2',
        '--out-dir', str(tmp_path / 'pred')])

    cfg = PipelineConfig()
    gen = make_generator(cfg.color_texture)
    dis = CTDiscriminator(cfg.color_texture)
    pred = Predictor(cfg.rgb_predictor)
    k = jax.random.PRNGKey(0)
    data = {'noise': jnp.zeros((1, cfg.color_texture.noise_dim)),
            'noise_curliness': jnp.zeros((1, 1)),
            'rgb_mean': jnp.zeros((1, 3)), 'pca_std': jnp.zeros((1, 1))}
    code = {'code': jnp.zeros((1, cfg.sean.style_dim))}
    init_params = {'ct_gen': gen.init(k, data), 'ct_dis': dis.init(k, code),
                   'rgb_pred': pred.init(k, code)}

    class _Stub:
        pass
    stub = _Stub()
    stub.cfg = cfg
    stub.params = dict(init_params)

    load_native_params(stub, color_texture_dir=str(
        tmp_path / 'ct' / 'checkpoints'),
        rgb_predictor_dir=str(tmp_path / 'pred' / 'checkpoints'))

    for key in ('ct_gen', 'ct_dis', 'rgb_pred'):
        # structure identical to the pipeline-side init...
        assert (jax.tree_util.tree_structure(stub.params[key])
                == jax.tree_util.tree_structure(init_params[key])), key
        # ...and values actually trained (moved off the init)
        a = jax.tree_util.tree_leaves(stub.params[key])
        b = jax.tree_util.tree_leaves(init_params[key])
        assert any(not np.allclose(np.asarray(x), np.asarray(y))
                   for x, y in zip(a, b)), key

    # the loaded generator runs through the pipeline-side model def
    out = gen.apply(stub.params['ct_gen'], data)
    assert out['code'].shape == (1, cfg.sean.style_dim)


def test_run_sean_synthetic(tmp_path):
    from ctrlhair_tpu.training import run_sean
    # tiny width (--ngf) — the full-width G+D compile alone took ~6 min on
    # this 1-core host; --split-step also exercises the two-program path
    state = run_sean.main([
        '--synthetic', '--steps', '2', '--batch-size', '2', '--no-vgg',
        '--crop-size', '32', '--ngf', '8', '--split-step',
        '--out-dir', str(tmp_path / 'sean')])
    assert int(state.step) == 2
    assert os.path.exists(tmp_path / 'sean' / 'checkpoints')


def test_run_bisenet_synthetic(tmp_path):
    from ctrlhair_tpu.training import run_bisenet
    state = run_bisenet.main([
        '--synthetic', '--steps', '2', '--batch-size', '2',
        '--input-size', '32', '--out-dir', str(tmp_path / 'bn')])
    assert int(state.step) == 2
    assert os.path.exists(tmp_path / 'bn' / 'checkpoints')
