# Validation-canvas rendering on the tiny pipeline.
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ctrlhair_tpu.training import validation


@pytest.fixture(scope='module')
def editor_and_analysis(tiny_editor):
    editor = tiny_editor
    img = np.random.default_rng(0).integers(0, 255, (64, 64, 3),
                                            dtype=np.uint8)
    res = editor.analyze_image(img)
    return editor, res, img


def _base_data(res):
    return {'noise': jnp.zeros((1, 8)),
            'noise_curliness': jnp.zeros((1, 1)),
            'rgb_mean': jnp.full((1, 3), 128.0),
            'pca_std': jnp.full((1, 1), 50.0)}


def test_ct_latent_sweep_canvas(editor_and_analysis, tmp_path):
    editor, res, _ = editor_and_analysis
    out = validation.ct_latent_sweep_canvas(
        editor, editor.params['ct_gen'], res['sean_codes'], res['label'],
        _base_data(res), out_path=str(tmp_path / 'sweep.png'),
        values=(-1, 0, 1))
    assert out.ndim == 3 and out.shape[2] == 3
    assert (tmp_path / 'sweep.png').exists()


def test_ct_random_sample_canvas(editor_and_analysis):
    editor, res, _ = editor_and_analysis
    out = validation.ct_random_sample_canvas(
        editor, editor.params['ct_gen'], res['sean_codes'], res['label'],
        _base_data(res), jax.random.PRNGKey(0), n=3)
    assert out.ndim == 3


def test_shape_sweep_canvas(editor_and_analysis):
    editor, res, _ = editor_and_analysis
    out = validation.shape_sweep_canvas(
        editor, editor.params['shape'], res['latent'].face,
        res['latent'].shape, values=(-1, 0, 1), dims=(0, 1))
    assert out.ndim == 3


def test_transfer_matrix_canvas(editor_and_analysis):
    editor, _, img = editor_and_analysis
    rng = np.random.default_rng(1)
    imgs = [img, rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)]
    out = validation.transfer_matrix_canvas(editor, imgs)
    assert out.ndim == 3
