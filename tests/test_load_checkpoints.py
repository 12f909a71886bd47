# convert/load: assemble editor params from reference-layout torch
# checkpoints (fake state dicts with the real key layouts, saved via torch).
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ctrlhair_tpu.pipeline.editor import HairEditorTPU
from test_convert import _fake_ct_gen_sd, _fake_mlp_sd, \
    _fake_shape_gen_sd
from test_convert_sean import _fake_sean_sd
from test_pipeline import tiny_cfg


def test_load_reference_params(tmp_path):
    torch = pytest.importorskip('torch')
    from ctrlhair_tpu.convert.load import load_reference_params

    cfg = tiny_cfg()
    editor = HairEditorTPU(cfg)
    rng = np.random.default_rng(0)

    sean_path = str(tmp_path / 'latest_net_G.pth')
    torch.save({k: torch.tensor(v)
                for k, v in _fake_sean_sd(rng, cfg.sean).items()}, sean_path)

    ct_path = str(tmp_path / 'ct.ckpt')
    # 1 + noise + pca_std(dangling) + curliness (ref: model.py:98-105)
    out_dim = (1 + cfg.color_texture.noise_dim + 1
               + cfg.color_texture.curliness_dim)
    dis_sd = _fake_mlp_sd(rng, 'net', [cfg.color_texture.style_dim]
                          + [cfg.color_texture.d_hidden_dim] * 4 + [out_dim])
    # DDP-wrapped generator, plain discriminator (exercises prefix strip)
    gen_sd = {'module.' + k: torch.tensor(v) for k, v in
              _fake_ct_gen_sd(rng, cfg.color_texture).items()}
    torch.save({'Model_G': gen_sd,
                'Model_D': {k: torch.tensor(v) for k, v in dis_sd.items()}},
               ct_path)

    shape_path = str(tmp_path / 'shape.ckpt')
    torch.save({'Model_G': {k: torch.tensor(v) for k, v in
                            _fake_shape_gen_sd(rng, cfg.shape).items()}},
               shape_path)

    before = np.asarray(
        editor.params['ct_gen']['params']['main_in']['kernel']).copy()
    load_reference_params(editor, sean_path=sean_path,
                          color_texture_ckpt=ct_path,
                          shape_ckpt=shape_path)
    after = np.asarray(
        editor.params['ct_gen']['params']['main_in']['kernel'])
    assert not np.allclose(before, after)
    # DDP prefix-stripped generator weights landed exactly
    np.testing.assert_allclose(
        after, np.asarray(torch.load(ct_path, weights_only=False)
                          ['Model_G']['module.main_layer_in.weight']).T)

    # the converted editor still runs the full edit pipeline
    img = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
    res = editor.analyze_image(img)
    out = editor.edit_render(editor.params, res['sean_codes'],
                             res['label'], res['latent'])
    assert out.shape == (1, 64, 64, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_load_reference_params_partial(tmp_path):
    """Missing checkpoint files leave the corresponding params untouched."""
    from ctrlhair_tpu.convert.load import load_reference_params
    editor = HairEditorTPU(tiny_cfg())
    before = jax.tree_util.tree_map(np.asarray, editor.params['sean'])
    load_reference_params(editor, sean_path=str(tmp_path / 'missing.pth'))
    after = jax.tree_util.tree_map(np.asarray, editor.params['sean'])
    for a, b in zip(jax.tree_util.tree_leaves(before),
                    jax.tree_util.tree_leaves(after)):
        np.testing.assert_array_equal(a, b)


@pytest.mark.quick
def test_load_native_reduced_deployment_checkpoints(tmp_path):
    """The soak's reduced deployment checkpoints ({'gen','dis'} params /
    editor-shaped variables dicts; scripts/train_soak.py) load through
    load_native_params just like full train-state checkpoints."""
    from ctrlhair_tpu.convert.load import load_native_params
    from ctrlhair_tpu.training.color_texture_trainer import (
        ColorTextureTrainer)
    from ctrlhair_tpu.training.shape_trainer import ShapeTrainer
    from ctrlhair_tpu.utils.checkpoint import save_checkpoint

    editor = HairEditorTPU(tiny_cfg())
    rng = jax.random.PRNGKey(7)

    ct = ColorTextureTrainer(editor.cfg.color_texture)
    ct_state, _ = ct.init_state(rng)
    save_checkpoint(str(tmp_path / 'color_texture' / 'checkpoints'),
                    jax.tree_util.tree_map(
                        np.asarray, {'gen': ct_state.gen.params,
                                     'dis': ct_state.dis.params}), 123)

    sh = ShapeTrainer(editor.cfg.shape)
    sh_state = sh.init_state(rng)
    save_checkpoint(str(tmp_path / 'shape' / 'checkpoints'),
                    jax.tree_util.tree_map(
                        np.asarray, {'gen': sh_state.gen.params}), 123)

    # editor-shaped bisenet deployment dict (inference keys only)
    save_checkpoint(str(tmp_path / 'bisenet' / 'checkpoints'),
                    jax.tree_util.tree_map(
                        np.asarray, editor.params['bisenet']), 123)

    load_native_params(
        editor,
        color_texture_dir=str(tmp_path / 'color_texture' / 'checkpoints'),
        shape_dir=str(tmp_path / 'shape' / 'checkpoints'),
        bisenet_dir=str(tmp_path / 'bisenet' / 'checkpoints'))

    got = jax.tree_util.tree_leaves(editor.params['ct_gen'])
    want = jax.tree_util.tree_leaves(ct_state.gen.params)
    for a, b in zip(got, want):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    got = jax.tree_util.tree_leaves(editor.params['shape'])
    want = jax.tree_util.tree_leaves(sh_state.gen.params)
    for a, b in zip(got, want):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.quick
def test_bf16_deployment_checkpoints_load_as_f32(tmp_path):
    """Stage-G deployment checkpoints ship bf16 for size; loading casts
    back to f32 so the editor's program signatures (and warm executables)
    stay f32.  Also covers the SEAN reduced deployment contract
    (generator variables only)."""
    from ctrlhair_tpu.convert.load import load_native_params
    from ctrlhair_tpu.utils.checkpoint import save_checkpoint

    editor = HairEditorTPU(tiny_cfg())
    rng = np.random.default_rng(0)

    def bf16(tree):
        return jax.tree_util.tree_map(
            lambda x: np.asarray(x, np.float32).astype(jnp.bfloat16)
            if np.issubdtype(np.asarray(x).dtype, np.floating) else x, tree)

    sean_vars = jax.tree_util.tree_map(
        lambda x: np.asarray(rng.standard_normal(x.shape), np.float32)
        if np.issubdtype(np.asarray(x).dtype, np.floating) else x,
        jax.tree_util.tree_map(np.asarray, editor.params['sean']))
    save_checkpoint(str(tmp_path / 'sean' / 'checkpoints'),
                    bf16(sean_vars), 7)
    load_native_params(editor,
                       sean_dir=str(tmp_path / 'sean' / 'checkpoints'))
    got = jax.tree_util.tree_leaves(editor.params['sean'])
    want = jax.tree_util.tree_leaves(bf16(sean_vars))
    for a, b in zip(got, want):
        a = np.asarray(a)
        if a.dtype == np.float32 and np.asarray(
                b, np.float32).dtype == np.float32:
            assert a.dtype == np.float32
        np.testing.assert_allclose(a.astype(np.float32),
                                   np.asarray(b).astype(np.float32))


@pytest.mark.quick
def test_backend_loads_trained_root(tmp_path):
    """Backend(trained_root=...) boots from shipped family checkpoints —
    the deployment path a fresh clone takes (ref: hair_editor.py:45-119)."""
    import pickle

    from ctrlhair_tpu.pipeline.backend import Backend
    from ctrlhair_tpu.training.shape_trainer import ShapeTrainer
    from ctrlhair_tpu.utils.checkpoint import save_checkpoint

    cfg = tiny_cfg()
    editor = HairEditorTPU(cfg)
    sh = ShapeTrainer(cfg.shape)
    sh_state = sh.init_state(jax.random.PRNGKey(3))
    save_checkpoint(str(tmp_path / 'shape' / 'checkpoints'),
                    jax.tree_util.tree_map(
                        np.asarray, {'gen': sh_state.gen.params}), 11)
    # shipped HSV slider table is picked up too
    table = np.sort(np.random.default_rng(0).uniform(
        0, 255, (50, 3)), axis=0).astype(np.float32)
    with open(tmp_path / 'hsv_stat_dict_ordered.pkl', 'wb') as f:
        pickle.dump(table, f)

    be = Backend(blending=False, cfg=cfg, editor=editor,
                 trained_root=str(tmp_path))
    got = jax.tree_util.tree_leaves(be.editor.params['shape'])
    want = jax.tree_util.tree_leaves(sh_state.gen.params)
    for a, b in zip(got, want):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert be.dist_translation.table is not None
