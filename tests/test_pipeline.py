# End-to-end pipeline tests on a tiny configuration: the full Backend API
# surface exercised on synthetic images (CPU).
import numpy as np
import pytest

import jax.numpy as jnp

from ctrlhair_tpu.constants import HAIR_IDX
from ctrlhair_tpu.pipeline.backend import Backend
from ctrlhair_tpu.pipeline.latent import Latent, stack_latents


from conftest import tiny_pipeline_cfg as tiny_cfg  # shared tiny config


@pytest.fixture(scope='module')
def backend(tiny_editor):
    return Backend(maximum_value_fe=2.5, blending=False,
                   cfg=tiny_editor.cfg, editor=tiny_editor)


@pytest.fixture(scope='module')
def loaded(backend):
    rng = np.random.default_rng(3)
    img = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
    target = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
    backend.set_input_img(img)
    backend.set_target_img(target)
    return backend


def test_set_input_populates_state(loaded):
    be = loaded
    assert be.input_img.shape == (64, 64, 3)
    assert be.input_mask.shape == (64, 64)
    assert be.cur_mask.shape == (64, 64)
    assert be.input_sean_code.shape == (1, 19, 64)
    assert isinstance(be.cur_latent, Latent)
    assert be.cur_latent.shape.shape == (1, 16)
    assert be.cur_latent.face.shape == (1, 1024)
    assert be.cur_latent.texture.shape == (1, 8)


def test_output_shapes_and_determinism(loaded):
    out1 = loaded.output()
    out2 = loaded.output()
    assert out1.shape == (64, 64, 3) and out1.dtype == np.uint8
    np.testing.assert_array_equal(out1, out2)


def test_change_color_moves_latent(loaded):
    be = loaded
    before = np.asarray(be.cur_latent.hsv).copy()
    be.change_color(1.5, 0)
    after = np.asarray(be.cur_latent.hsv)
    # hue channel set from the CDF table (an extreme slider value maps far
    # from any plausible current hue); other channels untouched
    assert after[0, 0] != before[0, 0]
    np.testing.assert_array_equal(after[0, 1:], before[0, 1:])
    be.change_color(1.0, 3)
    v = float(be.cur_latent.pca_std[0, 0])
    # (1.0+2.5)/2/2.5*100+20 = 90
    assert abs(v - 90.0) < 1e-4


def test_color_be2fe_roundtrip(loaded):
    be = loaded
    be.change_color(0.5, 1)
    c0, c1, c2, var = be.get_color_be2fe()
    assert abs(c1 - 0.5) < 0.15  # CDF quantisation tolerance
    be.change_color(-1.0, 3)
    _, _, _, var = be.get_color_be2fe()
    assert abs(var - (-1.0)) < 1e-3


def test_change_shape_refreshes_mask(loaded):
    be = loaded
    # the tiny random VAE may decode an identical label map for a small
    # latent move, so assert the refresh MECHANISM: a new decode output
    # must back cur_mask after the tick
    dev_before = be._cur_mask_dev
    be.change_shape(2.0, 0)
    assert be._cur_mask_dev is not None and be._cur_mask_dev is not dev_before, \
        'change_shape must enqueue a mask refresh'
    assert be.cur_mask.shape == (64, 64)
    proj = be.get_shape_be2fe()
    assert abs(proj[0] - 2.0) < 1e-3


def test_change_texture_and_be2fe(loaded):
    be = loaded
    be.change_texture(1.25, 1)
    proj = be.get_texture_be2fe()
    assert abs(proj[1] - 1.25) < 1e-3


def test_curliness(loaded):
    be = loaded
    be.change_curliness(0.75)
    assert abs(be.get_curliness_be2fe() - 0.75) < 1e-6


def test_transfer_color_texture(loaded):
    be = loaded
    be.transfer_latent_representation('color')
    np.testing.assert_allclose(np.asarray(be.cur_latent.hsv),
                               np.asarray(be.target_latent.hsv))
    be.transfer_latent_representation('texture')
    np.testing.assert_allclose(np.asarray(be.cur_latent.texture),
                               np.asarray(be.target_latent.texture))
    # texture transfer carries curliness (ref ui/backend.py:301-302)
    np.testing.assert_allclose(np.asarray(be.cur_latent.curliness),
                               np.asarray(be.target_latent.curliness))


def test_transfer_shape_with_warp(loaded):
    be = loaded
    be.transfer_latent_representation('shape')
    np.testing.assert_allclose(np.asarray(be.cur_latent.shape),
                               np.asarray(be.target_latent.shape))
    assert be.warp_target.shape == (64, 64)


def test_interpolate(loaded):
    be = loaded
    mid = be.interpolate(be.cur_latent, be.target_latent, 0.5)
    assert isinstance(mid, Latent)
    out = be.output(target_latent=mid)
    assert out.shape == (64, 64, 3)


def test_interpolate_each_att(loaded):
    be = loaded
    for att in ['shape', 'texture', 'color', 'curliness']:
        mid = be.interpolate_each_att(be.cur_latent, be.target_latent,
                                      0.3, att)
        assert isinstance(mid, Latent)


def test_random_sampling(loaded):
    be = loaded
    t0 = np.asarray(be.cur_latent.texture).copy()
    be.get_random_texture()
    assert not np.allclose(t0, np.asarray(be.cur_latent.texture))
    be.get_random_shape()
    be.get_random_curliness()


def test_directly_change_hair_mask(loaded):
    be = loaded
    hair_mask = np.zeros((64, 64), np.int32)
    hair_mask[5:25, 10:50] = HAIR_IDX
    be.directly_change_hair_mask(hair_mask)
    got = be.cur_mask == HAIR_IDX
    # the painted region should be dominated by hair in the merged mask
    assert got[5:25, 10:50].mean() > 0.9


def test_output_batch_and_sweeps(loaded):
    be = loaded
    out = be.interpolation_sweep(be.cur_latent, be.target_latent,
                                 [0.0, 0.5, 1.0])
    assert out.shape == (3, 64, 64, 3) and out.dtype == np.uint8
    # the batched-alpha sweep equals a per-alpha host loop
    lats = stack_latents([be.interpolate(be.cur_latent, be.target_latent,
                                         a) for a in (0.0, 0.5, 1.0)])
    np.testing.assert_array_equal(out, be.output_batch(lats))
    rnd = be.random_texture_sweep(4)
    assert rnd.shape == (4, 64, 64, 3)
    # batch render of a single latent equals single output
    single = be.output()
    batch1 = be.output_batch(be.cur_latent)
    np.testing.assert_array_equal(single, batch1[0])


def test_blending_path(tiny_editor):
    be = Backend(maximum_value_fe=2.5, blending=True,
                 cfg=tiny_editor.cfg, editor=tiny_editor)
    rng = np.random.default_rng(5)
    img = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
    be.set_input_img(img)
    out = be.output()
    assert out.shape == (64, 64, 3) and out.dtype == np.uint8

    # the fused decode+render+blend tick (output_refresh) must equal the
    # unfused decode_mask -> edit_render -> blend chain exactly
    lat = be.cur_latent.replace(shape=be.cur_latent.shape + 0.3)
    fused = be.output(target_latent=lat)
    mask_fused = be.cur_mask.copy()
    mask = be.editor.decode_mask(be.editor.params, lat.shape, lat.face)
    img_r = be.editor.edit_render(be.editor.params, be.input_sean_code,
                                  mask, lat)
    unfused = be.editor.blend(
        be.editor.params, jnp.asarray(be.input_img)[None], img_r,
        jnp.asarray(be.input_mask)[None], mask)
    np.testing.assert_array_equal(fused, np.asarray(unfused[0]))
    np.testing.assert_array_equal(mask_fused, np.asarray(mask[0]))

    # shape-slider tick: async mask refresh + no-target output stays
    # consistent with an eager refresh
    be.change_shape(0.7, 0)
    out2 = be.output()
    m_async = be.cur_mask.copy()
    m_eager, _ = be.refresh_cur_mask()
    np.testing.assert_array_equal(m_async, m_eager)
    assert out2.shape == (64, 64, 3)


def test_param_shapes_matches_init(backend):
    """param_shapes (jax.eval_shape, no compile) must mirror the real
    parameter tree exactly — it is the AOT-lowering entry point."""
    import jax
    ed = backend.editor
    shapes = ed.param_shapes(0)
    assert (jax.tree_util.tree_structure(shapes)
            == jax.tree_util.tree_structure(ed.params))
    for (pa, s), leaf in zip(
            jax.tree_util.tree_flatten_with_path(shapes)[0],
            jax.tree_util.tree_leaves(ed.params)):
        assert s.shape == leaf.shape and s.dtype == leaf.dtype, pa


def test_curated_direction_padding(tmp_path, monkeypatch):
    """A partially-curated direction dir must not shrink the slider set
    (the UI indexes 4 shape / 2 texture sliders unconditionally)."""
    from ctrlhair_tpu.pipeline.direction_finder import save_direction
    shape_dir = tmp_path / 'model_trained' / 'shape_dir_used'
    save_direction(str(shape_dir), 0, np.arange(16, dtype=np.float32))
    monkeypatch.chdir(tmp_path)
    be = Backend(maximum_value_fe=2.5, blending=False, cfg=tiny_cfg())
    assert len(be.shape_dirs) == 4
    np.testing.assert_array_equal(np.asarray(be.shape_dirs[0]),
                                  np.arange(16, dtype=np.float32))
    assert len(be.texture_dirs) == 2


def test_parse_signature_is_canonical(tiny_editor, monkeypatch):
    """analyze_image must feed parse ONE canonical signature regardless of
    the input image size, so a single warm serialized executable covers
    every source (VERDICT r3 item 6; ref fixed 512 parse input:
    my_parsing_util.py:34)."""
    from ctrlhair_tpu.utils import aot_cache

    recorded = []
    orig = tiny_editor.parse

    def recording_parse(params, img):
        recorded.append(aot_cache._signature((params, img)))
        return orig(params, img)

    monkeypatch.setattr(tiny_editor, 'parse', recording_parse)
    rng = np.random.default_rng(0)
    for size in (48, 64, 128, 200):
        img = rng.integers(0, 255, (size, size, 3), dtype=np.uint8)
        tiny_editor.analyze_image(img)
    assert len(set(recorded)) == 1, recorded
    # and that signature is the parser-resolution uint8 batch-1 input —
    # exactly what scripts/seed_cache.py serializes
    psz = tiny_editor.cfg.bisenet.input_size
    expect = aot_cache._signature(
        (tiny_editor.params, jnp.zeros((1, psz, psz, 3), jnp.uint8)))
    assert recorded[0] == expect
