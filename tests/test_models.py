# Model-level smoke + invariant tests on tiny configs (CPU-friendly shapes).
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ctrlhair_tpu.config import (
    ColorTextureConfig, SEANConfig, ShapeConfig, BiSeNetConfig,
    rgb_predictor_config, curliness_predictor_config)
from ctrlhair_tpu.models.sean import SEAN, region_style_pool
from ctrlhair_tpu.models.bisenet import BiSeNet
from ctrlhair_tpu.models.shape import (
    ShapeGenerator, ShapeDiscriminator, ShapeDiscriminatorNoise,
    fourier_pos_encoding)
from ctrlhair_tpu.models.color_texture import (
    EigenGenerator, CTDiscriminator, CTDiscriminatorNoise, Predictor)
from ctrlhair_tpu.utils.masks import label_to_one_hot, split_hair_face

TINY_SEAN = SEANConfig(crop_size=64, ngf=4, zencoder_ngf=4, style_dim=64)
TINY_SHAPE = ShapeConfig(img_size=64, layer_num=5, max_channel=64,
                         hidden_in_channel=8)


def _label(rng, n, s):
    return jnp.asarray(rng.integers(0, 19, (n, s, s)).astype(np.int32))


def test_region_style_pool_matches_loop(rng):
    codes = jnp.asarray(rng.standard_normal((2, 8, 8, 16)).astype(np.float32))
    label = _label(rng, 2, 8)
    seg = label_to_one_hot(label, 19)
    pooled = np.asarray(region_style_pool(codes, seg))
    # dense reference loop
    cn = np.asarray(codes)
    ln = np.asarray(label)
    for i in range(2):
        for j in range(19):
            m = ln[i] == j
            if m.sum() > 0:
                np.testing.assert_allclose(
                    pooled[i, j], cn[i][m].mean(0), rtol=1e-5, atol=1e-5)
            else:
                assert np.all(pooled[i, j] == 0)


def test_sean_encode_decode_shapes(rng):
    model = SEAN(TINY_SEAN)
    img = jnp.asarray(rng.standard_normal((1, 64, 64, 3)).astype(np.float32))
    label = _label(rng, 1, 64)
    params = model.init(jax.random.PRNGKey(0), img, label)
    codes = model.apply(params, img, label, method=model.encode)
    assert codes.shape == (1, 19, 64)
    out = model.apply(params, label, codes, method=model.decode)
    assert out.shape == (1, 64, 64, 3)
    assert np.abs(np.asarray(out)).max() <= 1.0
    # decode is deterministic (no noise at inference)
    out2 = model.apply(params, label, codes, method=model.decode)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2))


def test_sean_folded_style_conv_equivalence(rng):
    """The folded conv_gamma/conv_beta path must equal the dense conv path
    bit-tightly (it is an exact linear-algebra identity)."""
    import dataclasses
    cfg_dense = dataclasses.replace(TINY_SEAN, fold_style_convs=False)
    cfg_fold = dataclasses.replace(TINY_SEAN, fold_style_convs=True)
    dense = SEAN(cfg_dense)
    folded = SEAN(cfg_fold)
    img = jnp.asarray(rng.standard_normal((1, 64, 64, 3)).astype(np.float32))
    label = _label(rng, 1, 64)
    params = dense.init(jax.random.PRNGKey(0), img, label)
    codes = jnp.asarray(rng.standard_normal((1, 19, 64)).astype(np.float32))
    out_d = dense.apply(params, label, codes, method=dense.decode)
    out_f = folded.apply(params, label, codes, method=folded.decode)
    np.testing.assert_allclose(np.asarray(out_d), np.asarray(out_f),
                               rtol=1e-3, atol=2e-3)


def test_sean_decode_jit_consistency(rng):
    model = SEAN(TINY_SEAN)
    img = jnp.asarray(rng.standard_normal((1, 64, 64, 3)).astype(np.float32))
    label = _label(rng, 1, 64)
    params = model.init(jax.random.PRNGKey(0), img, label)
    f = jax.jit(lambda p, l, c: model.apply(p, l, c, method=model.decode))
    codes = model.apply(params, img, label, method=model.encode)
    eager = model.apply(params, label, codes, method=model.decode)
    jitted = f(params, label, codes)
    # jit fuses/reassociates float ops; bound the drift, don't expect equality
    np.testing.assert_allclose(np.asarray(eager), np.asarray(jitted),
                               rtol=1e-2, atol=2e-3)


def test_bisenet_shapes(rng):
    cfg = BiSeNetConfig(input_size=64)
    model = BiSeNet(cfg)
    x = jnp.asarray(rng.standard_normal((1, 64, 64, 3)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out.shape == (1, 64, 64, 19)
    # auxiliary training heads (ref: model.py:237-253)
    aux_model = BiSeNet(cfg, return_aux=True)
    aux_params = aux_model.init(jax.random.PRNGKey(0), x)
    main, a16, a32 = aux_model.apply(aux_params, x)
    assert main.shape == a16.shape == a32.shape == (1, 64, 64, 19)


def test_fourier_pos_encoding_matches_reference_semantics():
    # spot-check the sin/cos layout: order o, channel k of the first block is
    # sin(2^f * pi * coord) with row-major (freq, xy) flattening.
    pe = fourier_pos_encoding(16, order=3)
    assert pe.shape == (16, 16, 12)
    coords = np.linspace(0, 1, 16, endpoint=False)
    xx, yy = np.meshgrid(coords, coords)
    np.testing.assert_allclose(pe[..., 0], np.sin(np.pi * xx), atol=1e-6)
    np.testing.assert_allclose(pe[..., 1], np.sin(np.pi * yy), atol=1e-6)
    np.testing.assert_allclose(pe[..., 6], np.cos(np.pi * xx), atol=1e-6)


def test_shape_generator_roundtrip(rng):
    model = ShapeGenerator(TINY_SHAPE)
    label = _label(rng, 2, 64)
    oh = label_to_one_hot(label)
    hair, face = split_hair_face(oh)
    params = model.init(jax.random.PRNGKey(0), hair, face)
    mask, (code, mean, std, face_code) = model.apply(
        params, hair, face, rngs=None)
    assert mask.shape == (2, 64, 64, 19)
    np.testing.assert_allclose(np.asarray(mask.sum(-1)), 1.0, atol=1e-4)
    assert code.shape == (2, 16) and face_code.shape == (2, 1024)
    assert std.shape == (2, 16) and (np.asarray(std) >= 0).all()
    # deterministic encode (rng=None -> mean)
    m2 = model.apply(params, hair, method=model.encode_hair)[1]
    np.testing.assert_allclose(np.asarray(mean), np.asarray(m2))


def test_shape_discriminators(rng):
    label = _label(rng, 2, 64)
    oh = label_to_one_hot(label)
    dis = ShapeDiscriminator(TINY_SHAPE)
    p = dis.init(jax.random.PRNGKey(0), oh)
    out = dis.apply(p, oh)
    assert out.shape == (2, 1)
    dz = ShapeDiscriminatorNoise(TINY_SHAPE)
    code = jnp.asarray(rng.standard_normal((2, 16)).astype(np.float32))
    pz = dz.init(jax.random.PRNGKey(0), code)
    assert dz.apply(pz, code).shape == (2, 1)


def _ct_data(rng, n=4):
    return {
        'noise': jnp.asarray(rng.standard_normal((n, 8)).astype(np.float32)),
        'noise_curliness': jnp.asarray(
            rng.standard_normal((n, 1)).astype(np.float32)),
        'rgb_mean': jnp.asarray(
            rng.standard_normal((n, 3)).astype(np.float32)),
        'pca_std': jnp.asarray(
            rng.standard_normal((n, 1)).astype(np.float32)),
    }


def test_eigengan_generator(rng):
    cfg = ColorTextureConfig()
    gen = EigenGenerator(cfg)
    data = _ct_data(rng)
    params = gen.init(jax.random.PRNGKey(0), data)
    out = gen.apply(params, data)
    assert out['code'].shape == (4, 512)
    # orthogonal init => regulariser starts at ~0
    loss = gen.orthogonal_loss(params)
    assert float(loss) < 1e-5


def test_ct_discriminator_slices(rng):
    cfg = ColorTextureConfig()
    dis = CTDiscriminator(cfg)
    code = {'code': jnp.asarray(
        rng.standard_normal((4, 512)).astype(np.float32))}
    params = dis.init(jax.random.PRNGKey(0), code)
    out = dis.apply(params, code)
    assert set(out) == {'adv', 'noise', 'noise_curliness'}
    assert out['adv'].shape == (4, 1)
    assert out['noise'].shape == (4, 8)
    assert out['noise_curliness'].shape == (4, 1)


def test_ct_discriminator_noise(rng):
    cfg = ColorTextureConfig()
    dz = CTDiscriminatorNoise(cfg)
    data = _ct_data(rng)
    params = dz.init(jax.random.PRNGKey(0), data)
    assert dz.apply(params, data)['adv'].shape == (4, 1)


def test_predictors(rng):
    code = {'code': jnp.asarray(
        rng.standard_normal((4, 512)).astype(np.float32))}
    rgb = Predictor(rgb_predictor_config())
    p = rgb.init(jax.random.PRNGKey(0), code)
    out = rgb.apply(p, code)
    assert out['rgb_mean'].shape == (4, 3)
    assert out['pca_std'].shape == (4, 1)
    cur = Predictor(curliness_predictor_config())
    p2 = cur.init(jax.random.PRNGKey(0), code)
    assert cur.apply(p2, code)['cls_curliness'].shape == (4, 1)
