# Checkpoint-conversion tests: layer-level numerical parity against live
# torch ops, and structural compatibility of full converted trees with our
# model init trees (same keys, same shapes).
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ctrlhair_tpu.convert import torch_import as ti


# --------------------------------------------------------- layer-level math

def test_conv_kernel_matches_torch(rng):
    torch = pytest.importorskip('torch')
    conv = torch.nn.Conv2d(3, 5, 3, padding=1)
    x = rng.standard_normal((2, 3, 8, 8)).astype(np.float32)
    ref = conv(torch.tensor(x)).detach().numpy()

    from ctrlhair_tpu.models.layers import TorchConv
    m = TorchConv(5, 3, 1, 1)
    params = {'params': {'conv': {
        'kernel': jnp.asarray(ti.conv_kernel(conv.weight)),
        'bias': jnp.asarray(ti._np(conv.bias))}}}
    got = m.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(ref.transpose(0, 2, 3, 1), np.asarray(got),
                               atol=2e-5)


def test_conv_stride2_k4_matches_torch(rng):
    torch = pytest.importorskip('torch')
    conv = torch.nn.Conv2d(4, 6, 4, stride=2, padding=1)
    x = rng.standard_normal((1, 4, 16, 16)).astype(np.float32)
    ref = conv(torch.tensor(x)).detach().numpy()
    from ctrlhair_tpu.models.layers import TorchConv
    m = TorchConv(6, 4, 2, 1)
    params = {'params': {'conv': {
        'kernel': jnp.asarray(ti.conv_kernel(conv.weight)),
        'bias': jnp.asarray(ti._np(conv.bias))}}}
    got = m.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    assert got.shape == (1, 8, 8, 6)
    np.testing.assert_allclose(ref.transpose(0, 2, 3, 1), np.asarray(got),
                               atol=2e-5)


def test_conv_transpose_matches_torch(rng):
    torch = pytest.importorskip('torch')
    conv = torch.nn.ConvTranspose2d(4, 6, 3, stride=2, padding=1,
                                    output_padding=1)
    x = rng.standard_normal((1, 4, 8, 8)).astype(np.float32)
    ref = conv(torch.tensor(x)).detach().numpy()
    from ctrlhair_tpu.models.layers import TorchConvTranspose
    m = TorchConvTranspose(6, 3, 2, 1, 1)
    params = {'params': {'conv': {
        'kernel': jnp.asarray(ti.conv_transpose_kernel(conv.weight)),
        'bias': jnp.asarray(ti._np(conv.bias))}}}
    got = m.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    assert got.shape == (1, 16, 16, 6)
    np.testing.assert_allclose(ref.transpose(0, 2, 3, 1), np.asarray(got),
                               atol=2e-5)


def test_linear_and_bn_eval_match_torch(rng):
    torch = pytest.importorskip('torch')
    lin = torch.nn.Linear(6, 4)
    bn = torch.nn.BatchNorm1d(4)
    bn.running_mean.data = torch.tensor(
        rng.standard_normal(4).astype(np.float32))
    bn.running_var.data = torch.tensor(
        rng.random(4).astype(np.float32) + 0.5)
    bn.eval()
    x = rng.standard_normal((5, 6)).astype(np.float32)
    ref = bn(lin(torch.tensor(x))).detach().numpy()

    from ctrlhair_tpu.models.layers import LinearBlock
    m = LinearBlock(4, norm='bn', activation='none', train=False)
    sd = {'fc.weight': lin.weight, 'fc.bias': lin.bias,
          'norm.weight': bn.weight, 'norm.bias': bn.bias,
          'norm.running_mean': bn.running_mean,
          'norm.running_var': bn.running_var}
    sd = {f'l.{k}': v for k, v in sd.items()}
    p = ti._linear_block(sd, 'l', 'bn')
    bnp, stats = ti.bn_variables(sd, 'l.norm')
    variables = {'params': p, 'batch_stats': {'norm': {'bn': stats}}}
    got = m.apply(variables, jnp.asarray(x))
    np.testing.assert_allclose(ref, np.asarray(got), atol=2e-5)


def test_instance_norm_matches_torch(rng):
    torch = pytest.importorskip('torch')
    x = rng.standard_normal((2, 3, 8, 8)).astype(np.float32)
    ref = torch.nn.functional.instance_norm(torch.tensor(x)).numpy()
    from ctrlhair_tpu.models.layers import InstanceNorm
    got = InstanceNorm().apply({}, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(ref.transpose(0, 2, 3, 1), np.asarray(got),
                               atol=1e-4)


def test_spectral_weight_resolution(rng):
    torch = pytest.importorskip('torch')
    conv = torch.nn.Conv2d(4, 8, 3)
    sn = torch.nn.utils.spectral_norm(conv)
    x = torch.tensor(rng.standard_normal((1, 4, 6, 6)).astype(np.float32))
    sn.eval()  # freeze u/v so state_dict matches the weight we capture
    with torch.no_grad():
        sn(x)
        ref_w = sn.weight.detach().numpy()
    sd = {f'c.{k}': v for k, v in sn.state_dict().items()}
    got = ti.spectral_weight(sd, 'c')
    np.testing.assert_allclose(ref_w, got, rtol=1e-4, atol=1e-5)


# ------------------------------------------------------- full-tree structure

def _tree_shapes(tree):
    return jax.tree_util.tree_map(lambda x: tuple(np.shape(x)), tree)


def _assert_same_structure(converted, target):
    ts = _tree_shapes(target)
    cs = _tree_shapes(converted)
    assert jax.tree_util.tree_structure(ts) == \
        jax.tree_util.tree_structure(cs), (
        f'\nconverted:{jax.tree_util.tree_structure(cs)}'
        f'\ntarget:   {jax.tree_util.tree_structure(ts)}')
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_flatten_with_path(cs)[0],
            jax.tree_util.tree_flatten_with_path(ts)[0]):
        assert a == b, f'{pa}: {a} vs {b}'


def _fake_ct_gen_sd(rng, cfg):
    sd = {}
    sd['main_layer_in.weight'] = rng.standard_normal(
        (cfg.g_hidden_dim, cfg.cond_dim)).astype(np.float32)
    sd['main_layer_in.bias'] = np.zeros(cfg.g_hidden_dim, np.float32)
    for i in range(cfg.g_hidden_layer_num):
        out = cfg.style_dim if i == cfg.g_hidden_layer_num - 1 \
            else cfg.g_hidden_dim
        sd[f'subspaces.{i}.U'] = rng.standard_normal(
            (cfg.subspace_dim, cfg.g_hidden_dim)).astype(np.float32)
        sd[f'subspaces.{i}.L'] = np.ones(cfg.subspace_dim, np.float32)
        sd[f'subspaces.{i}.mu'] = np.zeros(cfg.g_hidden_dim, np.float32)
        sd[f'main_layer_mid.{i}.1.weight'] = rng.standard_normal(
            (out, cfg.g_hidden_dim)).astype(np.float32)
        sd[f'main_layer_mid.{i}.1.bias'] = np.zeros(out, np.float32)
    return sd


def test_ct_generator_conversion_structure(rng):
    from ctrlhair_tpu.config import ColorTextureConfig
    from ctrlhair_tpu.models.color_texture import EigenGenerator
    cfg = ColorTextureConfig(style_dim=64, g_hidden_dim=32)
    gen = EigenGenerator(cfg)
    data = {'noise': jnp.zeros((1, cfg.noise_dim)),
            'noise_curliness': jnp.zeros((1, 1)),
            'rgb_mean': jnp.zeros((1, 3)), 'pca_std': jnp.zeros((1, 1))}
    target = gen.init(jax.random.PRNGKey(0), data)
    conv = ti.convert_ct_generator(_fake_ct_gen_sd(rng, cfg),
                                   cfg.g_hidden_layer_num)
    _assert_same_structure(conv, target)
    # converted params actually run
    out = gen.apply(jax.tree_util.tree_map(jnp.asarray, conv), data)
    assert out['code'].shape == (1, 64)


def _fake_mlp_sd(rng, prefix, dims, norm='none'):
    sd = {}
    for i, (din, dout) in enumerate(zip(dims[:-1], dims[1:])):
        sd[f'{prefix}.{i}.fc.weight'] = rng.standard_normal(
            (dout, din)).astype(np.float32)
        sd[f'{prefix}.{i}.fc.bias'] = np.zeros(dout, np.float32)
        if norm == 'bn' and i < len(dims) - 2:
            sd[f'{prefix}.{i}.norm.weight'] = np.ones(dout, np.float32)
            sd[f'{prefix}.{i}.norm.bias'] = np.zeros(dout, np.float32)
            sd[f'{prefix}.{i}.norm.running_mean'] = np.zeros(dout, np.float32)
            sd[f'{prefix}.{i}.norm.running_var'] = np.ones(dout, np.float32)
    return sd


def test_ct_discriminator_conversion_structure(rng):
    from ctrlhair_tpu.config import ColorTextureConfig
    from ctrlhair_tpu.models.color_texture import CTDiscriminator
    cfg = ColorTextureConfig(style_dim=64, d_hidden_dim=32)
    dis = CTDiscriminator(cfg)
    target = dis.init(jax.random.PRNGKey(0),
                      {'code': jnp.zeros((1, 64))})
    # head width mirrors the reference quirk incl. the dangling pca_std unit
    # (ref: model.py:98-105): 1 + noise + pca_std + curliness
    out_dim = 1 + cfg.noise_dim + 1 + cfg.curliness_dim
    sd = _fake_mlp_sd(rng, 'net', [64, 32, 32, 32, 32, out_dim])
    conv = ti.convert_ct_discriminator(sd, cfg.d_hidden_layer_num)
    _assert_same_structure(conv, target)


def test_predictor_conversion_structure(rng):
    from ctrlhair_tpu.config import rgb_predictor_config
    import dataclasses
    from ctrlhair_tpu.models.color_texture import Predictor
    cfg = dataclasses.replace(rgb_predictor_config(), style_dim=64,
                              hidden_dim=32)
    model = Predictor(cfg)
    target = model.init(jax.random.PRNGKey(0),
                        {'code': jnp.zeros((1, 64))})
    sd = _fake_mlp_sd(rng, 'net', [64, 32, 32, 32, 4], norm='bn')
    conv = ti.convert_predictor(sd, cfg.hidden_layer_num, 'bn')
    _assert_same_structure(conv, target)


def _fake_shape_gen_sd(rng, cfg):
    sd = {}

    def enc(prefix, in_ch, out_dim, vae):
        ch = in_ch + cfg.pos_encoding_order * 4
        size = cfg.img_size
        for i in range(cfg.layer_num):
            out_ch = min(cfg.max_channel, 2 ** i * cfg.hidden_in_channel)
            sd[f'{prefix}.layers.{i}.conv.weight'] = rng.standard_normal(
                (out_ch, ch, 4, 4)).astype(np.float32)
            sd[f'{prefix}.layers.{i}.conv.bias'] = np.zeros(out_ch,
                                                            np.float32)
            sd[f'{prefix}.layers.{i}.norm.gamma'] = np.ones(out_ch,
                                                            np.float32)
            sd[f'{prefix}.layers.{i}.norm.beta'] = np.zeros(out_ch,
                                                            np.float32)
            ch = out_ch
            size //= 2
        fc_in = size * size * ch
        sd[f'{prefix}.out_layer.fc.weight'] = rng.standard_normal(
            (out_dim, fc_in)).astype(np.float32)
        sd[f'{prefix}.out_layer.fc.bias'] = np.zeros(out_dim, np.float32)
        if vae:
            sd[f'{prefix}.std_out_layer.fc.weight'] = rng.standard_normal(
                (out_dim, fc_in)).astype(np.float32)
            sd[f'{prefix}.std_out_layer.fc.bias'] = np.zeros(out_dim,
                                                             np.float32)

    def dec(prefix, in_dim, out_ch_final):
        in_ch = min(32 * 2 ** cfg.layer_num, cfg.max_channel)
        size = cfg.img_size // (2 ** cfg.layer_num)
        sd[f'{prefix}.in_layer.fc.weight'] = rng.standard_normal(
            (in_ch * size * size, in_dim)).astype(np.float32)
        sd[f'{prefix}.in_layer.fc.bias'] = np.zeros(in_ch * size * size,
                                                    np.float32)
        ch = in_ch
        for i in range(cfg.layer_num):
            out_ch = min(32 * 2 ** (cfg.layer_num - 1 - i), cfg.max_channel)
            sd[f'{prefix}.layers.{2 * i + 1}.conv.weight'] = \
                rng.standard_normal((out_ch, ch, 3, 3)).astype(np.float32)
            sd[f'{prefix}.layers.{2 * i + 1}.conv.bias'] = np.zeros(
                out_ch, np.float32)
            sd[f'{prefix}.layers.{2 * i + 1}.norm.gamma'] = np.ones(
                out_ch, np.float32)
            sd[f'{prefix}.layers.{2 * i + 1}.norm.beta'] = np.zeros(
                out_ch, np.float32)
            ch = out_ch
        sd[f'{prefix}.out_layer.conv.weight'] = rng.standard_normal(
            (out_ch_final, ch, 3, 3)).astype(np.float32)
        sd[f'{prefix}.out_layer.conv.bias'] = np.zeros(out_ch_final,
                                                       np.float32)

    enc('hair_encoder', 1, cfg.hair_dim, True)
    enc('face_encoder', 18, cfg.face_dim, False)
    dec('hair_decoder', cfg.face_dim + cfg.hair_dim, 1)
    dec('face_decoder', cfg.face_dim, 18)
    return sd


def test_shape_generator_conversion_structure(rng):
    from ctrlhair_tpu.config import ShapeConfig
    from ctrlhair_tpu.models.shape import ShapeGenerator
    from ctrlhair_tpu.utils.masks import label_to_one_hot, split_hair_face
    cfg = ShapeConfig(img_size=32, layer_num=3, max_channel=32,
                      hidden_in_channel=8, face_dim=64)
    gen = ShapeGenerator(cfg)
    label = jnp.zeros((1, 32, 32), jnp.int32)
    hair, face = split_hair_face(label_to_one_hot(label))
    target = gen.init(jax.random.PRNGKey(0), hair, face)
    conv = ti.convert_shape_generator(
        _fake_shape_gen_sd(rng, cfg), cfg.layer_num,
        img_size=cfg.img_size, hidden_in_channel=cfg.hidden_in_channel,
        max_channel=cfg.max_channel)
    _assert_same_structure(conv, target)
    mask, _ = gen.apply(jax.tree_util.tree_map(jnp.asarray, conv),
                        hair, face)
    assert mask.shape == (1, 32, 32, 19)


def test_strip_ddp_prefix():
    sd = {'module.a.weight': 1, 'module.b.bias': 2}
    out = ti.strip_ddp_prefix(sd)
    assert set(out) == {'a.weight', 'b.bias'}
    sd2 = {'a.weight': 1}
    assert ti.strip_ddp_prefix(sd2) == sd2


def test_linear_ln_matches_torch(rng):
    """LinearBlock 'ln' == torch nn.LayerNorm (the reference LinearBlock's
    'ln', my_torchlib/module.py:29-30 — NOT the conv blocks' custom one)."""
    torch = pytest.importorskip('torch')
    lin = torch.nn.Linear(6, 4)
    ln = torch.nn.LayerNorm(4)
    ln.weight.data = torch.tensor(rng.standard_normal(4).astype(np.float32))
    ln.bias.data = torch.tensor(rng.standard_normal(4).astype(np.float32))
    x = rng.standard_normal((5, 6)).astype(np.float32)
    ref = ln(lin(torch.tensor(x))).detach().numpy()

    from ctrlhair_tpu.models.layers import LinearBlock
    m = LinearBlock(4, norm='ln', activation='none', train=False)
    sd = {'l.fc.weight': lin.weight, 'l.fc.bias': lin.bias,
          'l.norm.weight': ln.weight, 'l.norm.bias': ln.bias}
    p = ti._linear_block(sd, 'l', 'ln')
    got = m.apply({'params': p}, jnp.asarray(x))
    np.testing.assert_allclose(ref, np.asarray(got), atol=2e-5)
