# SEAN full-tree conversion: fake reference-layout state dict -> our tree.
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ctrlhair_tpu.config import SEANConfig
from ctrlhair_tpu.convert import torch_import as ti
from ctrlhair_tpu.models.sean import SEAN

CFG = SEANConfig(crop_size=64, ngf=4, zencoder_ngf=4, style_dim=64)


def _fake_sean_sd(rng, cfg: SEANConfig):
    """State dict with the reference SEAN netG layout
    (generator.py:24-54, architecture.py:21-96, normalization.py:70-215)."""
    sd = {}
    nf = cfg.ngf
    sem = cfg.semantic_nc
    sl = cfg.style_dim

    def conv(name, cout, cin, k, bias=True):
        sd[f'{name}.weight'] = rng.standard_normal(
            (cout, cin, k, k)).astype(np.float32) * 0.05
        if bias:
            sd[f'{name}.bias'] = np.zeros(cout, np.float32)

    def sn_conv(name, cout, cin, k, bias=True):
        sd[f'{name}.weight_orig'] = rng.standard_normal(
            (cout, cin, k, k)).astype(np.float32) * 0.05
        sd[f'{name}.weight_u'] = rng.standard_normal(cout).astype(np.float32)
        sd[f'{name}.weight_v'] = rng.standard_normal(
            cin * k * k).astype(np.float32)
        if bias:
            sd[f'{name}.bias'] = np.zeros(cout, np.float32)

    def ace(name, c, use_styles):
        sd[f'{name}.param_free_norm.running_mean'] = np.zeros(c, np.float32)
        sd[f'{name}.param_free_norm.running_var'] = np.ones(c, np.float32)
        sd[f'{name}.noise_var'] = np.zeros(c, np.float32)
        conv(f'{name}.Spade.mlp_shared.0', 128, sem, 3)
        conv(f'{name}.Spade.mlp_gamma', c, 128, 3)
        conv(f'{name}.Spade.mlp_beta', c, 128, 3)
        if use_styles:
            sd[f'{name}.blending_gamma'] = np.zeros(1, np.float32)
            sd[f'{name}.blending_beta'] = np.zeros(1, np.float32)
            for j in range(sem):
                sd[f'{name}.fc_mu{j}.weight'] = rng.standard_normal(
                    (sl, sl)).astype(np.float32) * 0.05
                sd[f'{name}.fc_mu{j}.bias'] = np.zeros(sl, np.float32)
            conv(f'{name}.conv_gamma', c, sl, 3)
            conv(f'{name}.conv_beta', c, sl, 3)

    def block(name, fin, fout, use_styles):
        fmid = min(fin, fout)
        ace(f'{name}.ace_0', fin, use_styles)
        ace(f'{name}.ace_1', fmid, use_styles)
        sn_conv(f'{name}.conv_0', fmid, fin, 3)
        sn_conv(f'{name}.conv_1', fout, fmid, 3)
        if fin != fout:
            ace(f'{name}.ace_s', fin, use_styles)
            sn_conv(f'{name}.conv_s', fout, fin, 1, bias=False)

    conv('fc', 16 * nf, sem, 3)
    block('head_0', 16 * nf, 16 * nf, True)
    block('G_middle_0', 16 * nf, 16 * nf, True)
    block('G_middle_1', 16 * nf, 16 * nf, True)
    block('up_0', 16 * nf, 8 * nf, True)
    block('up_1', 8 * nf, 4 * nf, True)
    block('up_2', 4 * nf, 2 * nf, True)
    block('up_3', 2 * nf, 1 * nf, False)
    conv('conv_img', 3, nf, 3)

    zf = cfg.zencoder_ngf
    conv('Zencoder.model.1', zf, 3, 3)
    conv('Zencoder.model.4', zf * 2, zf, 3)
    conv('Zencoder.model.7', zf * 4, zf * 2, 3)
    sd['Zencoder.model.10.weight'] = rng.standard_normal(
        (zf * 4, zf * 8, 3, 3)).astype(np.float32) * 0.05  # ConvT [in,out]
    sd['Zencoder.model.10.bias'] = np.zeros(zf * 8, np.float32)
    conv('Zencoder.model.14', sl, zf * 8, 3)
    return sd


def test_sean_conversion_structure_and_run(rng):
    model = SEAN(CFG)
    img = jnp.zeros((1, 64, 64, 3))
    label = jnp.zeros((1, 64, 64), jnp.int32)
    target = model.init(jax.random.PRNGKey(0), img, label)
    sd = _fake_sean_sd(rng, CFG)
    conv = ti.convert_sean(sd, ngf=CFG.ngf, style_dim=CFG.style_dim)

    # structural + shape equality against the live init tree
    ts = jax.tree_util.tree_map(lambda x: tuple(np.shape(x)), target)
    cs = jax.tree_util.tree_map(lambda x: tuple(np.shape(x)), conv)
    flat_t = jax.tree_util.tree_flatten_with_path(ts)[0]
    flat_c = jax.tree_util.tree_flatten_with_path(cs)[0]
    assert jax.tree_util.tree_structure(ts) == \
        jax.tree_util.tree_structure(cs)
    for (pa, a), (_, b) in zip(flat_c, flat_t):
        assert a == b, f'{pa}: {a} vs {b}'

    # converted tree actually drives encode + decode
    variables = jax.tree_util.tree_map(jnp.asarray, conv)
    codes = model.apply(variables, img, label, method=model.encode)
    out = model.apply(variables, label, codes, method=model.decode)
    assert out.shape == (1, 64, 64, 3)
    assert np.isfinite(np.asarray(out)).all()
