# Live-reference parity: instantiate the ACTUAL torch networks from
# /root/reference (random init, CPU), convert their state dicts with
# convert.torch_import, and assert our JAX models reproduce their outputs.
# This certifies the conversion layer + architecture parity end to end
# before trained weights exist (VERDICT r1 item 1 / BASELINE SSIM gate).
#
# Reference networks under test:
#   SPADEGenerator + Zencoder  sean_codes/models/networks/generator.py:24-109
#   BiSeNet                    external_code/face_parsing/model.py:230-254
#   shape Generator            shape_branch/model.py:146-199
#   EigenGenerator             color_texture_branch/model_eigengan.py:34-89
#   CT Discriminator           color_texture_branch/model.py:86-130
#   Predictor                  predictor/predictor_model.py:14-41

import numpy as np
import pytest

from ctrlhair_tpu.convert import torch_import as ti
from ctrlhair_tpu.convert.reference_runtime import (
    REFERENCE_ROOT, install, reference_available, sean_test_opt,
    torch_sean_decode)

pytestmark = [
    pytest.mark.skipif(not reference_available(),
                       reason='reference repo not present'),
    pytest.mark.parity,
]

if reference_available():
    install()
    import torch

    torch.manual_seed(7)
    torch.set_grad_enabled(False)

import jax
import jax.numpy as jnp


def _t(x):
    return torch.from_numpy(np.asarray(x, np.float32))


def _nchw(x):
    return _t(np.transpose(x, (0, 3, 1, 2)))


def _np(x):
    return x.detach().cpu().numpy()


def _random_label(rng, n, size):
    """Blocky random segmentation label so regions have real area."""
    coarse = rng.integers(0, 19, (n, size // 16, size // 16))
    return np.repeat(np.repeat(coarse, 16, axis=1), 16, axis=2).astype(np.int32)


def _report(name, ours, theirs, atol):
    ours = np.asarray(ours)
    theirs = np.asarray(theirs)
    diff = np.abs(ours - theirs)
    scale = max(np.abs(theirs).max(), 1e-6)
    assert ours.shape == theirs.shape, f'{name}: {ours.shape} vs {theirs.shape}'
    assert np.isfinite(ours).all(), f'{name}: non-finite ours'
    assert diff.max() <= atol, (
        f'{name}: max|diff|={diff.max():.3e} (atol {atol:.1e}, '
        f'scale {scale:.3e}, mean|diff|={diff.mean():.3e})')


# --------------------------------------------------------------- tiny MLPs

@pytest.mark.parametrize('which', ['p002', 'p004'])
def test_predictor_parity(rng, which):
    from color_texture_branch.predictor import predictor_config as pc
    from color_texture_branch.predictor.predictor_model import Predictor as TP
    from ctrlhair_tpu.config import (curliness_predictor_config,
                                     rgb_predictor_config)
    from ctrlhair_tpu.models.color_texture import Predictor

    ref_cfg = pc.get_config(pc.configs, which)
    pc.back_process(ref_cfg)
    tmodel = TP(ref_cfg).eval()
    sd = {k: v for k, v in tmodel.state_dict().items()}

    ours_cfg = (curliness_predictor_config() if which == 'p002'
                else rgb_predictor_config())
    assert ours_cfg.hidden_dim == ref_cfg.hidden_dim
    assert dict(ours_cfg.predict_dict) == dict(ref_cfg.predict_dict)

    code = rng.standard_normal((4, 512)).astype(np.float32)
    t_out = tmodel({'code': _t(code)})

    model = Predictor(ours_cfg)
    variables = jax.tree_util.tree_map(
        jnp.asarray, ti.convert_predictor(sd, ours_cfg.hidden_layer_num,
                                          ours_cfg.norm))
    j_out = model.apply(variables, {'code': jnp.asarray(code)})
    for k in t_out:
        _report(f'predictor[{which}].{k}', j_out[k], _np(t_out[k]), 1e-5)


def test_eigengan_parity(rng):
    from color_texture_branch.config import cfg as ref_cfg
    from color_texture_branch.model_eigengan import EigenGenerator as TG
    from ctrlhair_tpu.config import ColorTextureConfig
    from ctrlhair_tpu.models.color_texture import EigenGenerator

    cfg = ColorTextureConfig()
    assert cfg.subspace_dim == ref_cfg.subspace_dim
    assert cfg.g_hidden_dim == ref_cfg.g_hidden_dim

    tmodel = TG(ref_cfg).eval()
    data = {
        'noise': rng.standard_normal((4, cfg.noise_dim)).astype(np.float32),
        'noise_curliness': rng.standard_normal((4, 1)).astype(np.float32),
        'rgb_mean': rng.standard_normal((4, 3)).astype(np.float32),
        'pca_std': rng.standard_normal((4, 1)).astype(np.float32),
    }
    t_out = tmodel({k: _t(v) for k, v in data.items()})['code']

    variables = jax.tree_util.tree_map(
        jnp.asarray,
        ti.convert_ct_generator(tmodel.state_dict(), cfg.g_hidden_layer_num))
    j_out = EigenGenerator(cfg).apply(
        variables, {k: jnp.asarray(v) for k, v in data.items()})['code']
    _report('eigengan.code', j_out, _np(t_out), 1e-5)


def test_ct_discriminator_parity(rng):
    from color_texture_branch.config import cfg as ref_cfg
    from color_texture_branch.model import Discriminator as TD
    from ctrlhair_tpu.config import ColorTextureConfig
    from ctrlhair_tpu.models.color_texture import CTDiscriminator

    cfg = ColorTextureConfig()
    tmodel = TD(ref_cfg).eval()
    code = rng.standard_normal((4, 512)).astype(np.float32)
    t_out = tmodel({'code': _t(code)})

    variables = jax.tree_util.tree_map(
        jnp.asarray,
        ti.convert_ct_discriminator(tmodel.state_dict(),
                                    cfg.d_hidden_layer_num))
    j_out = CTDiscriminator(cfg).apply(variables,
                                       {'code': jnp.asarray(code)})
    assert set(j_out) == set(t_out)
    for k in t_out:
        _report(f'ct_dis.{k}', j_out[k], _np(t_out[k]), 1e-5)


# ------------------------------------------------------------ shape branch

def test_shape_generator_parity(rng):
    from shape_branch.config import cfg as ref_cfg
    from shape_branch.model import Generator as TG
    from ctrlhair_tpu.config import ShapeConfig
    from ctrlhair_tpu.constants import HAIR_IDX
    from ctrlhair_tpu.models.shape import ShapeGenerator

    cfg = ShapeConfig()
    assert cfg.hair_dim == ref_cfg.hair_dim
    assert cfg.pos_encoding_order == ref_cfg.pos_encoding_order

    tmodel = TG(ref_cfg).eval()
    label = _random_label(rng, 1, 256)
    onehot = np.eye(19, dtype=np.float32)[label]        # [1,256,256,19]
    hair = onehot[..., HAIR_IDX:HAIR_IDX + 1]
    face = np.concatenate([onehot[..., :HAIR_IDX],
                           onehot[..., HAIR_IDX + 1:]], axis=-1)

    t_hair_code = tmodel.forward_hair_encoder(_nchw(hair), testing=True)
    t_face_code = tmodel.forward_face_encoder(_nchw(face))
    t_mask = tmodel.forward_decode_by_code(t_hair_code, t_face_code)

    variables = jax.tree_util.tree_map(
        jnp.asarray,
        ti.convert_shape_generator(tmodel.state_dict(), cfg.layer_num))
    model = ShapeGenerator(cfg)
    j_sample, j_mean, _ = model.apply(variables, jnp.asarray(hair),
                                      method=model.encode_hair)
    j_face = model.apply(variables, jnp.asarray(face),
                         method=model.encode_face)
    j_mask = model.apply(variables, j_mean, j_face, method=model.decode)

    _report('shape.hair_code', j_mean, _np(t_hair_code), 2e-4)
    _report('shape.face_code', j_face, _np(t_face_code), 2e-4)
    _report('shape.mask', j_mask,
            np.transpose(_np(t_mask), (0, 2, 3, 1)), 2e-4)


# ----------------------------------------------------------------- BiSeNet

def test_bisenet_parity(rng):
    from external_code.face_parsing.model import BiSeNet as TB
    from ctrlhair_tpu.config import BiSeNetConfig
    from ctrlhair_tpu.models.bisenet import BiSeNet

    tmodel = TB(n_classes=19).eval()
    x = rng.standard_normal((1, 512, 512, 3)).astype(np.float32)
    t_out, t_16, t_32 = tmodel(_nchw(x))

    variables = jax.tree_util.tree_map(
        jnp.asarray, ti.convert_bisenet(tmodel.state_dict()))
    model = BiSeNet(BiSeNetConfig(), return_aux=True)
    j_out, j_16, j_32 = model.apply(variables, jnp.asarray(x))

    _report('bisenet.main', j_out,
            np.transpose(_np(t_out), (0, 2, 3, 1)), 2e-3)
    _report('bisenet.aux16', j_16,
            np.transpose(_np(t_16), (0, 2, 3, 1)), 2e-3)
    _report('bisenet.aux32', j_32,
            np.transpose(_np(t_32), (0, 2, 3, 1)), 2e-3)


# ------------------------------------------------------------------- SEAN

@pytest.fixture(scope='module')
def sean_pair():
    """(torch netG, our SEAN model, converted variables) at full 256px."""
    from sean_codes.models.networks.generator import SPADEGenerator
    from ctrlhair_tpu.config import SEANConfig
    from ctrlhair_tpu.models.sean import SEAN

    torch.manual_seed(11)
    netg = SPADEGenerator(sean_test_opt()).eval()
    cfg = SEANConfig()
    variables = jax.tree_util.tree_map(
        jnp.asarray,
        ti.convert_sean(netg.state_dict(), ngf=cfg.ngf,
                        semantic_nc=cfg.semantic_nc,
                        style_dim=cfg.style_dim))
    return netg, SEAN(cfg), variables


def test_zencoder_parity(rng, sean_pair):
    netg, model, variables = sean_pair
    img = rng.uniform(-1, 1, (1, 256, 256, 3)).astype(np.float32)
    label = _random_label(rng, 1, 256)
    onehot = np.eye(19, dtype=np.float32)[label]

    t_codes = netg.Zencoder(_nchw(img), _nchw(onehot))
    j_codes = model.apply(variables, jnp.asarray(img),
                          jnp.asarray(label), method=model.encode)
    _report('zencoder.codes', j_codes, _np(t_codes), 1e-4)


def test_sean_decode_parity(rng, sean_pair):
    netg, model, variables = sean_pair
    label = _random_label(rng, 1, 256)
    onehot = np.eye(19, dtype=np.float32)[label]
    codes = rng.standard_normal((1, 19, 512)).astype(np.float32)

    t_img = torch_sean_decode(netg, _nchw(onehot), _t(codes))
    j_img = model.apply(variables, jnp.asarray(label),
                        jnp.asarray(codes), method=model.decode)
    _report('sean.decode', j_img,
            np.transpose(_np(t_img), (0, 2, 3, 1)), 2e-3)


def test_e2e_swap_ssim(rng, sean_pair):
    """encode -> swap hair code -> decode on real reference images; the
    rendered images must agree to SSIM >= 0.99 (the BASELINE gate)."""
    import os
    from PIL import Image
    from ctrlhair_tpu.constants import HAIR_IDX
    from ctrlhair_tpu.utils.metrics import ssim

    netg, model, variables = sean_pair
    imgs_dir = os.path.join(REFERENCE_ROOT, 'imgs')
    names = sorted(n for n in os.listdir(imgs_dir) if n.endswith('.png'))[:2]
    imgs = []
    for n in names:
        arr = np.asarray(Image.open(os.path.join(imgs_dir, n)).convert('RGB'),
                         np.float32)
        imgs.append(arr / 127.5 - 1.0)
    imgs = np.stack(imgs)                     # [2,256,256,3] in [-1,1]

    # identical labels on both sides: blocky random parse stand-in (the
    # parser itself is parity-tested separately)
    label = _random_label(rng, 2, 256)
    onehot = np.eye(19, dtype=np.float32)[label]

    t_codes = netg.Zencoder(_nchw(imgs), _nchw(onehot))
    t_codes_sw = t_codes.clone()
    t_codes_sw[0, HAIR_IDX] = t_codes[1, HAIR_IDX]   # hair transfer 1 -> 0
    t_img = torch_sean_decode(netg, _nchw(onehot[:1]), t_codes_sw[:1])
    t_img = np.transpose(_np(t_img), (0, 2, 3, 1))

    j_codes = model.apply(variables, jnp.asarray(imgs),
                          jnp.asarray(label), method=model.encode)
    _report('e2e.codes', j_codes, _np(t_codes), 1e-4)
    j_codes_sw = j_codes.at[0, HAIR_IDX].set(j_codes[1, HAIR_IDX])
    j_img = model.apply(variables, jnp.asarray(label[:1]),
                        j_codes_sw[:1], method=model.decode)

    a = (np.asarray(j_img[0]) + 1.0) * 127.5
    b = (t_img[0] + 1.0) * 127.5
    val = float(ssim(jnp.asarray(a), jnp.asarray(b), data_range=255.0))
    assert val >= 0.99, f'e2e SSIM {val:.5f} < 0.99'
    _report('e2e.image', j_img, t_img, 2e-3)
