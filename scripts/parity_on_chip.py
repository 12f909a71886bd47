# The BASELINE SSIM gate ON THE REAL CHIP: instantiate the reference torch
# SPADEGenerator+Zencoder (random init, CPU), convert the state dict, run
# our SEAN encode -> hair-code swap -> decode on the TPU (f32 params,
# fidelity-critical contractions pinned HIGHEST), and compare against the
# torch pipeline on the reference's own sample images.
#
# The CPU test suite proves conversion math; this script proves the same
# numbers hold through the TPU compiler/MXU path.
# Usage: python scripts/parity_on_chip.py
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    # the MXU truncates f32 contractions to bf16 at default precision; the
    # parity gate compares against torch f32, so pin full precision for
    # every conv/dot traced below (first run showed SSIM 0.982 vs the
    # gate's 0.99 at default precision with random-init weights)
    jax.config.update('jax_default_matmul_precision', 'highest')
    from ctrlhair_tpu.convert import torch_import as ti
    from ctrlhair_tpu.convert.reference_runtime import (
        REFERENCE_ROOT, install, reference_available, sean_test_opt,
        torch_sean_decode)

    assert reference_available(), 'reference repo not present'
    install()
    import torch
    torch.manual_seed(11)
    torch.set_grad_enabled(False)

    from sean_codes.models.networks.generator import SPADEGenerator
    from ctrlhair_tpu.config import SEANConfig
    from ctrlhair_tpu.constants import HAIR_IDX
    from ctrlhair_tpu.models.sean import SEAN
    from ctrlhair_tpu.utils.metrics import ssim

    print(f'backend: {jax.default_backend()}  devices: {jax.devices()}',
          flush=True)

    netg = SPADEGenerator(sean_test_opt()).eval()
    cfg = SEANConfig()
    variables = jax.tree_util.tree_map(
        jnp.asarray,
        ti.convert_sean(netg.state_dict(), ngf=cfg.ngf,
                        semantic_nc=cfg.semantic_nc,
                        style_dim=cfg.style_dim))
    model = SEAN(cfg)   # f32 default dtype

    from PIL import Image
    imgs_dir = os.path.join(REFERENCE_ROOT, 'imgs')
    names = sorted(n for n in os.listdir(imgs_dir)
                   if n.endswith('.png'))[:2]
    imgs = np.stack([
        np.asarray(Image.open(os.path.join(imgs_dir, n)).convert('RGB'),
                   np.float32) / 127.5 - 1.0 for n in names])

    rng = np.random.default_rng(7)
    coarse = rng.integers(0, 19, (2, 16, 16))
    label = np.repeat(np.repeat(coarse, 16, 1), 16, 2).astype(np.int32)
    onehot = np.eye(19, dtype=np.float32)[label]

    t = lambda x: torch.from_numpy(np.asarray(x, np.float32))
    nchw = lambda x: t(np.transpose(x, (0, 3, 1, 2)))

    t_codes = netg.Zencoder(nchw(imgs), nchw(onehot))
    t_codes_sw = t_codes.clone()
    t_codes_sw[0, HAIR_IDX] = t_codes[1, HAIR_IDX]
    t_img = torch_sean_decode(netg, nchw(onehot[:1]), t_codes_sw[:1])
    t_img = np.transpose(t_img.detach().cpu().numpy(), (0, 2, 3, 1))

    encode = jax.jit(lambda v, i, l: model.apply(v, i, l,
                                                 method=model.encode))
    decode = jax.jit(lambda v, l, c: model.apply(v, l, c,
                                                 method=model.decode))
    j_codes = encode(variables, jnp.asarray(imgs), jnp.asarray(label))
    code_diff = float(jnp.max(jnp.abs(
        j_codes - jnp.asarray(t_codes.detach().cpu().numpy()))))
    j_codes_sw = j_codes.at[0, HAIR_IDX].set(j_codes[1, HAIR_IDX])
    j_img = decode(variables, jnp.asarray(label[:1]), j_codes_sw[:1])

    a = (np.asarray(j_img[0]) + 1.0) * 127.5
    b = (t_img[0] + 1.0) * 127.5
    val = float(ssim(jnp.asarray(a), jnp.asarray(b), data_range=255.0))
    img_diff = float(np.max(np.abs(np.asarray(j_img) - t_img)))
    print(f'encode max|diff| vs torch: {code_diff:.2e}', flush=True)
    print(f'decode max|diff| vs torch: {img_diff:.2e}  '
          f'(range [-1,1])', flush=True)
    print(f'e2e swap SSIM on {jax.default_backend()}: {val:.5f} '
          f'(gate >= 0.99)', flush=True)
    assert val >= 0.99, 'SSIM gate FAILED on this backend'
    print('PASS', flush=True)


if __name__ == '__main__':
    main()
