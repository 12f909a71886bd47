# SEAN/pix2pix adversarial stack: multiscale PatchGAN discriminator and the
# VGG19 feature extractor for the perceptual loss.
#
# Parity targets: sean_codes/models/networks/discriminator.py:14-119
# (MultiscaleDiscriminator of NLayerDiscriminators with intermediate
# features), architecture.py:121-151 (VGG19 slices).  The torchvision
# pretrained VGG dependency is replaced by a native flax VGG19 whose weights
# can be imported from a torch state dict when available (zero-egress
# environments fall back to random features, which still regularise).

from __future__ import annotations

from typing import Any, List, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ctrlhair_tpu.models.layers import InstanceNorm, TorchConv, leaky_relu

Dtype = Any


class NLayerDiscriminator(nn.Module):
    """70x70-style PatchGAN returning intermediate features
    (ref: discriminator.py:65-119): C64-C128-C256-C512-1, k4, instance norm.
    """
    ndf: int = 64
    n_layers: int = 4
    input_nc: int = 22    # label 19 + image 3 (concatenated)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        feats = []
        nf = self.ndf
        h = TorchConv(nf, 4, 2, 2, dtype=self.dtype, name='layer0')(x)
        h = leaky_relu(h)
        feats.append(h)
        for i in range(1, self.n_layers):
            nf = min(nf * 2, 512)
            stride = 1 if i == self.n_layers - 1 else 2
            h = TorchConv(nf, 4, stride, 2, dtype=self.dtype,
                          name=f'layer{i}')(h)
            h = InstanceNorm(dtype=self.dtype)(h)
            h = leaky_relu(h)
            feats.append(h)
        h = TorchConv(1, 4, 1, 2, dtype=self.dtype, name='out')(h)
        feats.append(h)
        return feats


class MultiscaleDiscriminator(nn.Module):
    """Two scales: full res + 2x avg-pooled (ref: discriminator.py:14-62)."""
    num_d: int = 2
    ndf: int = 64
    n_layers: int = 4
    input_nc: int = 22
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> List[List[jnp.ndarray]]:
        outs = []
        cur = x
        for i in range(self.num_d):
            outs.append(NLayerDiscriminator(
                self.ndf, self.n_layers, self.input_nc, dtype=self.dtype,
                name=f'scale_{i}')(cur))
            if i != self.num_d - 1:
                # count_include_pad=False avg pool, stride 2, k3
                cur = nn.avg_pool(cur, (3, 3), strides=(2, 2),
                                  padding=((1, 1), (1, 1)),
                                  count_include_pad=False)
        return outs


_VGG19_CFG = [64, 64, 'M', 128, 128, 'M', 256, 256, 256, 256, 'M',
              512, 512, 512, 512, 'M', 512, 512, 512, 512]
# slice boundaries in conv-index space matching torchvision feature indices
# 2 / 7 / 12 / 21 / 30 (ref: architecture.py:130-139)
_SLICE_AFTER_CONV = [1, 3, 5, 9, 13]


class VGG19Features(nn.Module):
    """VGG19 up to relu5_2, returning the five perceptual-loss slices."""
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        slices = []
        conv_idx = 0
        h = x
        for v in _VGG19_CFG:
            if v == 'M':
                h = nn.max_pool(h, (2, 2), strides=(2, 2))
                continue
            h = TorchConv(v, 3, 1, 1, dtype=self.dtype,
                          name=f'conv_{conv_idx}')(h)
            h = nn.relu(h)
            conv_idx += 1
            if conv_idx in _SLICE_AFTER_CONV:
                slices.append(h)
            if len(slices) == 5:
                break
        return slices


def vgg_preprocess(img_m11: jnp.ndarray) -> jnp.ndarray:
    """[-1,1] NHWC -> ImageNet-normalised input for VGG19Features."""
    mean = jnp.asarray([0.485, 0.456, 0.406])
    std = jnp.asarray([0.229, 0.224, 0.225])
    return ((img_m11 + 1.0) / 2.0 - mean) / std


def convert_vgg19(sd) -> dict:
    """torchvision vgg19().features state dict -> VGG19Features params."""
    from ctrlhair_tpu.convert.torch_import import conv_kernel, _np
    params = {}
    conv_idx = 0
    feat_idx = 0
    for v in _VGG19_CFG:
        if conv_idx >= max(_SLICE_AFTER_CONV):   # model stops at relu5_2
            break
        if v == 'M':
            feat_idx += 1
            continue
        params[f'conv_{conv_idx}'] = {'conv': {
            'kernel': conv_kernel(sd[f'{feat_idx}.weight']),
            'bias': _np(sd[f'{feat_idx}.bias'])}}
        conv_idx += 1
        feat_idx += 2  # conv + relu
    return {'params': params}
