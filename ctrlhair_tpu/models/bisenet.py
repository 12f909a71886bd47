# BiSeNet face parser — TPU-native JAX implementation.
#
# Architecture parity with the reference parser (ref:
# external_code/face_parsing/model.py:230-254, resnet.py:58-80): ResNet-18
# context path, attention-refinement modules, feature fusion, 19-class output
# at 512x512 upsampled bilinearly with align_corners=True.  The vendored
# InPlaceABN CUDA kernels (ref: face_parsing/modules/) are training-only in
# the reference and are replaced here by standard BatchNorm; XLA fuses the
# BN+ReLU into the convs, which is the whole point of inplace-abn anyway.

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from ctrlhair_tpu.config import BiSeNetConfig
from ctrlhair_tpu.ops.resize import resize_bilinear_nhwc

Dtype = Any


class ConvBNReLU(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    pad: int = 1
    train: bool = False
    axis_name: Any = None    # cross-replica sync-BN under shard_map
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.pad:
            x = jnp.pad(x, ((0, 0), (self.pad, self.pad),
                            (self.pad, self.pad), (0, 0)))
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride), padding='VALID',
                    use_bias=False, dtype=self.dtype, name='conv')(x)
        x = nn.BatchNorm(use_running_average=not self.train,
                     axis_name=self.axis_name, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name='bn')(x)
        return nn.relu(x)


class BasicBlock(nn.Module):
    features: int
    stride: int = 1
    train: bool = False
    axis_name: Any = None    # cross-replica sync-BN under shard_map
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        residual = ConvBNReLU(self.features, 3, self.stride, 1,
                              train=self.train, axis_name=self.axis_name, dtype=self.dtype,
                              name='cbr1')(x)
        residual = jnp.pad(residual, ((0, 0), (1, 1), (1, 1), (0, 0)))
        residual = nn.Conv(self.features, (3, 3), padding='VALID',
                           use_bias=False, dtype=self.dtype,
                           name='conv2')(residual)
        residual = nn.BatchNorm(use_running_average=not self.train,
                     axis_name=self.axis_name,
                                momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                                name='bn2')(residual)
        shortcut = x
        if x.shape[-1] != self.features or self.stride != 1:
            shortcut = nn.Conv(self.features, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype,
                               name='down_conv')(x)
            shortcut = nn.BatchNorm(use_running_average=not self.train,
                     axis_name=self.axis_name,
                                    momentum=0.9, epsilon=1e-5,
                                    dtype=self.dtype, name='down_bn')(shortcut)
        return nn.relu(shortcut + residual)


class ResNet18(nn.Module):
    """Backbone returning 1/8, 1/16, 1/32 features (ref: resnet.py:58-80)."""
    train: bool = False
    axis_name: Any = None    # cross-replica sync-BN under shard_map
    blocks_per_stage: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)))
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding='VALID',
                    use_bias=False, dtype=self.dtype, name='conv1')(x)
        x = nn.BatchNorm(use_running_average=not self.train,
                     axis_name=self.axis_name, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name='bn1')(x)
        x = nn.relu(x)
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                    constant_values=-jnp.inf)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding='VALID')
        for i, (feats, stride) in enumerate(
                [(64, 1), (128, 2), (256, 2), (512, 2)]):
            for j in range(self.blocks_per_stage):
                x = BasicBlock(feats, stride if j == 0 else 1,
                               train=self.train, axis_name=self.axis_name, dtype=self.dtype,
                               name=f'layer{i + 1}_{j}')(x)
            if feats == 128:
                feat8 = x
            elif feats == 256:
                feat16 = x
        return feat8, feat16, x


class AttentionRefinement(nn.Module):
    features: int
    train: bool = False
    axis_name: Any = None    # cross-replica sync-BN under shard_map
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        feat = ConvBNReLU(self.features, 3, 1, 1, train=self.train,
                          axis_name=self.axis_name,
                          dtype=self.dtype, name='conv')(x)
        atten = jnp.mean(feat, axis=(1, 2), keepdims=True)
        atten = nn.Conv(self.features, (1, 1), use_bias=False,
                        dtype=self.dtype, name='conv_atten')(atten)
        atten = nn.BatchNorm(use_running_average=not self.train,
                     axis_name=self.axis_name, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype,
                             name='bn_atten')(atten)
        return feat * nn.sigmoid(atten)


class FeatureFusion(nn.Module):
    features: int
    train: bool = False
    axis_name: Any = None    # cross-replica sync-BN under shard_map
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, fsp, fcp):
        fcat = jnp.concatenate([fsp, fcp], axis=-1)
        feat = ConvBNReLU(self.features, 1, 1, 0, train=self.train,
                          axis_name=self.axis_name,
                          dtype=self.dtype, name='convblk')(fcat)
        atten = jnp.mean(feat, axis=(1, 2), keepdims=True)
        atten = nn.Conv(self.features // 4, (1, 1), use_bias=False,
                        dtype=self.dtype, name='conv1')(atten)
        atten = nn.relu(atten)
        atten = nn.Conv(self.features, (1, 1), use_bias=False,
                        dtype=self.dtype, name='conv2')(atten)
        atten = nn.sigmoid(atten)
        return feat * atten + feat


class BiSeNetOutput(nn.Module):
    mid: int
    n_classes: int
    train: bool = False
    axis_name: Any = None    # cross-replica sync-BN under shard_map
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = ConvBNReLU(self.mid, 3, 1, 1, train=self.train, axis_name=self.axis_name, dtype=self.dtype,
                       name='conv')(x)
        return nn.Conv(self.n_classes, (1, 1), use_bias=False,
                       dtype=self.dtype, name='conv_out')(x)


class BiSeNet(nn.Module):
    cfg: BiSeNetConfig
    train: bool = False
    # emit the two auxiliary supervision heads (ref: model.py:237-238,
    # 248-253); inference needs only the main head
    return_aux: bool = False
    axis_name: Any = None    # cross-replica sync-BN under shard_map
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: [N, H, W, 3], ImageNet-normalised. Returns [N, H, W, n_classes]
        main-head logits, or (main, aux16, aux32) when return_aux."""
        h, w = x.shape[1:3]
        feat8, feat16, feat32 = ResNet18(
            train=self.train, axis_name=self.axis_name,
            blocks_per_stage=self.cfg.blocks_per_stage, dtype=self.dtype,
            name='resnet')(x)
        avg = jnp.mean(feat32, axis=(1, 2), keepdims=True)
        avg = ConvBNReLU(128, 1, 1, 0, train=self.train, axis_name=self.axis_name, dtype=self.dtype,
                         name='conv_avg')(avg)
        avg_up = jnp.broadcast_to(
            avg, (avg.shape[0],) + feat32.shape[1:3] + (128,))
        f32 = AttentionRefinement(128, train=self.train, axis_name=self.axis_name, dtype=self.dtype,
                                  name='arm32')(feat32) + avg_up
        f32_up = _nearest_up(f32, feat16.shape[1:3])  # ref uses mode='nearest'
        f32_up = ConvBNReLU(128, 3, 1, 1, train=self.train, axis_name=self.axis_name, dtype=self.dtype,
                            name='conv_head32')(f32_up)
        f16 = AttentionRefinement(128, train=self.train, axis_name=self.axis_name, dtype=self.dtype,
                                  name='arm16')(feat16) + f32_up
        f16_up = _nearest_up(f16, feat8.shape[1:3])
        f16_up = ConvBNReLU(128, 3, 1, 1, train=self.train, axis_name=self.axis_name, dtype=self.dtype,
                            name='conv_head16')(f16_up)
        fuse = FeatureFusion(256, train=self.train, axis_name=self.axis_name, dtype=self.dtype,
                             name='ffm')(feat8, f16_up)
        out = BiSeNetOutput(256, self.cfg.n_classes, train=self.train,
                            axis_name=self.axis_name,
                            dtype=self.dtype, name='conv_out')(fuse)
        out = resize_bilinear_nhwc(out.astype(jnp.float32), (h, w),
                                   align_corners=True)
        if self.return_aux:
            aux16 = BiSeNetOutput(64, self.cfg.n_classes, train=self.train,
                                  axis_name=self.axis_name,
                                  dtype=self.dtype, name='conv_out16')(f16_up)
            aux32 = BiSeNetOutput(64, self.cfg.n_classes, train=self.train,
                                  axis_name=self.axis_name,
                                  dtype=self.dtype, name='conv_out32')(f32_up)
            aux16 = resize_bilinear_nhwc(aux16.astype(jnp.float32), (h, w),
                                         align_corners=True)
            aux32 = resize_bilinear_nhwc(aux32.astype(jnp.float32), (h, w),
                                         align_corners=True)
            return out, aux16, aux32
        return out


def _nearest_up(x, out_hw):
    from ctrlhair_tpu.ops.resize import resize_nearest_nhwc
    return resize_nearest_nhwc(x, out_hw)


IMAGENET_MEAN = jnp.array([0.485, 0.456, 0.406], jnp.float32)
IMAGENET_STD = jnp.array([0.229, 0.224, 0.225], jnp.float32)


def normalize_imagenet(img01: jnp.ndarray) -> jnp.ndarray:
    """[0,1] float RGB -> ImageNet-normalised (ref: my_parsing_util.py:25-28)."""
    return (img01 - IMAGENET_MEAN) / IMAGENET_STD
