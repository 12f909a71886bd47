# Shape branch: hair-mask VAE-GAN (TPU-native).
#
# Parity target: shape_branch/model.py (MaskEncoder :69-113, MaskDecoder
# :116-143, Generator :146-199, Discriminator :202-214, DiscriminatorNoise
# :217-232).  Differences from the reference are deliberate TPU choices:
#   * the 40-channel Fourier positional encoding is a precomputed constant
#     baked at trace time (no device-side buffer shuffling),
#   * VAE resampling takes an explicit rng,
#   * everything is NHWC and jit/vmap friendly.

from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ctrlhair_tpu.config import ShapeConfig
from ctrlhair_tpu.models.layers import ConvBlock, LinearBlock, MLP

Dtype = Any


def fourier_pos_encoding(img_size: int, order: int = 10) -> np.ndarray:
    """[H, W, 4*order] sin/cos positional grid (ref: shape_branch/model.py:18-30).

    Channel order matches the reference reshape: sin block then cos block,
    each (order, 2[meshgrid xy]) flattened row-major.
    """
    coords = np.linspace(0, 1, img_size, endpoint=False)
    xx, yy = np.meshgrid(coords, coords)          # both [H, W]
    bi = np.stack([xx, yy], 0)[None]              # [1, 2, H, W]
    freqs = (2.0 ** np.arange(order)) * math.pi   # [order]
    freqs = freqs[:, None, None, None]
    gamma = np.concatenate([np.sin(freqs * bi), np.cos(freqs * bi)], 0)
    gamma = gamma.reshape(-1, img_size, img_size)  # [4*order, H, W]
    return np.transpose(gamma, (1, 2, 0)).astype(np.float32)


class MaskEncoder(nn.Module):
    """Strided conv encoder over (mask ++ pos-encoding) channels."""
    cfg: ShapeConfig
    out_dim: int
    norm: str
    vae: bool = False
    hidden_in_channel: int = 32
    train: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, mask: jnp.ndarray):
        cfg = self.cfg
        pos = jnp.asarray(
            fourier_pos_encoding(mask.shape[1], cfg.pos_encoding_order),
            self.dtype)
        pos = jnp.broadcast_to(pos[None], (mask.shape[0],) + pos.shape)
        x = jnp.concatenate([mask.astype(self.dtype), pos], axis=-1)
        for i in range(cfg.layer_num):
            ch = min(cfg.max_channel, 2 ** i * self.hidden_in_channel)
            x = ConvBlock(ch, 4, 2, 1, norm=self.norm, activation='lrelu',
                          train=self.train, dtype=self.dtype,
                          name=f'down_{i}')(x)
        x = x.reshape(x.shape[0], -1)
        mean = LinearBlock(self.out_dim, 'none', 'none', dtype=self.dtype,
                           name='out')(x)
        if self.vae:
            std = jnp.abs(LinearBlock(self.out_dim, 'none', 'none',
                                      dtype=self.dtype, name='std_out')(x))
            return mean, std
        return mean, None


class MaskDecoder(nn.Module):
    """Linear -> reshape -> (nearest-up + conv) stack (ref model.py:116-143)."""
    cfg: ShapeConfig
    out_channels: int
    norm: str
    train: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, code: jnp.ndarray):
        cfg = self.cfg
        in_ch = min(32 * 2 ** cfg.layer_num, cfg.max_channel)
        s = cfg.img_size // (2 ** cfg.layer_num)
        x = LinearBlock(in_ch * s * s, 'none', 'none', dtype=self.dtype,
                        name='in_layer')(code)
        x = x.reshape(-1, s, s, in_ch)
        from ctrlhair_tpu.ops.resize import upsample2x_nearest_nhwc
        for i in range(cfg.layer_num):
            x = upsample2x_nearest_nhwc(x)
            ch = min(32 * 2 ** (cfg.layer_num - 1 - i), cfg.max_channel)
            x = ConvBlock(ch, 3, 1, 1, norm=self.norm, activation='lrelu',
                          train=self.train, dtype=self.dtype,
                          name=f'up_{i}')(x)
        return ConvBlock(self.out_channels, 3, 1, 1, norm='none',
                         activation='none', dtype=self.dtype, name='out')(x)


class ShapeGenerator(nn.Module):
    """Hair VAE encoder + face encoder + paired decoders (ref model.py:146-199)."""
    cfg: ShapeConfig
    train: bool = False
    dtype: Dtype = jnp.float32

    def setup(self):
        cfg = self.cfg
        self.hair_encoder = MaskEncoder(cfg, cfg.hair_dim, cfg.g_norm,
                                        vae=cfg.vae_hair_mode,
                                        hidden_in_channel=cfg.hidden_in_channel,
                                        train=self.train, dtype=self.dtype)
        self.face_encoder = MaskEncoder(cfg, cfg.face_dim, cfg.g_norm,
                                        vae=False,
                                        hidden_in_channel=cfg.hidden_in_channel,
                                        train=self.train, dtype=self.dtype)
        self.hair_decoder = MaskDecoder(cfg, 1, cfg.g_norm, train=self.train,
                                        dtype=self.dtype)
        self.face_decoder = MaskDecoder(cfg, 18, cfg.g_norm, train=self.train,
                                        dtype=self.dtype)

    def encode_hair(self, hair: jnp.ndarray,
                    rng: Optional[jax.Array] = None):
        """Returns (sample, mean, std); sample == mean when rng is None."""
        mean, std = self.hair_encoder(hair)
        if std is None:
            return mean, mean, None
        if rng is None:
            return mean, mean, std
        z = jax.random.normal(rng, mean.shape, mean.dtype)
        return z * std + mean, mean, std

    def encode_face(self, face: jnp.ndarray) -> jnp.ndarray:
        mean, _ = self.face_encoder(face)
        return mean

    def decode_logits(self, hair_code: jnp.ndarray, face_code: jnp.ndarray):
        hair_logit = self.hair_decoder(
            jnp.concatenate([face_code, hair_code], axis=-1))
        face_logit = self.face_decoder(face_code)
        return hair_logit, face_logit

    def merge_logits(self, hair_logit: jnp.ndarray,
                     face_logit: jnp.ndarray) -> jnp.ndarray:
        from ctrlhair_tpu.constants import HAIR_IDX
        logit = jnp.concatenate(
            [face_logit[..., :HAIR_IDX], hair_logit,
             face_logit[..., HAIR_IDX:]], axis=-1)
        return jax.nn.softmax(logit, axis=-1)

    def decode(self, hair_code: jnp.ndarray,
               face_code: jnp.ndarray) -> jnp.ndarray:
        """codes -> [N, H, W, 19] soft mask (ref forward_decode_by_code)."""
        return self.merge_logits(*self.decode_logits(hair_code, face_code))

    def __call__(self, hair: jnp.ndarray, face: jnp.ndarray,
                 rng: Optional[jax.Array] = None):
        code, mean, std = self.encode_hair(hair, rng)
        face_code = self.encode_face(face)
        return self.decode(code, face_code), (code, mean, std, face_code)


class ShapeDiscriminator(nn.Module):
    """19-channel mask -> 1 logit (ref model.py:202-214)."""
    cfg: ShapeConfig
    train: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, mask: jnp.ndarray) -> jnp.ndarray:
        mean, _ = MaskEncoder(self.cfg, 1, self.cfg.d_norm, vae=False,
                              hidden_in_channel=self.cfg.d_hidden_in_channel,
                              train=self.train, dtype=self.dtype,
                              name='dis')(mask)
        return mean


class ShapeDiscriminatorNoise(nn.Module):
    """Latent-prior discriminator on hair codes (ref model.py:217-232)."""
    cfg: ShapeConfig
    train: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, code: jnp.ndarray) -> jnp.ndarray:
        return MLP(self.cfg.d_hidden_dim, self.cfg.d_noise_hidden_layer_num,
                   1, norm='none', activation='lrelu', train=self.train,
                   dtype=self.dtype, name='net')(code)
