# Color & texture branch: EigenGAN generator, encoder-discriminator,
# latent-prior discriminator, and the frozen supervised predictors.
#
# Parity targets: color_texture_branch/model_eigengan.py:14-89,
# color_texture_branch/model.py:52-159, predictor/predictor_model.py:14-41.
# All models are small MLPs over the 512-d SEAN hair code — they batch
# trivially, so every entry point is written for [N, ...] and vmaps further.

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ctrlhair_tpu.config import ColorTextureConfig, PredictorConfig
from ctrlhair_tpu.models.layers import ACTIVATIONS, LinearBlock, MLP

Dtype = Any


class SubspaceLayer(nn.Module):
    """Orthogonal subspace projection (ref: model_eigengan.py:14-31)."""
    dim: int
    n_basis: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        u = self.param('U', nn.initializers.orthogonal(),
                       (self.n_basis, self.dim))
        l = self.param(
            'L', lambda key, shape: jnp.asarray(
                [3.0 * i for i in range(self.n_basis, 0, -1)], jnp.float32),
            (self.n_basis,))
        mu = self.param('mu', nn.initializers.zeros, (self.dim,))
        return (l.astype(self.dtype) * z) @ u.astype(self.dtype) \
            + mu.astype(self.dtype)

    @staticmethod
    def orthogonal_regularizer(u: jnp.ndarray) -> jnp.ndarray:
        uut = u @ u.T
        eye = jnp.eye(u.shape[0], dtype=u.dtype)
        return jnp.mean((uut - eye) ** 2)


class EigenGenerator(nn.Module):
    """Condition MLP with per-layer subspace noise injection
    (ref: model_eigengan.py:34-89)."""
    cfg: ColorTextureConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, data: Mapping[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        cfg = self.cfg
        noise = data['noise'].reshape(
            -1, cfg.g_hidden_layer_num, cfg.subspace_dim).astype(self.dtype)
        conds = []
        if cfg.use_curliness:
            conds.append(data['noise_curliness'])
        if cfg.use_rgb_cond:
            conds.append(data['rgb_mean'])
        if cfg.use_pca_std_cond:
            conds.append(data['pca_std'])
        x = jnp.concatenate(conds, axis=-1).astype(self.dtype)
        x = nn.Dense(cfg.g_hidden_dim, dtype=self.dtype, name='main_in')(x)
        for i in range(cfg.g_hidden_layer_num):
            sub = SubspaceLayer(cfg.g_hidden_dim, cfg.subspace_dim,
                                dtype=self.dtype, name=f'subspace_{i}')
            x = x + sub(noise[:, i, :])
            out_dim = (cfg.style_dim if i == cfg.g_hidden_layer_num - 1
                       else cfg.g_hidden_dim)
            x = nn.Dense(out_dim, dtype=self.dtype,
                         name=f'main_mid_{i}')(nn.leaky_relu(x, 0.2))
        return {'code': x}

    def orthogonal_loss(self, params) -> jnp.ndarray:
        loss = 0.0
        for i in range(self.cfg.g_hidden_layer_num):
            u = params['params'][f'subspace_{i}']['U']
            loss = loss + SubspaceLayer.orthogonal_regularizer(u)
        return loss


class MLPGenerator(nn.Module):
    """Plain MLP alternative generator (ref: model.py:52-83)."""
    cfg: ColorTextureConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, data: Mapping[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        cfg = self.cfg
        parts = [data['noise']]
        if cfg.use_curliness:
            parts.append(data['noise_curliness'])
        if cfg.use_rgb_cond:
            parts.append(data['rgb_mean'])
        if cfg.use_pca_std_cond:
            parts.append(data['pca_std'])
        x = jnp.concatenate(parts, axis=-1).astype(self.dtype)
        for i in range(cfg.g_hidden_layer_num):
            x = LinearBlock(cfg.g_hidden_dim, cfg.g_norm, cfg.g_activ,
                            dtype=self.dtype, name=f'layer_{i}')(x)
        x = LinearBlock(cfg.style_dim, 'none', 'none', dtype=self.dtype,
                        name='head')(x)
        return {'code': x}


class CTDiscriminator(nn.Module):
    """Adversarial head + latent decoder over SEAN codes (ref: model.py:86-130).

    Doubles as the inference-time encoder: noise (texture) and
    noise_curliness are read off its output slices (ref: ui/backend.py:103-105).
    """
    cfg: ColorTextureConfig
    train: bool = False
    dtype: Dtype = jnp.float32

    def _out_dim(self) -> int:
        # Mirrors the reference head-width formula EXACTLY, quirks included
        # (ref: model.py:98-105): the rgb +3 is gated on the CURLINESS
        # predictor, and the pca_std +1 is ungated — with an external rgb
        # predictor that unit dangles (never sliced in forward).  Head shape
        # must match for checkpoint conversion.
        cfg = self.cfg
        dim = 1 + cfg.noise_dim
        if cfg.use_rgb_cond and not cfg.external_curliness_predictor:
            dim += 3
        if cfg.use_pca_std_cond:
            dim += 1
        if cfg.use_curliness:
            dim += cfg.curliness_dim
            if not cfg.external_curliness_predictor:
                dim += 1
        return dim

    @nn.compact
    def __call__(self, data: Mapping[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        cfg = self.cfg
        out = MLP(cfg.d_hidden_dim, cfg.d_hidden_layer_num, self._out_dim(),
                  norm=cfg.d_norm, activation=cfg.d_activ, train=self.train,
                  dtype=self.dtype, name='net')(
            data['code'].astype(self.dtype))
        res = {'adv': out[:, :1]}
        ptr = 1
        res['noise'] = out[:, ptr:ptr + cfg.noise_dim]
        ptr += cfg.noise_dim
        if cfg.use_curliness:
            res['noise_curliness'] = out[:, ptr:ptr + cfg.curliness_dim]
            ptr += cfg.curliness_dim
            if not cfg.external_curliness_predictor:
                res['cls_curliness'] = out[:, ptr:ptr + 1]
                ptr += 1
        if cfg.use_rgb_cond and not cfg.external_rgb_predictor:
            res['rgb_mean'] = out[:, ptr:ptr + 3]
            ptr += 3
        if cfg.use_pca_std_cond and not cfg.external_rgb_predictor:
            res['pca_std'] = out[:, ptr:ptr + 1]
            ptr += 1
        return res


class CTDiscriminatorNoise(nn.Module):
    """Latent-prior discriminator on (noise, curliness) (ref: model.py:133-159)."""
    cfg: ColorTextureConfig
    train: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, data: Mapping[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        cfg = self.cfg
        x = data['noise']
        if cfg.use_curliness:
            x = jnp.concatenate([x, data['noise_curliness']], axis=-1)
        out = MLP(cfg.d_hidden_dim, cfg.d_noise_hidden_layer_num, 1,
                  norm=cfg.d_norm, activation=cfg.d_activ, train=self.train,
                  dtype=self.dtype, name='net')(x.astype(self.dtype))
        return {'adv': out[:, :1]}


class Predictor(nn.Module):
    """Frozen supervised readout of curliness / colour stats
    (ref: predictor/predictor_model.py:14-41)."""
    cfg: PredictorConfig
    train: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, data: Mapping[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        cfg = self.cfg
        out_dim = sum(cfg.predict_dict.values())
        out = MLP(cfg.hidden_dim, cfg.hidden_layer_num, out_dim,
                  norm=cfg.norm, activation=cfg.activ, dropout=cfg.dropout,
                  train=self.train, dtype=self.dtype, name='net')(
            data['code'].astype(self.dtype))
        res, ptr = {}, 0
        for key, dim in cfg.predict_dict.items():
            res[key] = out[:, ptr:ptr + dim]
            ptr += dim
        return res


def make_generator(cfg: ColorTextureConfig, dtype=jnp.float32):
    if cfg.gen_mode == 'eigengan':
        return EigenGenerator(cfg, dtype=dtype)
    return MLPGenerator(cfg, dtype=dtype)
