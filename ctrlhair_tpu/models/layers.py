# Neural building blocks (flax.linen, NHWC, TPU-first).
#
# Re-designs the reference's layer zoo (ref: my_torchlib/module.py:16-283,
# sean_codes norm helpers) as idiomatic flax modules:
#   * convs use explicit torch-compatible padding so spatial math matches,
#   * instance/layer norms reproduce torch eps/affine conventions,
#   * batch norm is flax BatchNorm with an optional axis_name, which turns it
#     into cross-replica sync-BN via a pmean inside shard_map/pmap — replacing
#     both the reference's SynchronizedBatchNorm pipes
#     (ref: sean_codes/.../sync_batchnorm/batchnorm.py:50-80) and DDP-era
#     InPlaceABNSync with a single collective.
# Activations run in `dtype` (bfloat16 by default at inference); params stay
# float32.

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


def leaky_relu(x, slope: float = 0.2):
    return nn.leaky_relu(x, negative_slope=slope)


ACTIVATIONS = {
    'relu': nn.relu,
    'lrelu': leaky_relu,
    'tanh': jnp.tanh,
    'sigmoid': nn.sigmoid,
    'none': lambda x: x,
}


class TorchConv(nn.Module):
    """Conv2d with torch padding semantics: explicit symmetric zero padding.

    kernel layout HWIO; `pad` is the torch `padding` int; `pad_type` supports
    'zero' | 'reflect' (reflect used by the Zencoder,
    ref: sean_codes/.../architecture.py:159-174).
    """
    features: int
    kernel: int = 3
    stride: int = 1
    pad: int = 0
    use_bias: bool = True
    pad_type: str = 'zero'
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.pad > 0:
            mode = {'zero': 'constant', 'reflect': 'reflect'}[self.pad_type]
            x = jnp.pad(
                x, ((0, 0), (self.pad, self.pad), (self.pad, self.pad), (0, 0)),
                mode=mode)
        return nn.Conv(
            self.features, (self.kernel, self.kernel),
            strides=(self.stride, self.stride), padding='VALID',
            use_bias=self.use_bias, dtype=self.dtype,
            kernel_init=nn.initializers.variance_scaling(
                1 / 3, 'fan_in', 'uniform'),  # torch default kaiming-uniform
            name='conv')(x)


class TorchConvTranspose(nn.Module):
    """ConvTranspose matching torch ConvTranspose2d(k, s, padding, output_padding).

    Effective lax padding per dim: (k-1-p, k-1-p+op).
    """
    features: int
    kernel: int = 3
    stride: int = 2
    pad: int = 1
    output_pad: int = 1
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        lo = self.kernel - 1 - self.pad
        hi = self.kernel - 1 - self.pad + self.output_pad
        return nn.ConvTranspose(
            self.features, (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=((lo, hi), (lo, hi)), use_bias=self.use_bias,
            dtype=self.dtype, name='conv')(x)


class InstanceNorm(nn.Module):
    """InstanceNorm2d(affine=False), eps matching torch (1e-5).

    Normalises over spatial dims per sample/channel; NHWC.
    """
    eps: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=(1, 2), keepdims=True)
        var = jnp.var(x32, axis=(1, 2), keepdims=True)
        y = (x32 - mean) * jax.lax.rsqrt(var + self.eps)
        return y.astype(self.dtype)


class SampleLayerNorm(nn.Module):
    """The reference's custom LayerNorm (ref: my_torchlib/module.py:177-205).

    Normalises over the entire sample (all dims but batch) using the UNBIASED
    std and (x-mean)/(std+eps), with per-channel affine.  Used by the shape
    branch (g_norm='ln').
    """
    features: int
    eps: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        gamma = self.param('gamma', nn.initializers.uniform(1.0),
                           (self.features,))
        beta = self.param('beta', nn.initializers.zeros, (self.features,))
        x32 = x.astype(jnp.float32)
        axes = tuple(range(1, x.ndim))
        n = 1
        for a in axes:
            n *= x.shape[a]
        mean = jnp.mean(x32, axis=axes, keepdims=True)
        var = jnp.sum((x32 - mean) ** 2, axis=axes, keepdims=True) / max(n - 1, 1)
        y = (x32 - mean) / (jnp.sqrt(var) + self.eps)
        y = y * gamma + beta
        return y.astype(self.dtype)


class BatchNorm(nn.Module):
    """BatchNorm with running stats; cross-replica when axis_name is set.

    Thin wrapper so call sites can pick affine/sync declaratively.  Replaces
    SynchronizedBatchNorm2d / BatchNorm1d/2d of the reference.
    """
    use_running_average: bool
    affine: bool = True
    axis_name: Optional[str] = None
    momentum: float = 0.9   # torch momentum 0.1 == flax momentum 0.9
    eps: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.BatchNorm(
            use_running_average=self.use_running_average,
            use_bias=self.affine, use_scale=self.affine,
            momentum=self.momentum, epsilon=self.eps, dtype=self.dtype,
            axis_name=self.axis_name, name='bn')(x)


def make_norm(norm: str, features: int, *, train: bool = False,
              axis_name: Optional[str] = None, dtype: Dtype = jnp.float32,
              name: Optional[str] = None, linear: bool = False):
    """Factory mapping the reference's norm strings to modules (or None).

    'ln' differs by block kind in the reference: LinearBlock uses standard
    torch nn.LayerNorm (my_torchlib/module.py:29-30) while Conv2dBlock uses
    the repo's custom sample-wise LayerNorm (std+eps, uniform-init gamma,
    module.py:140-170) — mirror that split via `linear`."""
    if norm == 'none':
        return None
    if norm == 'in':
        return InstanceNorm(dtype=dtype, name=name)
    if norm == 'ln':
        if linear:
            return nn.LayerNorm(epsilon=1e-5, dtype=dtype, name=name)
        return SampleLayerNorm(features, dtype=dtype, name=name)
    if norm == 'bn':
        return BatchNorm(use_running_average=not train, affine=True,
                         axis_name=axis_name, dtype=dtype, name=name)
    raise ValueError(f'unsupported norm: {norm}')


class LinearBlock(nn.Module):
    """fc -> norm -> activation -> dropout (ref: my_torchlib/module.py:16-64)."""
    features: int
    norm: str = 'none'
    activation: str = 'relu'
    use_bias: bool = True
    dropout: float = 0.0
    train: bool = False
    axis_name: Optional[str] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(
            self.features, use_bias=self.use_bias, dtype=self.dtype,
            kernel_init=nn.initializers.variance_scaling(
                1 / 3, 'fan_in', 'uniform'),
            name='fc')(x)
        norm = make_norm(self.norm, self.features, train=self.train,
                         axis_name=self.axis_name, dtype=self.dtype,
                         name='norm', linear=True)
        if norm is not None:
            x = norm(x)
        x = ACTIVATIONS[self.activation](x)
        if self.dropout > 0 and self.train:
            x = nn.Dropout(self.dropout, deterministic=False)(x)
        return x


class ConvBlock(nn.Module):
    """pad -> conv -> norm -> activation (ref: my_torchlib/module.py:67-137)."""
    features: int
    kernel: int
    stride: int
    pad: int = 0
    norm: str = 'none'
    activation: str = 'relu'
    pad_type: str = 'zero'
    use_bias: bool = True
    train: bool = False
    axis_name: Optional[str] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = TorchConv(self.features, self.kernel, self.stride, self.pad,
                      use_bias=self.use_bias, pad_type=self.pad_type,
                      dtype=self.dtype, name='conv')(x)
        norm = make_norm(self.norm, self.features, train=self.train,
                         axis_name=self.axis_name, dtype=self.dtype,
                         name='norm')
        if norm is not None:
            x = norm(x)
        x = ACTIVATIONS[self.activation](x)
        return x


class MLP(nn.Module):
    """Stack of LinearBlocks + a bare linear head, the branch-model staple."""
    hidden_dim: int
    hidden_layers: int
    out_dim: int
    norm: str = 'none'
    activation: str = 'lrelu'
    dropout: float = 0.0
    train: bool = False
    axis_name: Optional[str] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.hidden_layers):
            x = LinearBlock(self.hidden_dim, self.norm, self.activation,
                            dropout=self.dropout, train=self.train,
                            axis_name=self.axis_name, dtype=self.dtype,
                            name=f'layer_{i}')(x)
        return LinearBlock(self.out_dim, 'none', 'none', dtype=self.dtype,
                           name='head')(x)


def spectral_normalize_tree(params, u_tree, n_iter: int = 1):
    """Functional spectral normalisation over a param pytree.

    The reference wraps modules and mutates weights in-place per forward
    (ref: my_torchlib/module.py:226-283, torch spectral_norm on SEAN convs).
    TPU-natively we keep the power-iteration vectors `u` as explicit state and
    return (normalized_params, new_u): apply once per training step before
    model.apply.  `u_tree` must mirror `params` with None for non-normalized
    leaves and a vector for each normalized kernel.
    """
    def norm_leaf(w, u):
        if u is None:
            return w, None
        mat = w.reshape(-1, w.shape[-1]) if w.ndim > 1 else w[None, :]
        # torch reshapes (out, in*k*k); for HWIO kernels, rows=in*k*k is an
        # equally valid sigma estimate (sigma is transpose-invariant).
        for _ in range(n_iter):
            v = mat.T @ u
            v = v / (jnp.linalg.norm(v) + 1e-12)
            u = mat @ v
            u = u / (jnp.linalg.norm(u) + 1e-12)
        sigma = u @ (mat @ v)
        return w / sigma, jax.lax.stop_gradient(u)

    flat_p, tree = jax.tree_util.tree_flatten(params)
    flat_u = jax.tree_util.tree_flatten(
        u_tree, is_leaf=lambda x: x is None)[0]
    out_p, out_u = [], []
    for w, u in zip(flat_p, flat_u):
        nw, nu = norm_leaf(w, u)
        out_p.append(nw)
        out_u.append(nu)
    return (jax.tree_util.tree_unflatten(tree, out_p),
            jax.tree_util.tree_unflatten(tree, out_u))
