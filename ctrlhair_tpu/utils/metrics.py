# Image quality metrics for regression gating (SSIM >= 0.99 criterion,
# BASELINE.md) — jittable, batched.

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    x = np.arange(size) - (size - 1) / 2.0
    g = np.exp(-(x ** 2) / (2 * sigma ** 2))
    g /= g.sum()
    return np.outer(g, g).astype(np.float32)


def _filter2(img: jnp.ndarray, kernel: np.ndarray) -> jnp.ndarray:
    """'valid' 2-D correlation per channel; img [H,W,C]."""
    k = jnp.asarray(kernel)[None, None]
    x = img.transpose(2, 0, 1)[:, None]
    out = jax.lax.conv_general_dilated(
        x, k, (1, 1), 'VALID', dimension_numbers=('NCHW', 'OIHW', 'NCHW'))
    return out[:, 0].transpose(1, 2, 0)


@functools.partial(jax.jit, static_argnames=('data_range',))
def ssim(a: jnp.ndarray, b: jnp.ndarray,
         data_range: float = 255.0) -> jnp.ndarray:
    """Mean SSIM over an [H, W, C] pair (gaussian 11x1.5 window, the
    standard Wang et al. convention used by skimage/scikit gates)."""
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    k = _gaussian_kernel()
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    mu_a = _filter2(a, k)
    mu_b = _filter2(b, k)
    mu_aa = mu_a * mu_a
    mu_bb = mu_b * mu_b
    mu_ab = mu_a * mu_b
    s_aa = _filter2(a * a, k) - mu_aa
    s_bb = _filter2(b * b, k) - mu_bb
    s_ab = _filter2(a * b, k) - mu_ab
    num = (2 * mu_ab + c1) * (2 * s_ab + c2)
    den = (mu_aa + mu_bb + c1) * (s_aa + s_bb + c2)
    return jnp.mean(num / den)


@functools.partial(jax.jit, static_argnames=('data_range',))
def psnr(a: jnp.ndarray, b: jnp.ndarray,
         data_range: float = 255.0) -> jnp.ndarray:
    mse = jnp.mean((a.astype(jnp.float32) - b.astype(jnp.float32)) ** 2)
    return 10.0 * jnp.log10(data_range ** 2 / jnp.maximum(mse, 1e-12))


def batch_ssim(a: jnp.ndarray, b: jnp.ndarray,
               data_range: float = 255.0) -> jnp.ndarray:
    """[N,H,W,C] pairs -> [N] SSIM values."""
    return jax.vmap(lambda x, y: ssim(x, y, data_range=data_range))(a, b)
