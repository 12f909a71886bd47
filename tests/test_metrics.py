# SSIM / PSNR sanity + cross-check against scipy-based reference math.
import numpy as np
import pytest

import jax.numpy as jnp

from ctrlhair_tpu.utils.metrics import batch_ssim, psnr, ssim


def test_ssim_identity(rng):
    img = rng.uniform(0, 255, (64, 64, 3)).astype(np.float32)
    assert abs(float(ssim(jnp.asarray(img), jnp.asarray(img))) - 1.0) < 1e-6


def test_ssim_decreases_with_noise(rng):
    img = rng.uniform(0, 255, (64, 64, 3)).astype(np.float32)
    s = []
    for sigma in (1, 10, 50):
        noisy = img + rng.standard_normal(img.shape).astype(np.float32) * sigma
        s.append(float(ssim(jnp.asarray(img), jnp.asarray(noisy))))
    assert s[0] > s[1] > s[2]
    assert s[0] > 0.95


def test_ssim_matches_skimage_formula(rng):
    # independent numpy implementation of the same Wang et al. formula
    import scipy.ndimage
    a = rng.uniform(0, 255, (48, 48, 1)).astype(np.float64)
    b = (a + rng.standard_normal(a.shape) * 12).astype(np.float64)

    x = np.arange(11) - 5.0
    g = np.exp(-(x ** 2) / (2 * 1.5 ** 2))
    g /= g.sum()
    win = np.outer(g, g)

    def f(img):
        return scipy.ndimage.correlate(img[..., 0], win)[5:-5, 5:-5]

    c1, c2 = (0.01 * 255) ** 2, (0.03 * 255) ** 2
    mu_a, mu_b = f(a), f(b)
    s_aa = f(a * a) - mu_a ** 2
    s_bb = f(b * b) - mu_b ** 2
    s_ab = f(a * b) - mu_a * mu_b
    expected = np.mean(((2 * mu_a * mu_b + c1) * (2 * s_ab + c2))
                       / ((mu_a ** 2 + mu_b ** 2 + c1)
                          * (s_aa + s_bb + c2)))
    got = float(ssim(jnp.asarray(a, jnp.float32), jnp.asarray(b, jnp.float32)))
    assert abs(got - expected) < 1e-3


def test_psnr(rng):
    img = rng.uniform(0, 255, (32, 32, 3)).astype(np.float32)
    assert float(psnr(jnp.asarray(img), jnp.asarray(img))) > 100
    noisy = img + 10
    expected = 10 * np.log10(255 ** 2 / 100)
    assert abs(float(psnr(jnp.asarray(img), jnp.asarray(noisy)))
               - expected) < 0.1


def test_batch_ssim(rng):
    a = jnp.asarray(rng.uniform(0, 255, (3, 32, 32, 3)).astype(np.float32))
    out = batch_ssim(a, a)
    np.testing.assert_allclose(np.asarray(out), 1.0, atol=1e-6)
