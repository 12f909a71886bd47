# Binary morphology with cv2-elliptical structuring elements, as XLA convs.
#
# The reference dilates hair masks with cv2 ellipse kernels on the host
# (ref: hair_editor.py:296-305, get_hair_color erosion :240-241).  Here the
# kernel is a static constant and dilate/erode are a single conv + compare —
# fused by XLA, batched, differentiable-free.

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def ellipse_kernel(ksize: int) -> np.ndarray:
    """cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (ksize, ksize)).

    Reproduces OpenCV's scan-line ellipse fill: for each row dy, the filled
    half-width is round(c * sqrt(1 - dy^2/r^2)) with the same special-casing
    of the centre row.  Verified bit-exact against cv2 in tests.
    """
    r = c = ksize // 2
    inv_r2 = 1.0 / (r * r) if r > 0 else 0.0
    kernel = np.zeros((ksize, ksize), np.float32)
    for i in range(ksize):
        j1, j2 = 0, 0
        dy = i - r
        if abs(dy) <= r:
            if dy == 0:
                dx = c
            else:
                dx = int(round(c * np.sqrt(max(0.0, 1.0 - dy * dy * inv_r2))))
            j1 = max(c - dx, 0)
            j2 = min(c + dx + 1, ksize)
            kernel[i, j1:j2] = 1.0
    return kernel


def _conv2d_same(x: jnp.ndarray, kernel: np.ndarray) -> jnp.ndarray:
    """[..., H, W] (x) static [k, k] -> same-size correlation, zero padded."""
    k = jnp.asarray(kernel, jnp.float32)
    batch_shape = x.shape[:-2]
    h, w = x.shape[-2:]
    xx = x.reshape((-1, 1) + (h, w)).astype(jnp.float32)
    out = jax.lax.conv_general_dilated(
        xx, k[None, None], window_strides=(1, 1),
        padding=[(kernel.shape[0] // 2,) * 2, (kernel.shape[1] // 2,) * 2],
        dimension_numbers=('NCHW', 'OIHW', 'NCHW'))
    return out.reshape(batch_shape + (h, w))


def dilate(mask: jnp.ndarray, ksize: int, iterations: int = 1) -> jnp.ndarray:
    """Binary dilation of [..., H, W] {0,1} mask with an ellipse kernel."""
    kernel = ellipse_kernel(ksize)
    out = mask.astype(jnp.float32)
    for _ in range(iterations):
        out = (_conv2d_same(out, kernel) > 0).astype(jnp.float32)
    return out


def erode(mask: jnp.ndarray, ksize: int, iterations: int = 1) -> jnp.ndarray:
    """Binary erosion of [..., H, W] {0,1} mask with an ellipse kernel."""
    kernel = ellipse_kernel(ksize)
    ksum = kernel.sum()
    out = mask.astype(jnp.float32)
    for _ in range(iterations):
        out = (_conv2d_same(out, kernel) >= ksum - 0.5).astype(jnp.float32)
    return out
