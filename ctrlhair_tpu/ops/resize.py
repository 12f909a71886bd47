# Resize kernels with explicitly-controlled sampling conventions.
#
# The reference mixes cv2.resize (INTER_NEAREST / INTER_LINEAR with half-pixel
# centres) and torch F.interpolate (asymmetric 'nearest', bilinear with
# align_corners=True for the parser head).  Pixel-fidelity against the
# reference requires reproducing each convention exactly, so every function
# here names its convention.  All functions are jit/vmap friendly gathers with
# static output shapes.

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _src_index_nearest(dst_size: int, src_size: int) -> jnp.ndarray:
    # torch 'nearest' & cv2 INTER_NEAREST: src = floor(i * scale)
    scale = src_size / dst_size
    idx = jnp.floor(jnp.arange(dst_size, dtype=jnp.float32) * scale)
    return jnp.clip(idx.astype(jnp.int32), 0, src_size - 1)


def resize_nearest(img: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """Nearest resize matching cv2.INTER_NEAREST / torch 'nearest'.

    img: [..., H, W] or [..., H, W, C] — the two trailing-or-channel layouts
    are disambiguated by `channels_last`: here we resize the LAST TWO spatial
    dims if img.ndim >= 3 and img.shape[-1] <= 32 is NOT assumed; callers pass
    spatial-last arrays [..., H, W] or NHWC via resize_nearest_nhwc.

    Integer-factor downscales take a strided-slice fast path (floor(i*f)
    == i*f exactly there) — a layout op instead of a TPU gather.
    """
    h, w = out_hw
    h_in, w_in = img.shape[-2], img.shape[-1]
    if h_in % h == 0 and w_in % w == 0 and h <= h_in and w <= w_in:
        return img[..., ::h_in // h, ::w_in // w]
    iy = _src_index_nearest(h, img.shape[-2])
    ix = _src_index_nearest(w, img.shape[-1])
    return img[..., iy[:, None], ix[None, :]]


def resize_nearest_nhwc(img: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """Nearest resize for [..., H, W, C] arrays.

    Integer upscaling factors take the broadcast fast path (floor(i*s/d)
    == i // factor there), which is a layout op instead of a TPU gather.
    """
    h, w = out_hw
    h_in, w_in = img.shape[-3], img.shape[-2]
    if h % h_in == 0 and w % w_in == 0 and h >= h_in and w >= w_in:
        fy, fx = h // h_in, w // w_in
        lead = img.shape[:-3]
        x = jnp.broadcast_to(
            img[..., :, None, :, None, :],
            lead + (h_in, fy, w_in, fx, img.shape[-1]))
        return x.reshape(lead + (h, w, img.shape[-1]))
    iy = _src_index_nearest(h, img.shape[-3])
    ix = _src_index_nearest(w, img.shape[-2])
    return img[..., iy[:, None], ix[None, :], :]


def _linear_weights(dst_size: int, src_size: int, align_corners: bool):
    if align_corners and dst_size > 1:
        src = jnp.arange(dst_size, dtype=jnp.float32) * (
            (src_size - 1) / (dst_size - 1))
    else:
        scale = src_size / dst_size
        src = (jnp.arange(dst_size, dtype=jnp.float32) + 0.5) * scale - 0.5
    i0 = jnp.clip(jnp.floor(src), 0, src_size - 1)
    frac = jnp.clip(src - i0, 0.0, 1.0)
    i0 = i0.astype(jnp.int32)
    i1 = jnp.clip(i0 + 1, 0, src_size - 1)
    return i0, i1, frac


def _linear_matrix(dst_size: int, src_size: int,
                   align_corners: bool) -> jnp.ndarray:
    """[dst, src] interpolation-weight matrix for one separable axis."""
    i0, i1, frac = _linear_weights(dst_size, src_size, align_corners)
    rows = jnp.arange(dst_size)
    mat = jnp.zeros((dst_size, src_size), jnp.float32)
    mat = mat.at[rows, i0].add(1.0 - frac)
    mat = mat.at[rows, i1].add(frac)
    return mat


def resize_bilinear_nhwc(img: jnp.ndarray, out_hw: tuple[int, int],
                         align_corners: bool = False) -> jnp.ndarray:
    """Bilinear resize for [..., H, W, C].

    align_corners=False matches cv2.INTER_LINEAR / torch default;
    align_corners=True matches the BiSeNet output upsample
    (ref: external_code/face_parsing/model.py:251-253).
    Implemented as two separable weight matmuls — MXU work instead of the
    fancy-indexed gathers that crawl on TPU (HIGHEST precision keeps the
    interpolation exact in f32).
    """
    h, w = out_hw
    wy = _linear_matrix(h, img.shape[-3], align_corners)
    wx = _linear_matrix(w, img.shape[-2], align_corners)
    dtype = img.dtype if jnp.issubdtype(img.dtype, jnp.floating) \
        else jnp.float32
    x = img.astype(dtype)
    x = jnp.einsum('oh,...hwc->...owc', wy.astype(dtype), x,
                   precision=jax.lax.Precision.HIGHEST)
    x = jnp.einsum('pw,...owc->...opc', wx.astype(dtype), x,
                   precision=jax.lax.Precision.HIGHEST)
    return x


def upsample2x_nearest_nhwc(x: jnp.ndarray) -> jnp.ndarray:
    """2x nearest upsample (torch nn.Upsample(scale_factor=2)).

    Implemented as reshape-broadcast; XLA lowers this to a cheap layout op.
    """
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c))
    return x.reshape(n, h * 2, w * 2, c)


@functools.partial(jax.jit, static_argnums=(1,))
def downsample_label_pyramid(label: jnp.ndarray, sizes: tuple[int, ...]):
    """Nearest-downsample a [N, H, W] integer label map to each size in sizes.

    Equivalent to F.interpolate(one_hot, size, mode='nearest') done on labels:
    nearest of a one-hot mask == one-hot of nearest labels.
    (ref hot path: sean_codes/models/networks/normalization.py:115)
    """
    return tuple(resize_nearest(label, (s, s)) for s in sizes)
