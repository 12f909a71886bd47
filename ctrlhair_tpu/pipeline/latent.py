# Latent hair representation as a JAX pytree + pure edit operators.
#
# The reference keeps latents as loose torch tensors on a mutable object
# (ref: ui/backend.py:31-37) and edits them in-place.  Here the latent is a
# flax.struct dataclass — a pytree — so every edit is a pure
# latent -> latent function, and batch editing / interpolation sweeps are
# plain vmaps over stacked latents (BASELINE config 5).

from __future__ import annotations

from typing import Sequence

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from ctrlhair_tpu.constants import (
    CURLINESS_DIM, FACE_DIM, SHAPE_DIM, TEXTURE_DIM)
from ctrlhair_tpu.utils.colorspace import hsv_to_rgb_u8, rgb_to_hsv_u8


@flax.struct.dataclass
class Latent:
    """Disentangled hair latent (ref LatentRepresentation, ui/backend.py:31-37).

    hsv: [N, 3] uint8-range floats; pca_std: [N, 1]; curliness: [N, 1];
    texture: [N, 8]; shape: [N, 16]; face: [N, 1024].
    """
    hsv: jnp.ndarray
    pca_std: jnp.ndarray
    curliness: jnp.ndarray
    texture: jnp.ndarray
    shape: jnp.ndarray
    face: jnp.ndarray

    @classmethod
    def zeros(cls, n: int = 1) -> 'Latent':
        return cls(hsv=jnp.zeros((n, 3)), pca_std=jnp.zeros((n, 1)),
                   curliness=jnp.zeros((n, CURLINESS_DIM)),
                   texture=jnp.zeros((n, TEXTURE_DIM)),
                   shape=jnp.zeros((n, SHAPE_DIM)),
                   face=jnp.zeros((n, FACE_DIM)))

    def rgb_mean(self) -> jnp.ndarray:
        """[N, 3] float RGB decoded from the stored uint8-range HSV."""
        return hsv_to_rgb_u8(self.hsv).astype(jnp.float32)


def set_component(latent: Latent, name: str, value: jnp.ndarray) -> Latent:
    return latent.replace(**{name: value})


def apply_direction(vec: jnp.ndarray, direction: jnp.ndarray,
                    val: jnp.ndarray) -> jnp.ndarray:
    """Move `vec` so its projection on `direction` equals `val`
    (ref: ui/backend.py:450-462)."""
    proj = jnp.einsum('nd,d->n', vec, direction)[:, None]
    return vec + (val - proj) * direction[None, :]


def projection(vec: jnp.ndarray, direction: jnp.ndarray) -> jnp.ndarray:
    return jnp.einsum('nd,d->n', vec, direction)


def interpolate_hsv(hsv1: jnp.ndarray, hsv2: jnp.ndarray,
                    alpha) -> jnp.ndarray:
    """HSV interpolation through RGB space (ref: ui/backend.py:323-332)."""
    rgb1 = hsv_to_rgb_u8(hsv1).astype(jnp.float32)
    rgb2 = hsv_to_rgb_u8(hsv2).astype(jnp.float32)
    rgb = rgb1 * (1 - alpha) + rgb2 * alpha
    return rgb_to_hsv_u8(rgb).astype(jnp.float32)


def interpolate(l1: Latent, l2: Latent, alpha) -> Latent:
    """Full-latent interpolation (ref: ui/backend.py:343-358); `face` is
    taken from l1 as the reference keeps the current face context."""
    lerp = lambda a, b: a * (1 - alpha) + b * alpha
    return Latent(
        hsv=interpolate_hsv(l1.hsv, l2.hsv, alpha),
        pca_std=lerp(l1.pca_std, l2.pca_std),
        curliness=lerp(l1.curliness, l2.curliness),
        texture=lerp(l1.texture, l2.texture),
        shape=lerp(l1.shape, l2.shape),
        face=l1.face)


def interpolate_attribute(cur: Latent, l1: Latent, l2: Latent, alpha,
                          att_name: str) -> Latent:
    """Interpolate one attribute, keep the rest of `cur`
    (ref: ui/backend.py:360-395; texture and curliness move together)."""
    lerp = lambda a, b: a * (1 - alpha) + b * alpha
    out = cur
    if att_name == 'shape':
        out = out.replace(shape=lerp(l1.shape, l2.shape))
    elif att_name in ('curliness', 'texture'):
        out = out.replace(curliness=lerp(l1.curliness, l2.curliness),
                          texture=lerp(l1.texture, l2.texture))
    elif att_name == 'color':
        out = out.replace(hsv=interpolate_hsv(l1.hsv, l2.hsv, alpha),
                          pca_std=lerp(l1.pca_std, l2.pca_std))
    else:
        raise ValueError(att_name)
    return out


def interpolate_triple(l1: Latent, l2: Latent, l3: Latent,
                       a1, a2, a3) -> Latent:
    """Two-lerp triple blend, replicated bug-for-bug from the reference
    (ui/backend.py:334-341): the second lerp uses RAW a3, so the advertised
    (l1*a1 + l2*a2 + l3*a3)/sum formula only holds when the alphas sum
    to 1 — which is how the frontend calls it."""
    l12 = interpolate(l1, l2, a2 / (a1 + a2))
    return interpolate(l12, l3, a3)


def transfer(cur: Latent, target: Latent, flag: str) -> Latent:
    """Copy one attribute group from target (ref: ui/backend.py:266-302);
    texture transfer also carries curliness."""
    if flag == 'color':
        return cur.replace(hsv=target.hsv, pca_std=target.pca_std)
    if flag == 'texture':
        return cur.replace(texture=target.texture,
                           curliness=target.curliness)
    if flag == 'curliness':
        return cur.replace(curliness=target.curliness)
    if flag == 'shape':
        return cur.replace(shape=target.shape, face=target.face)
    raise ValueError(flag)


def stack_latents(latents: Sequence[Latent]) -> Latent:
    """Stack N single latents into one batched latent for vmapped edits."""
    return jax.tree_util.tree_map(
        lambda *xs: jnp.concatenate(xs, axis=0), *latents)


def semantic_directions(dim: int, count: int, seed: int = 7) -> np.ndarray:
    """Deterministic orthonormal semantic directions, Gram-Schmidt against the
    previously chosen set with sign canonicalisation
    (ref: util/find_semantic_direction.py:12-21).  The reference persists
    manually-curated pickles; without them we expose the same contract from a
    fixed seed so slider indices remain stable across runs."""
    rng = np.random.default_rng(seed)
    dirs = []
    for _ in range(count):
        v = rng.standard_normal(dim)
        for d in dirs:
            v -= np.dot(v, d) * d
        v /= np.linalg.norm(v)
        if v[np.argmax(np.abs(v))] < 0:
            v = -v
        dirs.append(v)
    return np.stack(dirs).astype(np.float32)
