# Pallas rasterizer: interpret-mode parity with the XLA rasterizer.
import numpy as np
import pytest

import jax.numpy as jnp

from ctrlhair_tpu.ops.raster_pallas import rasterize_uv_pallas
from ctrlhair_tpu.ops.warp import MAX_TRIS, build_warp_mesh, rasterize_uv


def _mesh(size, shift):
    src = np.array([[16, 16], [size - 16, 16], [16, size - 16],
                    [size - 16, size - 16], [size / 2, size / 2]], float)
    dst = src + np.asarray(shift)
    return build_warp_mesh(src, dst, size, size, use_arap=False)


def test_pallas_rasterizer_matches_xla(rng):
    size = 64
    verts, dst, tris = _mesh(size, (3.0, -2.0))
    pad = np.full((MAX_TRIS, 3), -1, np.int32)
    pad[:len(tris)] = tris
    uv = (verts / size).astype(np.float32)   # production convention: verts/size
    ref = np.asarray(rasterize_uv(jnp.asarray(dst, jnp.float32),
                                  jnp.asarray(pad), jnp.asarray(uv),
                                  size, size))
    got = np.asarray(rasterize_uv_pallas(
        jnp.asarray(dst, jnp.float32), jnp.asarray(pad), jnp.asarray(uv),
        size, size, interpret=True))
    # pixels claimed by different (equally valid) adjacent triangles along
    # shared edges may pick either side; compare where both found the same
    diff = np.abs(ref - got)
    assert (diff < 1e-4).mean() > 0.995, diff.max()
    assert np.median(diff) < 1e-6


def test_pallas_rasterizer_identity_fallback(rng):
    size = 32
    # no triangles at all -> identity UV everywhere
    pad = np.full((64, 3), -1, np.int32)
    verts = np.zeros((3, 2), np.float32)
    uv = np.zeros((3, 2), np.float32)
    out = np.asarray(rasterize_uv_pallas(
        jnp.asarray(verts), jnp.asarray(pad), jnp.asarray(uv),
        size, size, interpret=True))
    # identity UV convention is p/size (exact round trip through sample_uv,
    # matching the reference textureSampling contract)
    xs = np.arange(size) / size
    np.testing.assert_allclose(out[0, :, 0], xs, atol=1e-6)
    np.testing.assert_allclose(out[:, 0, 1], xs, atol=1e-6)
