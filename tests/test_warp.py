# Warp pipeline tests: native ARAP invariances, rasterizer correctness,
# end-to-end mask transfer behaviour.
import numpy as np
import pytest

import jax.numpy as jnp

from ctrlhair_tpu.constants import HAIR_IDX, UNKNOWN_LABEL
from ctrlhair_tpu.native import arap_solve, build_native
from ctrlhair_tpu.ops.warp import (
    boundary_nodes, build_warp_mesh, hair_mask_transfer_warp, naive_transfer,
    rasterize_uv, sample_uv, MAX_TRIS)


def _square_mesh():
    verts = np.array([[0, 0], [10, 0], [0, 10], [10, 10], [5, 5]], float)
    tris = np.array([[0, 1, 4], [1, 3, 4], [3, 2, 4], [2, 0, 4]], np.int32)
    return verts, tris


def test_native_builds():
    assert build_native()


def test_arap_identity():
    verts, tris = _square_mesh()
    out = arap_solve(verts, tris, np.array([0, 1, 2, 3]), verts[:4])
    assert out is not None
    np.testing.assert_allclose(out, verts, atol=1e-6)


def test_arap_translation():
    verts, tris = _square_mesh()
    shift = np.array([3.0, -2.0])
    out = arap_solve(verts, tris, np.array([0, 1, 2, 3]), verts[:4] + shift)
    assert out is not None
    np.testing.assert_allclose(out, verts + shift, atol=1e-4)


def test_arap_rotation():
    verts, tris = _square_mesh()
    theta = 0.3
    rot = np.array([[np.cos(theta), -np.sin(theta)],
                    [np.sin(theta), np.cos(theta)]])
    target = (verts - 5) @ rot.T + 5
    out = arap_solve(verts, tris, np.array([0, 1, 2, 3]), target[:4])
    assert out is not None
    # a rigid rotation of the constraints should rotate the free vertex too
    np.testing.assert_allclose(out[4], target[4], atol=1e-3)


def test_rasterize_identity_roundtrip(rng):
    size = 64
    mask = np.zeros((size, size), np.float32)
    mask[10:40, 15:50] = 1.0
    lm = np.array([[20, 20], [44, 20], [32, 44]], float)
    verts, dst, tris = build_warp_mesh(lm, lm, size, size, use_arap=False)
    np.testing.assert_allclose(verts, dst)
    pad = np.full((MAX_TRIS, 3), -1, np.int32)
    pad[:len(tris)] = tris
    uv = (verts / size).astype(np.float32)   # production convention: verts/size
    uv_map = rasterize_uv(jnp.asarray(dst, jnp.float32), jnp.asarray(pad),
                          jnp.asarray(uv), size, size)
    out = np.asarray(sample_uv(jnp.asarray(mask), uv_map))
    # identity warp: binary mask reproduced almost everywhere
    assert (np.abs((out > 0.5).astype(float) - mask) > 0).mean() < 0.02


def test_rasterize_translation(rng):
    size = 64
    mask = np.zeros((size, size), np.float32)
    mask[20:36, 20:36] = 1.0
    src = np.array([[16, 16], [48, 16], [16, 48], [48, 48]], float)
    dst = src + np.array([6.0, 0.0])   # move landmarks right
    verts, vdst, tris = build_warp_mesh(src, dst, size, size, use_arap=True)
    pad = np.full((MAX_TRIS, 3), -1, np.int32)
    pad[:len(tris)] = tris
    uv = (verts / size).astype(np.float32)   # production convention: verts/size
    uv_map = rasterize_uv(jnp.asarray(vdst, jnp.float32), jnp.asarray(pad),
                          jnp.asarray(uv), size, size)
    out = np.asarray(sample_uv(jnp.asarray(mask), uv_map)) > 0.5
    ys, xs = np.nonzero(out)
    cx_out = xs.mean()
    # original centroid 27.5; ARAP blends the +6 landmark shift against the
    # fixed boundary, so expect a clear but attenuated rightward shift
    assert 28.5 < cx_out < 36.0, cx_out


def test_naive_transfer_semantics():
    target = np.zeros((8, 8), np.int32)
    target[0:2] = HAIR_IDX          # old hair at top
    target[4:6] = 1                 # skin
    hair = np.zeros((8, 8), np.int32)
    hair[3:5] = HAIR_IDX            # new hair in the middle
    out = naive_transfer(hair, target)
    assert (out[0:2] == UNKNOWN_LABEL).all()
    assert (out[3:5] == HAIR_IDX).all()
    assert (out[5] == 1).all()


def test_hair_mask_transfer_warp_end_to_end():
    size = 512
    hair_parsing = np.zeros((size, size), np.int32)
    hair_parsing[60:200, 100:420] = HAIR_IDX
    face_parsing = np.ones((size, size), np.int32)
    from ctrlhair_tpu.ops.landmarks import canonical_template_81
    lm = canonical_template_81()
    lm2 = lm.copy()
    lm2[:, 0] += 0.05   # target face sits slightly to the right
    out = hair_mask_transfer_warp(hair_parsing, face_parsing, lm, lm2,
                                  use_arap=True)
    assert out.shape == (size, size)
    hair_out = out == HAIR_IDX
    assert hair_out.sum() > 1000
    ys, xs = np.nonzero(hair_out)
    src_cx = (100 + 419) / 2
    assert xs.mean() > src_cx + 5   # hair moved right with the landmarks


def test_native_raster_matches_xla_path():
    """The default host rasterizer (native/raster.cpp) must reproduce the
    XLA chunked-einsum path pixel-for-pixel up to boundary rounding."""
    import os
    from ctrlhair_tpu import native

    if native._load() is None:
        import pytest
        pytest.skip('native lib unavailable')
    size = 512
    hair_parsing = np.zeros((size, size), np.int32)
    hair_parsing[40:260, 90:430] = HAIR_IDX
    face_parsing = np.ones((size, size), np.int32)
    face_parsing[200:380, 150:350] = HAIR_IDX    # old hair to uncover
    from ctrlhair_tpu.ops.landmarks import canonical_template_81
    lm = canonical_template_81()
    lm2 = lm.copy()
    lm2[:, 0] += 0.04
    lm2[:, 1] -= 0.02
    env = os.environ
    old = env.get('CTRLHAIR_HOST_RASTER')
    try:
        env['CTRLHAIR_HOST_RASTER'] = '1'
        out_native = hair_mask_transfer_warp(hair_parsing, face_parsing,
                                             lm, lm2, use_arap=False,
                                             out_size=256)
        env['CTRLHAIR_HOST_RASTER'] = '0'
        out_xla = hair_mask_transfer_warp(hair_parsing, face_parsing,
                                          lm, lm2, use_arap=False,
                                          out_size=256)
    finally:
        if old is None:
            env.pop('CTRLHAIR_HOST_RASTER', None)
        else:
            env['CTRLHAIR_HOST_RASTER'] = old
    assert out_native.shape == out_xla.shape == (256, 256)
    agree = np.mean(out_native == np.asarray(out_xla))
    assert agree >= 0.999, f'native vs XLA agreement {agree:.5f}'
