# Crop/alignment tests: quad geometry, homography reprojection, and
# end-to-end alignment behaviour on a synthetic face.
import numpy as np
import pytest

from ctrlhair_tpu.ops.crop import (
    crop_quad_from_landmarks, recreate_aligned_image, _perspective_from_quad)
from ctrlhair_tpu.ops.landmarks import canonical_template_81


def _synthetic_landmarks(size, scale=1.0, shift=(0, 0)):
    lm = canonical_template_81()[:68] * size * scale
    return lm + np.asarray(shift)


def test_quad_is_square_and_centered():
    lm = _synthetic_landmarks(512)
    quad, qsize = crop_quad_from_landmarks(lm)
    # oriented square: all sides equal
    sides = [np.linalg.norm(quad[i] - quad[(i + 1) % 4]) for i in range(4)]
    np.testing.assert_allclose(sides, sides[0], rtol=1e-6)
    assert qsize > 0
    # roughly centred between the eyes/mouth
    center = quad.mean(0)
    eye_avg = (lm[36:42].mean(0) + lm[42:48].mean(0)) / 2
    assert np.linalg.norm(center - eye_avg) < qsize


def test_perspective_maps_corners():
    quad = np.array([[10, 20], [12, 110], [130, 100], [120, 15]], float)
    h = _perspective_from_quad(quad)
    dst = np.array([[0, 0], [0, 1], [1, 1], [1, 0]], float)
    for q, d in zip(quad, dst):
        v = h @ np.array([q[0], q[1], 1.0])
        np.testing.assert_allclose(v[:2] / v[2], d, atol=1e-9)


def test_recreate_aligned_image_identity_scalefree():
    rng = np.random.default_rng(0)
    size = 256
    img = rng.integers(0, 255, (size, size, 3), dtype=np.uint8)
    lm = _synthetic_landmarks(size)
    out, out_lm = recreate_aligned_image(img, lm, output_size=128)
    assert out.shape == (128, 128, 3) and out.dtype == np.uint8
    assert out_lm.shape == (68, 2)
    # eyes land around the canonical FFHQ positions after alignment:
    eye_l = out_lm[36:42].mean(0) / 128
    eye_r = out_lm[42:48].mean(0) / 128
    assert abs((eye_l[1] + eye_r[1]) / 2 - 0.48) < 0.1   # vertical placement
    assert 0.2 < eye_l[0] < 0.45 and 0.55 < eye_r[0] < 0.8


def test_recreate_aligned_consistent_under_shift():
    # smooth content: subpixel sampling differences stay small
    yy, xx = np.mgrid[0:400, 0:400]
    base = np.stack([xx * 255 / 400, yy * 255 / 400,
                     (xx + yy) * 255 / 800], -1).astype(np.uint8)
    big = np.zeros((600, 600, 3), np.uint8)
    big[100:500, 100:500] = base
    lm = _synthetic_landmarks(400)
    out1, _ = recreate_aligned_image(base, lm, output_size=64)
    out2, _ = recreate_aligned_image(big, lm + 100, output_size=64)
    # same face content -> nearly identical crops in the interior (the
    # borders legitimately differ: the small image needs reflect-padding)
    diff = np.abs(out1[16:48, 16:48].astype(int)
                  - out2[16:48, 16:48].astype(int)).mean()
    assert diff < 8.0, diff


def test_editor_crop_face_runs(tiny_editor):
    editor = tiny_editor
    img = np.random.default_rng(2).integers(0, 255, (200, 200, 3),
                                            dtype=np.uint8)
    out = editor.crop_face(img)
    assert out.shape == (64, 64, 3)
    color = editor.get_hair_color(img)
    assert color.shape == (3,)

    # instance-transfer render paths
    rng = np.random.default_rng(3)
    face_img = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8).astype(
        np.float32) / 127.5 - 1.0
    label = rng.integers(0, 19, (64, 64)).astype(np.int32)
    codes = rng.standard_normal((19, 64)).astype(np.float32)
    hair_code = rng.standard_normal(64).astype(np.float32)
    img1 = editor.generate_by_sean(codes, hair_code, label)
    assert img1.shape == (64, 64, 3)
    img2 = editor.generate_instance_transfer_img(
        face_img, label, None, None, label)
    assert img2.shape == (64, 64, 3)
