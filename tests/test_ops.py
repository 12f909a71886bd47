# Op-level parity tests: resize conventions vs cv2/torch, HSV vs cv2,
# mask utilities vs reference semantics.
import numpy as np
import pytest

import jax.numpy as jnp

from ctrlhair_tpu.ops.resize import (
    resize_nearest, resize_nearest_nhwc, resize_bilinear_nhwc,
    upsample2x_nearest_nhwc)
from ctrlhair_tpu.utils.colorspace import rgb_to_hsv_u8, hsv_to_rgb_u8
from ctrlhair_tpu.utils import masks


def test_resize_nearest_matches_cv2(rng):
    cv2 = pytest.importorskip('cv2')
    img = rng.integers(0, 255, (64, 48), dtype=np.uint8)
    for out in [(32, 24), (128, 96), (17, 13)]:
        ref = cv2.resize(img, (out[1], out[0]),
                         interpolation=cv2.INTER_NEAREST)
        got = np.asarray(resize_nearest(jnp.asarray(img), out))
        assert (ref == got).all(), out


def test_resize_nearest_matches_torch(rng):
    torch = pytest.importorskip('torch')
    img = rng.standard_normal((1, 1, 40, 40)).astype(np.float32)
    ref = torch.nn.functional.interpolate(
        torch.tensor(img), size=(16, 16), mode='nearest').numpy()
    got = np.asarray(resize_nearest(jnp.asarray(img[0, 0]), (16, 16)))
    np.testing.assert_allclose(ref[0, 0], got)


def test_resize_bilinear_align_corners_matches_torch(rng):
    torch = pytest.importorskip('torch')
    img = rng.standard_normal((2, 3, 16, 16)).astype(np.float32)
    ref = torch.nn.functional.interpolate(
        torch.tensor(img), size=(512, 512), mode='bilinear',
        align_corners=True).numpy()
    nhwc = jnp.asarray(img.transpose(0, 2, 3, 1))
    got = np.asarray(resize_bilinear_nhwc(nhwc, (512, 512),
                                          align_corners=True))
    np.testing.assert_allclose(ref.transpose(0, 2, 3, 1), got, atol=2e-5)


def test_resize_bilinear_half_pixel_matches_torch(rng):
    torch = pytest.importorskip('torch')
    img = rng.standard_normal((1, 2, 20, 20)).astype(np.float32)
    ref = torch.nn.functional.interpolate(
        torch.tensor(img), size=(9, 9), mode='bilinear',
        align_corners=False).numpy()
    got = np.asarray(resize_bilinear_nhwc(
        jnp.asarray(img.transpose(0, 2, 3, 1)), (9, 9), align_corners=False))
    np.testing.assert_allclose(ref.transpose(0, 2, 3, 1), got, atol=2e-5)


def test_upsample2x(rng):
    x = jnp.asarray(rng.standard_normal((2, 4, 4, 3)).astype(np.float32))
    y = upsample2x_nearest_nhwc(x)
    assert y.shape == (2, 8, 8, 3)
    np.testing.assert_allclose(np.asarray(y)[:, ::2, ::2], np.asarray(x))
    np.testing.assert_allclose(np.asarray(y)[:, 1::2, 1::2], np.asarray(x))


def test_hsv_roundtrip_matches_cv2(rng):
    cv2 = pytest.importorskip('cv2')
    # sweep a dense colour grid
    vals = np.arange(0, 256, 17, dtype=np.uint8)
    grid = np.stack(np.meshgrid(vals, vals, vals, indexing='ij'),
                    -1).reshape(1, -1, 3).astype(np.uint8)
    ref_hsv = cv2.cvtColor(grid, cv2.COLOR_RGB2HSV)
    got_hsv = np.asarray(rgb_to_hsv_u8(jnp.asarray(grid)))
    mismatch = (ref_hsv.astype(int) - got_hsv.astype(int))
    # H wraps at 180
    mismatch[..., 0] = np.minimum(np.abs(mismatch[..., 0]),
                                  180 - np.abs(mismatch[..., 0]))
    assert np.abs(mismatch).max() <= 1, np.abs(mismatch).max()

    ref_rgb = cv2.cvtColor(ref_hsv, cv2.COLOR_HSV2RGB)
    got_rgb = np.asarray(hsv_to_rgb_u8(jnp.asarray(ref_hsv)))
    assert np.abs(ref_rgb.astype(int) - got_rgb.astype(int)).max() <= 1


def test_one_hot_roundtrip(rng):
    label = rng.integers(0, 19, (2, 8, 8)).astype(np.int32)
    label[0, 0, 0] = 255
    oh = masks.label_to_one_hot(jnp.asarray(label))
    assert oh.shape == (2, 8, 8, 19)
    back = np.asarray(masks.one_hot_to_label(oh))
    np.testing.assert_array_equal(back, label)


def test_split_merge_hair_face(rng):
    label = rng.integers(0, 19, (1, 8, 8)).astype(np.int32)
    oh = masks.label_to_one_hot(jnp.asarray(label))
    hair, face = masks.split_hair_face(oh)
    assert hair.shape[-1] == 1 and face.shape[-1] == 18
    merged = masks.merge_hair_face(hair, face)
    np.testing.assert_allclose(np.asarray(merged), np.asarray(oh))
