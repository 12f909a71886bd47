# Offline data-prep pipelines end to end on the tiny editor.
import os

import numpy as np
import pytest

from ctrlhair_tpu.data import prep
from ctrlhair_tpu.data.catalog import DataCatalog
from ctrlhair_tpu.data.sean_dataset import SEANDataset
from ctrlhair_tpu.pipeline.editor import HairEditorTPU
from ctrlhair_tpu.utils.image import write_rgb
from test_pipeline import tiny_cfg


@pytest.fixture(scope='module')
def editor():
    return HairEditorTPU(tiny_cfg())


@pytest.fixture()
def mini_root(tmp_path):
    rng = np.random.default_rng(0)
    ds = tmp_path / 'ffhq'
    os.makedirs(ds / 'images_256')
    for i in range(3):
        write_rgb(str(ds / 'images_256' / f'{i:05d}.png'),
                  rng.integers(0, 255, (64, 64, 3), dtype=np.uint8))
    return str(tmp_path)


def test_compute_masks_and_codes(editor, mini_root):
    img_dir = os.path.join(mini_root, 'ffhq', 'images_256')
    lab_dir = os.path.join(mini_root, 'ffhq', 'label')
    n = prep.compute_masks(editor, img_dir, lab_dir, batch_size=2)
    assert n == 3
    from PIL import Image
    lab = np.asarray(Image.open(os.path.join(lab_dir, '00000.png')))
    assert lab.shape == (256, 256)        # prep stores 256px labels
    assert lab.max() < 19

    cat = DataCatalog(mini_root, ['ffhq'], validity_check=False)
    out_path = os.path.join(mini_root, 'sean_code_dict.pkl')
    # note: tiny editor labels are 256px while images are 64px; resize labels
    import jax.numpy as jnp
    from ctrlhair_tpu.ops.resize import resize_nearest
    for key in cat.items:
        p = cat.label_path(key)
        small = np.asarray(resize_nearest(
            jnp.asarray(np.asarray(Image.open(p)).astype(np.int32)),
            (64, 64)))
        Image.fromarray(small.astype(np.uint8), mode='L').save(p)
    codes = prep.compute_sean_codes(editor, cat, out_path, batch_size=2)
    assert len(codes) == 3
    assert next(iter(codes.values())).shape == (19, 64)
    assert os.path.exists(out_path)

    landmarks = prep.compute_landmarks(editor, cat, '')
    assert len(landmarks) == 3
    assert next(iter(landmarks.values())).shape == (81, 2)


def test_mean_style_codes(tmp_path, editor):
    rng = np.random.default_rng(0)
    codes = {f'k{i}': rng.standard_normal((19, 8)).astype(np.float32)
             for i in range(5)}
    codes['k0'][3] = 0.0   # class 3 absent in one image
    med = prep.compute_mean_style_codes(codes, str(tmp_path))
    assert med.shape == (19, 8)
    # median of class 3 excludes the zero row
    rows = np.stack([codes[f'k{i}'][3] for i in range(1, 5)])
    np.testing.assert_allclose(med[3], np.median(rows, axis=0), atol=1e-6)
    assert os.path.exists(tmp_path / 'median' / '13' / 'ACE.npy')
    # round-trips through the editor's fallback loader (at ITS style_dim)
    d = editor.cfg.sean.style_dim
    codes_d = {f'm{i}': rng.standard_normal((19, d)).astype(np.float32)
               for i in range(3)}
    med_d = prep.compute_mean_style_codes(codes_d, str(tmp_path / 'ed'))
    editor.load_style_fallback(str(tmp_path / 'ed' / 'median'))
    np.testing.assert_allclose(
        np.asarray(editor.params['style_fallback']), med_d, atol=1e-6)


def test_warp_for_image_with_idx(mini_root, editor):
    img_dir = os.path.join(mini_root, 'ffhq', 'images_256')
    lab_dir = os.path.join(mini_root, 'ffhq', 'label')
    prep.compute_masks(editor, img_dir, lab_dir, batch_size=2)
    cat = DataCatalog(mini_root, ['ffhq'], validity_check=False)
    lms = prep.compute_landmarks(editor, cat, '')
    from ctrlhair_tpu.ops.warp import warp_for_image_with_idx
    out = warp_for_image_with_idx(cat, lms, cat.items[0], cat.items[1],
                                  use_arap=False)
    assert out.shape == (512, 512)


def test_crop_images(mini_root, editor, tmp_path):
    img_dir = os.path.join(mini_root, 'ffhq', 'images_256')
    out_dir = str(tmp_path / 'cropped')
    n = prep.crop_images(editor, img_dir, out_dir, output_size=64)
    assert n == 3
    from PIL import Image
    im = np.asarray(Image.open(os.path.join(out_dir, '00000.png')))
    assert im.shape == (64, 64, 3)


def test_sean_dataset_batches(mini_root, editor):
    img_dir = os.path.join(mini_root, 'ffhq', 'images_256')
    lab_dir = os.path.join(mini_root, 'ffhq', 'label')
    prep.compute_masks(editor, img_dir, lab_dir, batch_size=2)
    ds = SEANDataset(img_dir, lab_dir, crop_size=64)
    assert len(ds) == 3
    batch = ds.batch(4)
    assert batch['image'].shape == (4, 64, 64, 3)
    assert batch['label'].shape == (4, 64, 64)
    assert batch['image'].min() >= -1.0 and batch['image'].max() <= 1.0
