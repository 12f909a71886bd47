# Data layer tests: catalogue filtering/splits, branch datasets over a
# synthetic on-disk fixture, data-prep pipelines, checkpointing.
import os
import pickle

import numpy as np
import pytest

from ctrlhair_tpu.config import ColorTextureConfig, ShapeConfig
from ctrlhair_tpu.constants import HAIR_IDX
from ctrlhair_tpu.data.catalog import DataCatalog, hair_area_valid
from ctrlhair_tpu.data.color_texture_dataset import ColorTextureDataset
from ctrlhair_tpu.data.shape_dataset import ShapeDataset, generate_warp_pool
from ctrlhair_tpu.utils.checkpoint import (
    load_checkpoint, save_checkpoint, latest_checkpoint_path)


@pytest.fixture(scope='module')
def data_root(tmp_path_factory):
    """Synthetic two-dataset fixture with images, labels, csvs, stats."""
    root = tmp_path_factory.mktemp('dataset_info')
    rng = np.random.default_rng(0)
    from PIL import Image
    sean_codes, rgb_stats, var_stats = {}, {}, {}
    for ds in ('ffhq', 'CelebaMask_HQ'):
        os.makedirs(root / ds / 'images_256')
        os.makedirs(root / ds / 'label')
        angle_rows, gender_rows = ['name,yaw'], ['name,gender']
        for i in range(12):
            name = f'{i:05d}'
            img = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
            Image.fromarray(img).save(root / ds / 'images_256' / f'{name}.png')
            label = np.zeros((64, 64), np.uint8)
            label[:24] = HAIR_IDX          # plenty of hair
            label[40:] = 1
            Image.fromarray(label, mode='L').save(
                root / ds / 'label' / f'{name}.png')
            # one item filtered by angle, one by gender
            angle_rows.append(f'{name}.png,{20.0 if i == 5 else 1.0}')
            gender_rows.append(f'{name}.png,{1 if i == 6 else 0}')
            key = f'{ds}___{name}'
            sean_codes[key] = rng.standard_normal((19, 64)).astype(np.float32)
            rgb_stats[key] = rng.uniform(0, 255, 3).astype(np.float32)
            var_stats[key] = {'pca_std': float(rng.uniform(20, 120))}
        (root / ds / 'angle.csv').write_text('\n'.join(angle_rows))
        (root / ds / 'attr_gender.csv').write_text('\n'.join(gender_rows))
    for fname, obj in [('sean_code_dict.pkl', sean_codes),
                       ('rgb_stat_dict.pkl', rgb_stats),
                       ('color_var_stat_dict.pkl', var_stats)]:
        with open(root / fname, 'wb') as f:
            pickle.dump(obj, f)
    os.makedirs(root / 'manual_label' / 'curliness')
    keys = sorted(sean_codes)
    (root / 'manual_label' / 'curliness' / '1.txt').write_text(
        '\n'.join(keys[:4]))
    (root / 'manual_label' / 'curliness' / '-1.txt').write_text(
        '\n'.join(keys[4:8]))
    return str(root)


def test_catalog_filters_and_split(data_root):
    cat = DataCatalog(data_root, ['ffhq', 'CelebaMask_HQ'])
    # 12 per dataset minus angle-filtered (i=5) and gender-filtered (i=6)
    assert len(cat.items) == 20
    assert len(cat.test_items) == int(20 * 0.096)
    assert set(cat.test_items).isdisjoint(cat.train_items)
    # deterministic split
    cat2 = DataCatalog(data_root, ['ffhq', 'CelebaMask_HQ'])
    assert cat.train_items == cat2.train_items


def test_hair_area_validity():
    good = np.zeros((32, 32), np.uint8)
    good[:8] = HAIR_IDX
    assert hair_area_valid(good)
    bald = np.zeros((32, 32), np.uint8)
    assert not hair_area_valid(bald)
    hat = good.copy()
    hat[20:] = 14
    assert not hair_area_valid(hat)


def test_color_texture_dataset_batches(data_root):
    cfg = ColorTextureConfig(style_dim=64)
    ds = ColorTextureDataset(cfg, data_root)
    batch = ds.training_batch(16)
    assert batch['code'].shape == (16, 64)
    assert batch['rgb_mean'].shape == (16, 3)
    assert batch['pca_std'].shape == (16, 1)
    assert batch['noise'].shape == (16, 8)
    assert set(np.unique(batch['curliness_label'])) <= {-1.0, 1.0}
    # signed curliness noise: sign matches label
    assert (np.sign(batch['noise_curliness'])
            == np.sign(batch['curliness_label'])).all()
    cb = ds.curliness_batch(8)
    assert cb is not None and cb['code'].shape == (8, 64)


def test_shape_dataset_and_pool(data_root):
    cat = DataCatalog(data_root, ['ffhq', 'CelebaMask_HQ'],
                      validity_check=False)
    pool_dir = os.path.join(data_root, 'shape_training_wrap_pool')
    n = generate_warp_pool(cat, pool_dir, count=3, use_arap=False,
                           num_threads=2)
    assert n >= 1
    cfg = ShapeConfig(img_size=64, layer_num=5)
    ds = ShapeDataset(cfg, data_root)
    batch = ds.training_batch(2)
    assert batch is not None
    for k in ('target', 'face', 'hair', 'real'):
        assert batch[k].shape == (2, 64, 64, 19), k


def test_prep_color_stats_and_variance(data_root):
    cat = DataCatalog(data_root, ['ffhq'], validity_check=False)
    from ctrlhair_tpu.data import prep
    rgb = prep.compute_color_stats(cat, '', '')
    assert len(rgb) > 0
    for v in rgb.values():
        assert v.shape == (3,)
    var = prep.compute_color_variance(cat, '')
    assert all(v['pca_std'] >= 0 for v in var.values())


def test_checkpoint_roundtrip(tmp_path):
    import jax.numpy as jnp
    tree = {'a': jnp.arange(5, dtype=jnp.float32),
            'b': {'c': jnp.ones((2, 2))}}
    d = str(tmp_path / 'ckpt')
    save_checkpoint(d, tree, 100, max_keep=2)
    save_checkpoint(d, tree, 200, max_keep=2)
    save_checkpoint(d, {'a': jnp.arange(5, dtype=jnp.float32) * 2,
                        'b': {'c': jnp.zeros((2, 2))}}, 300, max_keep=2)
    # retention: only two newest remain
    files = [f for f in os.listdir(d) if f.endswith('.ckpt')]
    assert sorted(files) == ['0000200.ckpt', '0000300.ckpt']
    assert latest_checkpoint_path(d).endswith('0000300.ckpt')
    restored, step = load_checkpoint(d, tree)
    assert step == 300
    np.testing.assert_allclose(np.asarray(restored['a']),
                               np.arange(5) * 2)
