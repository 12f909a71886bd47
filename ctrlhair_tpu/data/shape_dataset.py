# Shape branch dataset: pre-warped mask pools.
#
# Parity target: shape_branch/dataset.py:24-183 + adaptor_generation.py:55-
# 114 — training batches are drawn from a disk pool of pre-warped masks named
# '<hairdir>___<hair>___<facedir>___<face>___NN.png', with mirror
# augmentation; the 'real' adversarial batch uses CelebA masks only
# (config only_celeba_as_real).  Pool generation replaces the reference's
# 10-thread triangle/arap subprocess farm with in-process calls into
# ctrlhair_tpu.ops.warp.

from __future__ import annotations

import os
import threading
from typing import Dict, List, Optional, Sequence

import numpy as np

from ctrlhair_tpu.config import ShapeConfig
from ctrlhair_tpu.data.catalog import DataCatalog
from ctrlhair_tpu.utils.masks import label_to_one_hot


def _load_label(path: str) -> np.ndarray:
    from PIL import Image
    return np.asarray(Image.open(path)).astype(np.int32)


class ShapeDataset:
    """Triplet batches (warped target, face, donor hair) + real masks."""

    def __init__(self, cfg: ShapeConfig, data_root: str,
                 pool_dir: str = 'shape_training_wrap_pool',
                 catalog: Optional[DataCatalog] = None,
                 datasets: Sequence[str] = ('ffhq', 'CelebaMask_HQ'),
                 seed: int = 7):
        self.cfg = cfg
        self.data_root = data_root
        self.rng = np.random.default_rng(seed)
        self.pool_dir = os.path.join(data_root, pool_dir)
        self.pool_files: List[str] = []
        if os.path.isdir(self.pool_dir):
            self.pool_files = sorted(
                f for f in os.listdir(self.pool_dir) if f.endswith('.png'))
        if catalog is None:
            catalog = DataCatalog(data_root, datasets, validity_check=False)
        self.catalog = catalog
        # real adversarial batch: CelebA only (ref: dataset.py:47-48)
        self.real_keys = [k for k in catalog.train_items
                          if k.startswith('CelebaMask_HQ')] or \
            list(catalog.train_items)

    def _resize(self, label: np.ndarray) -> np.ndarray:
        import jax.numpy as jnp
        from ctrlhair_tpu.ops.resize import resize_nearest
        s = self.cfg.img_size
        if label.shape[0] == s:
            return label
        return np.asarray(resize_nearest(jnp.asarray(label), (s, s)))

    def _one_hot(self, label: np.ndarray, mirror: bool) -> np.ndarray:
        import jax.numpy as jnp
        if mirror:
            label = label[:, ::-1]
        return np.asarray(label_to_one_hot(jnp.asarray(label[None])))[0]

    def training_batch(self, batch_size: int) -> Optional[Dict[str, np.ndarray]]:
        """target = warped pool mask; face/hair = the original pair's masks
        (ref: dataset.py pool filename contract)."""
        if not self.pool_files:
            return None
        targets, faces, hairs, reals = [], [], [], []
        for _ in range(batch_size):
            fname = self.pool_files[self.rng.integers(len(self.pool_files))]
            parts = os.path.splitext(fname)[0].split('___')
            hair_key = f'{parts[0]}___{parts[1]}'
            face_key = f'{parts[2]}___{parts[3]}'
            mirror = bool(self.rng.integers(2))
            target = self._resize(_load_label(
                os.path.join(self.pool_dir, fname)))
            face = self._resize(_load_label(self.catalog.label_path(face_key)))
            hair = self._resize(_load_label(self.catalog.label_path(hair_key)))
            real_key = self.real_keys[self.rng.integers(len(self.real_keys))]
            real = self._resize(_load_label(self.catalog.label_path(real_key)))
            targets.append(self._one_hot(target, mirror))
            faces.append(self._one_hot(face, mirror))
            hairs.append(self._one_hot(hair, mirror))
            reals.append(self._one_hot(real, bool(self.rng.integers(2))))
        return {'target': np.stack(targets), 'face': np.stack(faces),
                'hair': np.stack(hairs), 'real': np.stack(reals)}


def generate_warp_pool(catalog: DataCatalog, out_dir: str, count: int,
                       use_arap: bool = True, num_threads: int = 10,
                       seed: int = 0) -> int:
    """Pre-generate warped-mask pairs into `out_dir`.

    In-process replacement for the reference's thread pool of subprocess
    warps (ref: adaptor_generation.py:55-114): each worker picks a random
    (hair, face) pair, warps the hair mask onto the face geometry with
    ops.warp, and writes '<hair>___<face>___NN.png'.  Exceptions are
    swallowed per item, matching the reference's resilient workers.
    Returns the number of files written.
    """
    import jax.numpy as jnp
    from PIL import Image

    from ctrlhair_tpu.ops.landmarks import estimate_landmarks_81
    from ctrlhair_tpu.ops.resize import resize_nearest
    from ctrlhair_tpu.ops.warp import hair_mask_transfer_warp

    os.makedirs(out_dir, exist_ok=True)
    items = list(catalog.train_items)
    if len(items) < 2:
        return 0
    rng = np.random.default_rng(seed)
    pairs = [(items[a], items[b]) for a, b in zip(
        rng.integers(0, len(items), count),
        rng.integers(0, len(items), count))]
    written = [0]
    lock = threading.Lock()

    def work(chunk):
        for i, (hair_key, face_key) in chunk:
            try:
                name = f'{hair_key}___{face_key}___{i:02d}.png'
                if os.path.exists(os.path.join(out_dir, name)):
                    # the pair schedule is deterministic in (seed, catalog),
                    # so an existing output IS this item: a crashed/resumed
                    # soak must not redo 240 ARAP warps per relaunch
                    with lock:
                        written[0] += 1
                    continue
                hair = _load_label(catalog.label_path(hair_key))
                face = _load_label(catalog.label_path(face_key))
                size = 512
                hair512 = np.asarray(resize_nearest(
                    jnp.asarray(hair), (size, size)))
                face512 = np.asarray(resize_nearest(
                    jnp.asarray(face), (size, size)))
                hl = estimate_landmarks_81(hair512)
                fl = estimate_landmarks_81(face512)
                composite = hair_mask_transfer_warp(
                    hair512, face512, hl, fl, use_arap=use_arap)
                name = f'{hair_key}___{face_key}___{i:02d}.png'
                Image.fromarray(
                    composite.astype(np.uint8)).save(
                    os.path.join(out_dir, name))
                with lock:
                    written[0] += 1
            except Exception:
                continue

    chunks = [[] for _ in range(num_threads)]
    for i, pair in enumerate(pairs):
        chunks[i % num_threads].append((i, pair))
    threads = [threading.Thread(target=work, args=(c,)) for c in chunks if c]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    return written[0]
