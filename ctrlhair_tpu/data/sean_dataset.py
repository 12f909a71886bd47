# SEAN (pix2pix) training dataset: (image, label) pairs.
#
# Parity target: sean_codes/data/custom_dataset.py:10-30 + pix2pix_dataset —
# paired CelebA-HQ images and label maps from parallel directories, sorted
# and index-matched, random batches with horizontal-flip augmentation.

from __future__ import annotations

import os
from typing import Dict, Optional, Sequence

import numpy as np


class SEANDataset:
    """Batches of {'image': [-1,1] NHWC, 'label': int [N,S,S]}."""

    def __init__(self, image_dir: str, label_dir: str, crop_size: int = 256,
                 flip: bool = True, seed: int = 0):
        self.image_dir = image_dir
        self.label_dir = label_dir
        self.crop_size = crop_size
        self.flip = flip
        self.rng = np.random.default_rng(seed)
        imgs = {os.path.splitext(f)[0] for f in os.listdir(image_dir)
                if f.endswith('.png')} if os.path.isdir(image_dir) else set()
        labs = {os.path.splitext(f)[0] for f in os.listdir(label_dir)
                if f.endswith('.png')} if os.path.isdir(label_dir) else set()
        self.names = sorted(imgs & labs)

    def __len__(self) -> int:
        return len(self.names)

    def _load(self, name: str):
        from PIL import Image
        import jax.numpy as jnp
        from ctrlhair_tpu.ops.resize import (resize_bilinear_nhwc,
                                             resize_nearest)
        img = np.asarray(Image.open(
            os.path.join(self.image_dir, name + '.png')).convert('RGB'))
        lab = np.asarray(Image.open(
            os.path.join(self.label_dir, name + '.png'))).astype(np.int32)
        s = self.crop_size
        if img.shape[:2] != (s, s):
            img = np.asarray(jnp.clip(jnp.round(resize_bilinear_nhwc(
                jnp.asarray(img, jnp.float32)[None], (s, s))[0]), 0, 255))
        if lab.shape[:2] != (s, s):
            lab = np.asarray(resize_nearest(jnp.asarray(lab), (s, s)))
        return img.astype(np.float32) / 127.5 - 1.0, lab

    def batch(self, batch_size: int) -> Optional[Dict[str, np.ndarray]]:
        if not self.names:
            return None
        idx = self.rng.integers(0, len(self.names), batch_size)
        imgs, labs = [], []
        for i in idx:
            img, lab = self._load(self.names[i])
            if self.flip and self.rng.integers(2):
                img = img[:, ::-1]
                lab = lab[:, ::-1]
            imgs.append(img)
            labs.append(lab)
        return {'image': np.stack(imgs).astype(np.float32),
                'label': np.stack(labs).astype(np.int32)}
