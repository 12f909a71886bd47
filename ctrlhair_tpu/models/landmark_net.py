# Learned facial-landmark regressor — the trainable replacement for dlib's
# detector + 68/81-point shape predictors.
#
# The reference loads dlib's HOG frontal detector and two cascade-regression
# predictor binaries at module import (ref: external_code/landmarks_util.py:
# 17-19) and every geometry stage (crop, warp) consumes their 68/81 points.
# Those binaries are not redistributable, so this rebuild provides BOTH
#   (a) the parsing-driven contour estimator (ops/landmarks.py) — no
#       learned weights needed, exact for aligned faces — and
#   (b) this small convnet: image -> 81 normalised landmarks + a face
#       "presence" logit standing in for the detector's found/not-found
#       signal.  Trained on synthetic parse-rendered faces
#       (data/landmark_dataset.py) by training/landmark_trainer.py and
#       shipped behind `ops.landmarks.load_landmark_net`.
#
# TPU-first shape: a plain stride-2 conv pyramid (all convs lower onto the
# MXU, static shapes, no host loops), global average pool, and an MLP head
# that predicts OFFSETS from the canonical 81-point template — the prior
# keeps early training stable and makes the zero-init head output the
# template exactly.

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ctrlhair_tpu.models.layers import ConvBlock, MLP


@dataclasses.dataclass(frozen=True)
class LandmarkNetConfig:
    """Config for the landmark regressor (dlib stand-in)."""
    input_size: int = 128      # images are resized to this before the net
    n_points: int = 81         # dlib 68 + 13 forehead points (ref :19)
    base_channels: int = 24
    stages: int = 4            # stride-2 stages after the stem
    hidden_dim: int = 256
    norm: str = 'in'           # stateless: no batch_stats plumbing
    # training
    total_batch_size: int = 64
    total_step: int = 3000
    lr: float = 1e-3
    beta1: float = 0.9
    beta2: float = 0.999
    # max landmark offset from the template, in normalised image units
    offset_range: float = 0.5


class LandmarkNet(nn.Module):
    """[N,S,S,3] image in [-1,1] -> {'landmarks': [N,81,2] in [0,1],
    'presence': [N] logit (face found — dlib-detector stand-in)}."""
    cfg: LandmarkNetConfig
    train: bool = False

    @nn.compact
    def __call__(self, img: jnp.ndarray):
        cfg = self.cfg
        x = img
        ch = cfg.base_channels
        # stem + pyramid: S -> S/2^(stages+1); channels double, capped 256
        x = ConvBlock(ch, 7, 2, pad=3, norm=cfg.norm, activation='lrelu',
                      train=self.train, name='stem')(x)
        for i in range(cfg.stages):
            ch = min(ch * 2, 256)
            x = ConvBlock(ch, 3, 2, pad=1, norm=cfg.norm,
                          activation='lrelu', train=self.train,
                          name=f'down_{i}')(x)
            x = ConvBlock(ch, 3, 1, pad=1, norm=cfg.norm,
                          activation='lrelu', train=self.train,
                          name=f'res_{i}')(x)
        # flatten, not pool: coordinate regression needs the spatial
        # layout (global pooling is translation-invariant and cannot
        # localise; verified experimentally — pooled variant plateaus at
        # the template prior)
        feat = x.reshape(x.shape[0], -1)                   # [N, s*s*ch]
        out = MLP(cfg.hidden_dim, 2, cfg.n_points * 2 + 1,
                  activation='lrelu', name='head')(feat)
        raw_pts = out[:, :cfg.n_points * 2].reshape(
            -1, cfg.n_points, 2)
        presence = out[:, -1]
        template = jnp.asarray(_template(cfg.n_points))    # [81,2]
        pts = template[None] + cfg.offset_range * jnp.tanh(raw_pts)
        return {'landmarks': pts, 'presence': presence}


def _template(n_points: int) -> np.ndarray:
    from ctrlhair_tpu.ops.landmarks import canonical_template_81
    t = canonical_template_81()
    return t[:n_points]


def preprocess_image(img_uint8: np.ndarray, size: int) -> np.ndarray:
    """HWC uint8 RGB (any square size) -> [1,S,S,3] float32 in [-1,1]."""
    import cv2
    img = cv2.resize(np.asarray(img_uint8), (size, size),
                     interpolation=cv2.INTER_AREA)
    return (img.astype(np.float32) / 127.5 - 1.0)[None]
