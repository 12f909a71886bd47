# Segmentation-mask utilities (one-hot encoding, hair/face split).
#
# TPU-native reformulation of the reference's scatter-based helpers
# (ref: shape_branch/shape_util.py:6-26): everything is expressed as
# one-hot/argmax/concatenate so it fuses under jit and vmaps over batches.

from __future__ import annotations

import jax
import jax.numpy as jnp

from ctrlhair_tpu.constants import HAIR_IDX, NUM_CLASSES, UNKNOWN_LABEL


def label_to_one_hot(label: jnp.ndarray, num_classes: int = NUM_CLASSES,
                     dtype=jnp.float32) -> jnp.ndarray:
    """[..., H, W] int labels -> [..., H, W, num_classes] one-hot (NHWC).

    Pixels equal to 255 (unknown) produce an all-zero row, matching the
    reference's scatter-into-(nc+1)-then-drop trick
    (ref: shape_branch/shape_util.py:6-14).
    """
    label = jnp.where(label == UNKNOWN_LABEL, num_classes, label)
    return jax.nn.one_hot(label, num_classes, dtype=dtype)


def one_hot_to_label(one_hot: jnp.ndarray) -> jnp.ndarray:
    """[..., H, W, C] -> [..., H, W] argmax labels; all-zero rows -> 255.

    (ref: shape_branch/shape_util.py:17-20)
    """
    label = jnp.argmax(one_hot, axis=-1).astype(jnp.int32)
    empty = jnp.max(one_hot, axis=-1) == 0
    return jnp.where(empty, UNKNOWN_LABEL, label)


def split_hair_face(one_hot: jnp.ndarray):
    """Split [..., C=19] one-hot into hair [..., 1] and face [..., 18].

    (ref: shape_branch/shape_util.py:23-26)
    """
    hair = one_hot[..., HAIR_IDX:HAIR_IDX + 1]
    face = jnp.concatenate(
        [one_hot[..., :HAIR_IDX], one_hot[..., HAIR_IDX + 1:]], axis=-1)
    return hair, face


def merge_hair_face(hair: jnp.ndarray, face: jnp.ndarray) -> jnp.ndarray:
    """Inverse of split_hair_face: insert the hair channel at HAIR_IDX."""
    return jnp.concatenate(
        [face[..., :HAIR_IDX], hair, face[..., HAIR_IDX:]], axis=-1)


def region_areas(one_hot: jnp.ndarray) -> jnp.ndarray:
    """Per-region pixel counts: [..., H, W, C] -> [..., C]."""
    return jnp.sum(one_hot, axis=(-3, -2))
