# Host-side image I/O and normalisation helpers.
#
# Everything device-side lives in ctrlhair_tpu.ops; this module is the thin
# host boundary (PNG read/write, uint8 <-> [-1,1] float conversion, grids).
# (ref counterparts: util/imutil.py:13-24, util/canvas_grid.py:15-34,
#  util/mask_color_util.py:15-64)

from __future__ import annotations

import numpy as np

from ctrlhair_tpu.constants import HAIR_IDX, MASK_VIS_COLOR, UNKNOWN_LABEL


def read_rgb(path: str) -> np.ndarray:
    from PIL import Image
    return np.asarray(Image.open(path).convert('RGB'))


def write_rgb(path: str, img: np.ndarray) -> None:
    from PIL import Image
    Image.fromarray(np.asarray(img).astype('uint8')).save(path)


def to_float(img_u8: np.ndarray) -> np.ndarray:
    """uint8 [0,255] -> float32 [-1,1] (ref: hair_editor.py:121-123)."""
    return np.asarray(img_u8, dtype=np.float32) / 127.5 - 1.0


def to_uint8(img_f: np.ndarray) -> np.ndarray:
    """float [-1,1] -> uint8 [0,255]."""
    img = np.asarray(img_f, dtype=np.float32) * 127.5 + 127.5
    return np.clip(img, 0, 255).astype(np.uint8)


def mask_to_rgb(label: np.ndarray, draw_type: int = 2) -> np.ndarray:
    """Visualise a [H,W] label map (ref: util/mask_color_util.py:15-64).

    draw_type 0: all classes; 1: {bg, face, hair}; 2: {hair, other}.
    """
    label = np.asarray(label)
    if label.ndim == 3 and label.shape[0] == 1:
        label = label[0]
    color = MASK_VIS_COLOR.copy()
    if draw_type == 2:
        keep = np.zeros(len(color), bool)
        keep[HAIR_IDX] = True
        color[~keep] = [255, 255, 255]
    elif draw_type == 1:
        keep = np.zeros(len(color), bool)
        keep[HAIR_IDX] = True
        keep[0] = True
        color[~keep] = [237, 28, 36]
    lut = np.concatenate([color, np.full((256 - len(color), 3), 255, np.uint8)])
    return lut[np.where(label == UNKNOWN_LABEL, 255, label)]


class Canvas:
    """Grid canvas for sample sheets (ref: util/canvas_grid.py:15-34)."""

    def __init__(self, rows: int, cols: int, cell: int = 256, margin: int = 2):
        self.cell = cell
        self.margin = margin
        h = rows * (cell + margin) + margin
        w = cols * (cell + margin) + margin
        self.img = np.full((h, w, 3), 255, np.uint8)

    def paste(self, row: int, col: int, img: np.ndarray) -> None:
        img = np.asarray(img)
        if img.dtype != np.uint8:
            img = to_uint8(img)
        if img.ndim == 2:
            img = np.stack([img] * 3, -1)
        y = row * (self.cell + self.margin) + self.margin
        x = col * (self.cell + self.margin) + self.margin
        self.img[y:y + img.shape[0], x:x + img.shape[1]] = img

    def save(self, path: str) -> None:
        write_rgb(path, self.img)
