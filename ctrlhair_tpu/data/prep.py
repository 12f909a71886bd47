# Offline data-preparation pipelines.
#
# Parity targets (ref: dataset_scripts/*, SURVEY §3.5):
#   script_crop.py                -> crop_images
#   script_get_mask.py            -> compute_masks        (BiSeNet, batched)
#   script_landmark_detection.py  -> compute_landmarks
#   script_get_sean_code.py       -> compute_sean_codes   (batched encode)
#   script_get_rgb_hsv_label.py   -> compute_color_stats  (rgb moments +
#                                    sorted HSV table for DistTranslation)
#   script_get_color_var_label.py -> compute_color_variance (PCA 1st-component
#                                    std == the 'variance' latent)
# Unlike the reference's one-image-at-a-time loops, every device stage here
# runs batched through the editor's jitted programs.

from __future__ import annotations

import os
import pickle
from typing import Dict, List, Optional, Sequence

import numpy as np

from ctrlhair_tpu.constants import HAIR_IDX
from ctrlhair_tpu.data.catalog import DataCatalog
from ctrlhair_tpu.utils.image import read_rgb, write_rgb


def _batched(items: Sequence, n: int):
    for i in range(0, len(items), n):
        yield items[i:i + n]


def crop_images(editor, in_dir: str, out_dir: str,
                output_size: int = 256) -> int:
    """Align + crop raw images into images_256/
    (ref: dataset_scripts/script_crop.py).  Landmarks from the parsing
    estimator; per-image failures are skipped like the reference's loop."""
    os.makedirs(out_dir, exist_ok=True)
    names = sorted(f for f in os.listdir(in_dir)
                   if f.lower().endswith(('.png', '.jpg', '.jpeg')))
    done = 0
    for name in names:
        try:
            img = read_rgb(os.path.join(in_dir, name))
            out = editor.crop_face(img, output_size=output_size)
            write_rgb(os.path.join(
                out_dir, os.path.splitext(name)[0] + '.png'), out)
            done += 1
        except Exception:
            continue
    return done


def compute_masks(editor, image_dir: str, label_dir: str,
                  batch_size: int = 8) -> int:
    """images_256/*.png -> label/*.png via the jitted parser
    (ref: dataset_scripts/script_get_mask.py:55-71)."""
    import jax.numpy as jnp
    from ctrlhair_tpu.ops.resize import resize_nearest

    os.makedirs(label_dir, exist_ok=True)
    names = sorted(f for f in os.listdir(image_dir) if f.endswith('.png'))
    done = 0
    for chunk in _batched(names, batch_size):
        imgs = np.stack([read_rgb(os.path.join(image_dir, f))
                         for f in chunk])
        labels512 = editor.parse(editor.params, jnp.asarray(imgs))
        labels = np.asarray(resize_nearest(labels512, (256, 256)))
        for f, lab in zip(chunk, labels):
            write_rgb_gray(os.path.join(label_dir, f), lab)
            done += 1
    return done


def write_rgb_gray(path: str, label: np.ndarray) -> None:
    from PIL import Image
    Image.fromarray(label.astype(np.uint8), mode='L').save(path)


def compute_sean_codes(editor, catalog: DataCatalog, out_path: str,
                       batch_size: int = 8) -> Dict[str, np.ndarray]:
    """Per-image [19, style_dim] codes -> sean_code_dict.pkl
    (ref: dataset_scripts/script_get_sean_code.py:40-62)."""
    import jax.numpy as jnp

    sean = editor.sean
    out: Dict[str, np.ndarray] = {}
    for chunk in _batched(list(catalog.items), batch_size):
        imgs, labels, keys = [], [], []
        for key in chunk:
            ip, lp = catalog.image_path(key), catalog.label_path(key)
            if not (os.path.exists(ip) and os.path.exists(lp)):
                continue
            from PIL import Image
            imgs.append(read_rgb(ip))
            labels.append(np.asarray(Image.open(lp)).astype(np.int32))
            keys.append(key)
        if not keys:
            continue
        img_f = jnp.asarray(np.stack(imgs), jnp.float32) / 127.5 - 1.0
        lab = jnp.asarray(np.stack(labels))
        codes = sean.apply(editor.params['sean'], img_f, lab,
                           method=sean.encode)
        for key, c in zip(keys, np.asarray(codes)):
            out[key] = c
    if out_path:
        with open(out_path, 'wb') as f:
            pickle.dump(out, f)
    return out


def compute_color_stats(catalog: DataCatalog, out_rgb_path: str,
                        out_hsv_table_path: str,
                        erode_ksize: int = 19) -> Dict[str, np.ndarray]:
    """Eroded-hair RGB means + the column-sorted HSV table
    (ref: dataset_scripts/script_get_rgb_hsv_label.py:39-90)."""
    import jax.numpy as jnp
    from PIL import Image

    from ctrlhair_tpu.ops.morphology import erode
    from ctrlhair_tpu.utils.colorspace import rgb_to_hsv_u8

    rgb_out: Dict[str, np.ndarray] = {}
    hsv_rows: List[np.ndarray] = []
    for key in catalog.items:
        ip, lp = catalog.image_path(key), catalog.label_path(key)
        if not (os.path.exists(ip) and os.path.exists(lp)):
            continue
        img = read_rgb(ip)
        label = np.asarray(Image.open(lp))
        hair = (label == HAIR_IDX).astype(np.float32)
        hair = np.asarray(erode(jnp.asarray(hair), erode_ksize))
        pix = img[hair.astype(bool)]
        if len(pix) < 16:
            continue
        mean = pix.mean(0)
        rgb_out[key] = mean.astype(np.float32)
        hsv = np.asarray(rgb_to_hsv_u8(
            jnp.asarray(np.round(mean)[None].astype(np.uint8))))[0]
        hsv_rows.append(hsv.astype(np.float32))
    if out_rgb_path:
        with open(out_rgb_path, 'wb') as f:
            pickle.dump(rgb_out, f)
    if hsv_rows and out_hsv_table_path:
        table = np.sort(np.stack(hsv_rows), axis=0)
        with open(out_hsv_table_path, 'wb') as f:
            pickle.dump(table, f)
    return rgb_out


def compute_color_variance(catalog: DataCatalog, out_path: str
                           ) -> Dict[str, Dict[str, float]]:
    """Hair-pixel colour variance; 'pca_std' = std of the first PCA
    component of hair RGB pixels (ref: script_get_color_var_label.py:82-88,
    sklearn PCA replaced by an SVD)."""
    from PIL import Image

    out: Dict[str, Dict[str, float]] = {}
    for key in catalog.items:
        ip, lp = catalog.image_path(key), catalog.label_path(key)
        if not (os.path.exists(ip) and os.path.exists(lp)):
            continue
        img = read_rgb(ip).astype(np.float64)
        label = np.asarray(Image.open(lp))
        pix = img[label == HAIR_IDX]
        if len(pix) < 16:
            continue
        centered = pix - pix.mean(0)
        # first principal component std via SVD
        s = np.linalg.svd(centered, compute_uv=False)
        pca_std = float(s[0] / np.sqrt(len(pix) - 1))
        out[key] = {'pca_std': pca_std,
                    'rgb_var': float(centered.var(0).mean())}
    if out_path:
        with open(out_path, 'wb') as f:
            pickle.dump(out, f)
    return out


def compute_mean_style_codes(sean_codes: Dict[str, np.ndarray],
                             out_dir: Optional[str] = None) -> np.ndarray:
    """Per-class median (and mean) SEAN style codes across a dataset
    (ref: sean_codes/get_mean_code.py:15-43) — the fallback codes for
    regions absent from an input mask (hair_editor.py:130-147).

    Zero code vectors (region absent in that image) are excluded from the
    statistics.  Writes median/<class>/ACE.npy when out_dir is given, the
    layout HairEditorTPU.load_style_fallback consumes.  Returns the
    [19, style_dim] median array.
    """
    stacked = np.stack(list(sean_codes.values()))       # [N, 19, D]
    medians = np.zeros(stacked.shape[1:], np.float32)
    for cls in range(stacked.shape[1]):
        rows = stacked[:, cls]
        present = rows[np.abs(rows).sum(axis=1) > 0]
        if len(present):
            medians[cls] = np.median(present, axis=0)
    if out_dir:
        for cls in range(len(medians)):
            d = os.path.join(out_dir, 'median', str(cls))
            os.makedirs(d, exist_ok=True)
            np.save(os.path.join(d, 'ACE.npy'), medians[cls])
    return medians


def compute_landmarks(editor, catalog: DataCatalog, out_path: str
                      ) -> Dict[str, np.ndarray]:
    """Per-image 81-point landmarks -> landmark81.pkl
    (ref: dataset_scripts/script_landmark_detection.py; dlib replaced by the
    parsing-centroid estimator, ops/landmarks.py)."""
    import jax.numpy as jnp
    from PIL import Image

    from ctrlhair_tpu.ops.landmarks import estimate_landmarks_81
    from ctrlhair_tpu.ops.resize import resize_nearest

    out: Dict[str, np.ndarray] = {}
    for key in catalog.items:
        lp = catalog.label_path(key)
        if not os.path.exists(lp):
            continue
        label = np.asarray(Image.open(lp)).astype(np.int32)
        label512 = np.asarray(resize_nearest(jnp.asarray(label), (512, 512)))
        ip = catalog.image_path(key)
        img = (np.asarray(Image.open(ip).convert('RGB'))
               if os.path.exists(ip) else None)
        out[key] = estimate_landmarks_81(label512, image=img)
    if out_path:
        with open(out_path, 'wb') as f:
            pickle.dump(out, f)
    return out
