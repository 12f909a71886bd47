# Validation-in-training: sample canvases rendered through the frozen SEAN
# generator — the reference's de-facto regression artefacts
# (ref: color_texture_branch/validation_in_train.py:46-293,
#  shape_branch/validation_in_train.py:41-159).
#
# Canvas types:
#   * per-dimension latent sweeps (each latent dim varied over a value grid),
#   * random prior samples,
#   * cross-image transfer matrices,
# all rendered batched through one jitted render program instead of
# one-image-at-a-time host loops.

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ctrlhair_tpu.constants import HAIR_IDX
from ctrlhair_tpu.utils.image import Canvas, mask_to_rgb, to_uint8
from ctrlhair_tpu.utils.masks import label_to_one_hot, one_hot_to_label, \
    split_hair_face


def ct_latent_sweep_canvas(editor, ct_gen_params, sean_codes, label,
                           base_data: Dict[str, jnp.ndarray],
                           out_path: Optional[str] = None,
                           values: Sequence[float] = (-2, -1, 0, 1, 2),
                           noise_dim: int = 8) -> np.ndarray:
    """Sweep each texture-noise dim over `values`, render via frozen SEAN
    (ref: validation_in_train.py per-dim sample grids)."""
    rows = []
    cell = label.shape[-1]
    canvas = Canvas(noise_dim, len(values), cell=cell)
    for d in range(noise_dim):
        batch = {k: jnp.tile(v, (len(values),) + (1,) * (v.ndim - 1))
                 for k, v in base_data.items()}
        noise = batch['noise'].at[:, d].set(jnp.asarray(values, jnp.float32))
        batch['noise'] = noise
        feats = editor.ct_gen.apply(ct_gen_params, batch)['code']
        codes = jnp.tile(sean_codes, (len(values), 1, 1)
                         ).at[:, HAIR_IDX].set(feats)
        imgs = editor.render(editor.params, codes,
                             jnp.tile(label, (len(values), 1, 1)))
        for c, im in enumerate(np.asarray(imgs)):
            canvas.paste(d, c, to_uint8(im))
    if out_path:
        canvas.save(out_path)
    return canvas.img


def ct_random_sample_canvas(editor, ct_gen_params, sean_codes, label,
                            base_data: Dict[str, jnp.ndarray],
                            rng: jax.Array, n: int = 8,
                            out_path: Optional[str] = None) -> np.ndarray:
    """Random prior textures rendered on the same face."""
    k1, k2 = jax.random.split(rng)
    batch = {key: jnp.tile(v, (n,) + (1,) * (v.ndim - 1))
             for key, v in base_data.items()}
    batch['noise'] = jax.random.normal(k1, (n, base_data['noise'].shape[-1]))
    batch['noise_curliness'] = jax.random.normal(k2, (n, 1))
    feats = editor.ct_gen.apply(ct_gen_params, batch)['code']
    codes = jnp.tile(sean_codes, (n, 1, 1)).at[:, HAIR_IDX].set(feats)
    imgs = editor.render(editor.params, codes, jnp.tile(label, (n, 1, 1)))
    cell = label.shape[-1]
    canvas = Canvas(1, n, cell=cell)
    for c, im in enumerate(np.asarray(imgs)):
        canvas.paste(0, c, to_uint8(im))
    if out_path:
        canvas.save(out_path)
    return canvas.img


def shape_sweep_canvas(editor, shape_params, face_code, base_shape,
                       out_path: Optional[str] = None,
                       values: Sequence[float] = (-2, -1, 0, 1, 2),
                       dims: Optional[Sequence[int]] = None) -> np.ndarray:
    """Per-dim shape-latent sweeps shown as coloured masks
    (ref: shape_branch/validation_in_train.py:41-159)."""
    hair_dim = base_shape.shape[-1]
    dims = list(dims) if dims is not None else list(range(hair_dim))
    sg = editor.shape_gen
    n = len(values)
    cell = editor.cfg.edit_size
    canvas = Canvas(len(dims), n, cell=cell)
    for r, d in enumerate(dims):
        shape = jnp.tile(base_shape, (n, 1)).at[:, d].set(
            jnp.asarray(values, jnp.float32))
        mask = sg.apply(shape_params, shape, jnp.tile(face_code, (n, 1)),
                        method=sg.decode)
        labels = np.asarray(one_hot_to_label(mask))
        for c in range(n):
            canvas.paste(r, c, mask_to_rgb(labels[c], draw_type=1))
    if out_path:
        canvas.save(out_path)
    return canvas.img


def transfer_matrix_canvas(editor, images: List[np.ndarray],
                           out_path: Optional[str] = None) -> np.ndarray:
    """NxN cross-image hair transfer matrix: row face x column hair donor."""
    n = len(images)
    analyses = [editor.analyze_image(im) for im in images]
    cell = editor.cfg.edit_size
    canvas = Canvas(n, n, cell=cell)
    for r in range(n):
        for c in range(n):
            codes = analyses[r]['sean_codes'].at[:, HAIR_IDX].set(
                analyses[c]['hair_feature'])
            img = editor.render(editor.params, codes, analyses[r]['label'])
            canvas.paste(r, c, to_uint8(np.asarray(img[0])))
    if out_path:
        canvas.save(out_path)
    return canvas.img
