# Semantic-direction discovery for the shape/texture sliders.
#
# Parity target: util/find_semantic_direction.py:12-21 + the two
# script_find_direction.py drivers — random candidate directions made
# orthogonal to the already-chosen set (Gram-Schmidt), sign-canonicalised,
# rendered as sweep grids for manual curation; the chosen pickles define the
# slider semantics (length/volume/bangs..., ref: ui/backend.py:211-226).

from __future__ import annotations

import os
import pickle
from typing import List, Optional, Sequence

import numpy as np


def random_orthogonal_direction(dim: int, existing: Sequence[np.ndarray],
                                rng: np.random.Generator) -> np.ndarray:
    """One unit direction orthogonal to `existing`, sign-canonicalised
    (largest-|coord| component positive)."""
    v = rng.standard_normal(dim)
    for e in existing:
        v = v - np.dot(v, e) * e
    v = v / np.linalg.norm(v)
    if v[np.argmax(np.abs(v))] < 0:
        v = -v
    return v.astype(np.float32)


def save_direction(dir_path: str, index: int, direction: np.ndarray) -> None:
    """Persist as sorted '<idx>.pkl' files, the loading contract of
    hair_editor (ref: hair_editor.py:84-91, 111-119)."""
    os.makedirs(dir_path, exist_ok=True)
    with open(os.path.join(dir_path, f'{index:03d}.pkl'), 'wb') as f:
        pickle.dump(np.asarray(direction, np.float32), f)


def load_directions(dir_path: str) -> Optional[List[np.ndarray]]:
    if not os.path.isdir(dir_path):
        return None
    out = []
    for name in sorted(os.listdir(dir_path)):
        if not name.endswith('.pkl'):
            continue
        with open(os.path.join(dir_path, name), 'rb') as f:
            vec = pickle.load(f)
        out.append(np.asarray(vec, np.float32))
    return out or None


def render_candidate_grids(backend, att_name: str, out_dir: str,
                           n_candidates: int = 20,
                           values: Sequence[float] = (-2, -1, 0, 1, 2),
                           seed: int = 0) -> List[np.ndarray]:
    """Render a sweep grid per candidate direction for manual selection
    (ref: color_texture_branch/script_find_direction.py:27-74).

    Requires backend.set_input_img to have been called.  Returns the
    candidate directions; grids land in out_dir/candidate_<i>.png.
    """
    import jax.numpy as jnp
    from ctrlhair_tpu.utils.image import Canvas, to_uint8

    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    dim = int(getattr(backend.cur_latent, att_name).shape[-1])
    existing = list(backend.texture_dirs if att_name == 'texture'
                    else backend.shape_dirs)
    candidates = []
    for i in range(n_candidates):
        d = random_orthogonal_direction(dim, existing, rng)
        candidates.append(d)
        cell = backend.cfg.edit_size
        canvas = Canvas(1, len(values), cell=cell)
        saved = getattr(backend.cur_latent, att_name)
        for c, val in enumerate(values):
            backend.continue_change_with_direction(att_name,
                                                   jnp.asarray(d), val)
            img = backend.output()
            canvas.paste(0, c, img)
        backend.cur_latent = backend.cur_latent.replace(
            **{att_name: saved})
        if att_name == 'shape':
            backend.refresh_cur_mask()
        canvas.save(os.path.join(out_dir, f'candidate_{i:03d}.png'))
    return candidates
