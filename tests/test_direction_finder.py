# Semantic-direction curation: candidate generation, grid rendering, and
# the sorted-pkl persistence contract the Backend auto-loads
# (ref: util/find_semantic_direction.py:12-21, hair_editor.py:84-119).
import os

import numpy as np

from ctrlhair_tpu.pipeline.backend import Backend
from ctrlhair_tpu.pipeline.direction_finder import (
    load_directions, random_orthogonal_direction, render_candidate_grids,
    save_direction)

from test_pipeline import tiny_cfg


def test_random_orthogonal_direction_properties():
    rng = np.random.default_rng(0)
    existing = [np.eye(16, dtype=np.float32)[0],
                np.eye(16, dtype=np.float32)[3]]
    d = random_orthogonal_direction(16, existing, rng)
    assert abs(np.linalg.norm(d) - 1.0) < 1e-5
    for e in existing:
        assert abs(float(np.dot(d, e))) < 1e-5
    # sign canonicalisation: largest-|coord| component positive
    assert d[np.argmax(np.abs(d))] > 0


def test_save_load_roundtrip_and_backend_autoload(tmp_path):
    dirs = [np.arange(16, dtype=np.float32) / 100 + i for i in range(3)]
    for i, d in enumerate(dirs):
        save_direction(str(tmp_path), i, d)
    got = load_directions(str(tmp_path))
    assert len(got) == 3
    for a, b in zip(dirs, got):
        np.testing.assert_array_equal(a, b)


def test_render_candidate_grids(tmp_path, tiny_editor):
    be = Backend(maximum_value_fe=2.5, blending=False,
                 cfg=tiny_editor.cfg, editor=tiny_editor)
    rng = np.random.default_rng(3)
    be.set_input_img(rng.integers(0, 255, (64, 64, 3), dtype=np.uint8))
    cands = render_candidate_grids(be, 'texture', str(tmp_path),
                                   n_candidates=2, values=(-1.0, 1.0))
    assert len(cands) == 2
    files = sorted(os.listdir(tmp_path))
    assert files == ['candidate_000.png', 'candidate_001.png']
    # candidates are orthogonal to the default slider directions
    for c in cands:
        for e in be.texture_dirs:
            assert abs(float(np.dot(c, np.asarray(e)))) < 1e-4
    # the latent is restored after rendering
    assert be.cur_latent.texture.shape == (1, 8)
