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


def test_regression_directions_recover_planted_semantics():
    """Plant four linear statistics in a synthetic latent cloud; the
    regression must recover each planted direction (cosine > 0.95 before
    orthogonalisation-induced mixing), ship unit-norm mutually-orthogonal
    vectors signed so +direction increases its statistic, and report
    near-1 R^2 (and near-0 R^2 for a statistic of pure noise)."""
    from ctrlhair_tpu.pipeline.direction_finder import (
        SHAPE_SLOTS, regression_directions)
    rng = np.random.default_rng(3)
    z = rng.standard_normal((400, 16))
    planted = {}
    for i, m in enumerate(SHAPE_SLOTS):
        d = np.zeros(16)
        d[i * 3] = 0.8
        d[i * 3 + 1] = 0.6
        planted[m] = d
    stats = {m: z @ planted[m] + 0.05 * rng.standard_normal(400)
             for m in SHAPE_SLOTS}
    dirs, report = regression_directions(z, stats)
    assert len(dirs) == 4
    for i, m in enumerate(SHAPE_SLOTS):
        assert abs(np.linalg.norm(dirs[i]) - 1.0) < 1e-5
        cos = float(np.dot(dirs[i], planted[m])
                    / np.linalg.norm(planted[m]))
        assert cos > 0.95, (m, cos)          # sign AND alignment
        assert report[i]['r2'] > 0.95, report[i]
    for i in range(4):
        for j in range(i + 1, 4):
            assert abs(float(np.dot(dirs[i], dirs[j]))) < 1e-6

    # a pure-noise statistic is reported honestly: R^2 ~ 0
    noise_stats = dict(stats)
    noise_stats['length'] = rng.standard_normal(400)
    _, rep2 = regression_directions(z, noise_stats)
    assert rep2[0]['r2'] < 0.2


def test_data_driven_shape_directions_end_to_end(tiny_editor, tmp_path):
    """Encode a small synthetic warp pool through the tiny shape VAE and
    check the wrapper ships 4 unit-norm orthogonal pickles + a report with
    per-slot R^2 (value untested — the net is random-init)."""
    from PIL import Image

    from ctrlhair_tpu.constants import HAIR_IDX, PARSING_LABEL_LIST
    from ctrlhair_tpu.pipeline.direction_finder import (
        data_driven_shape_directions, load_directions)

    skin = PARSING_LABEL_LIST.index('skin_other')
    s = tiny_editor.cfg.shape.img_size
    pool = tmp_path / 'pool'
    pool.mkdir()
    rng = np.random.default_rng(0)
    # > hair_dim masks: the fit guard refuses underdetermined pools
    n_masks = tiny_editor.cfg.shape.hair_dim + 4
    for i in range(n_masks):
        lab = np.zeros((s, s), np.uint8)
        lab[s // 3:, s // 4: 3 * s // 4] = skin       # face blob
        top = int(rng.integers(0, s // 4))
        depth = int(rng.integers(s // 3, s - 1))
        lab[top:depth, s // 8: 7 * s // 8] = HAIR_IDX  # varied hair
        Image.fromarray(lab).save(pool / f'm{i}.png')

    out = tmp_path / 'dirs'
    dirs, report = data_driven_shape_directions(
        tiny_editor, tiny_editor.params, str(pool), max_masks=n_masks,
        save_dir=str(out), report_path=str(tmp_path / 'report.json'))
    assert len(dirs) == 4 and len(report) == 4
    loaded = load_directions(str(out))
    assert len(loaded) == 4
    for i, d in enumerate(loaded):
        assert abs(np.linalg.norm(d) - 1.0) < 1e-4
        for j in range(i + 1, 4):
            assert abs(float(np.dot(d, loaded[j]))) < 1e-4
    assert all('r2' in r and r['n_masks'] == n_masks for r in report)
    assert os.path.exists(tmp_path / 'report.json')


def test_save_load_roundtrip_and_backend_autoload(tmp_path):
    dirs = [np.arange(16, dtype=np.float32) / 100 + i for i in range(3)]
    for i, d in enumerate(dirs):
        save_direction(str(tmp_path), i, d)
    got = load_directions(str(tmp_path))
    assert len(got) == 3
    for a, b in zip(dirs, got):
        np.testing.assert_array_equal(a, b)


def test_shipped_direction_pickles_load_and_are_sound():
    """The curated pickles committed under model_trained/ (soak stage E)
    must load from the checkout regardless of CWD, fill every UI slot,
    and be unit-norm + mutually orthogonal — the runtime slider contract
    (ref: hair_editor.py:82-119, ui/backend.py:211-226)."""
    for rel, dim, n in (('model_trained/shape_dir_used', 16, 4),
                        ('model_trained/texture_dir_used', 8, 2)):
        got = load_directions(rel)
        assert got is not None and len(got) == n, rel
        mat = np.stack(got)
        assert mat.shape == (n, dim)
        # unit-norm (a zero pickle = a permanently dead slider, the r3 bug)
        np.testing.assert_allclose(np.linalg.norm(mat, axis=1), 1.0,
                                   atol=1e-4)
        # mutually orthogonal: be2fe projections must not cross-talk
        gram = mat @ mat.T
        np.testing.assert_allclose(gram, np.eye(n), atol=1e-4)


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


def test_auto_curate_ships_all_slots(tmp_path, tiny_editor):
    from ctrlhair_tpu.pipeline.direction_finder import (
        SHAPE_SLOTS, TEXTURE_SLOTS, auto_curate)
    be = Backend(maximum_value_fe=2.5, blending=False,
                 cfg=tiny_editor.cfg, editor=tiny_editor)
    rng = np.random.default_rng(5)
    be.set_input_img(rng.integers(0, 255, (64, 64, 3), dtype=np.uint8))
    for att, slots in (('shape', SHAPE_SLOTS), ('texture', TEXTURE_SLOTS)):
        save_dir = str(tmp_path / f'{att}_dir_used')
        before = np.asarray(getattr(be.cur_latent, att)).copy()
        dirs_, report = auto_curate(
            be, att, n_candidates=max(len(slots) + 1, 3),
            values=(-1.0, 0.0, 1.0), seed=1, save_dir=save_dir,
            report_path=str(tmp_path / f'{att}.json'))
        assert len(dirs_) == len(slots)
        assert [r['label'] for r in report] == slots
        # +slider increases the labelled metric (sign canonicalisation)
        for r in report:
            assert r['slope'] * 1.0 >= 0 or abs(r['slope']) < 1e-12
        # unit norm + pairwise orthogonal (independent sliders)
        for i, a in enumerate(dirs_):
            assert abs(np.linalg.norm(a) - 1.0) < 1e-4
            for b in dirs_[i + 1:]:
                assert abs(float(np.dot(a, b))) < 1e-4
        # persisted in the Backend's auto-load contract
        got = load_directions(save_dir)
        assert got is not None and len(got) == len(slots)
        # latent restored after curation
        np.testing.assert_allclose(
            np.asarray(getattr(be.cur_latent, att)), before)


def test_shape_and_texture_metrics_respond():
    from ctrlhair_tpu.constants import HAIR_IDX
    from ctrlhair_tpu.pipeline.direction_finder import (
        _face_band, shape_metrics, texture_metrics)
    mask = np.zeros((64, 64), np.int32)
    mask[20:40, 20:44] = 1           # face skin
    mask[22:24, 24:40] = 6           # brows
    band = _face_band(mask)
    (r0, r1), (c0, c1) = band
    assert r0 == 20 and r1 == 22
    short = mask.copy()
    short[10:20, 16:48] = HAIR_IDX   # cap of hair above the face
    long = short.copy()
    long[20:60, 10:16] = HAIR_IDX    # hair falling past the jaw
    ms, ml = shape_metrics(short, band), shape_metrics(long, band)
    assert ml['length'] > ms['length']
    assert ml['volume'] > ms['volume']
    fringe = short.copy()
    fringe[20:22, 20:32] = HAIR_IDX  # left-side fringe in the band
    mf = shape_metrics(fringe, band)
    assert mf['bangs'] > ms['bangs']
    assert mf['bangs_direction'] > 0
    # texture: noise in the hair region is less smooth than flat grey
    rng = np.random.default_rng(0)
    flat = np.full((64, 64, 3), 128, np.uint8)
    noisy = flat.copy()
    noisy[short == HAIR_IDX] = rng.integers(0, 255, (int(
        (short == HAIR_IDX).sum()), 3), dtype=np.uint8).astype(np.uint8)
    tf, tn = (texture_metrics(i, short) for i in (flat, noisy))
    assert tn['smoothness'] < tf['smoothness']
    assert tn['thickness'] > tf['thickness']


def test_check_directions_alive_gate():
    """The liveliness gate fails dead directions (R^2 ~ 0 / flat probes —
    the r4 shipped state) and passes live ones."""
    from ctrlhair_tpu.pipeline.direction_finder import check_directions_alive
    dead_rep = [{'label': 'length', 'r2': 1e-4},
                {'label': 'volume', 'r2': 0.5}]
    dead_probes = {'length': {'length': 0.0001},
                   'volume': {'volume': 0.0}}
    failures = check_directions_alive(dead_rep, dead_probes)
    assert len(failures) == 3   # length r2, length probe, volume probe
    live_rep = [{'label': 'length', 'r2': 0.62},
                {'label': 'volume', 'r2': 0.41}]
    live_probes = {'length': {'length': 0.12}, 'volume': {'volume': -0.08}}
    assert check_directions_alive(live_rep, live_probes) == []


def test_regression_directions_degenerate_fallback_is_orthogonal():
    """Zero-coefficient slots fall back to a basis vector orthogonalised
    against the kept set (ADVICE r4: the raw eye-vector could be collinear
    with an already-kept direction)."""
    from ctrlhair_tpu.pipeline.direction_finder import (
        SHAPE_SLOTS, regression_directions)
    rng = np.random.default_rng(5)
    z = rng.standard_normal((100, 16))
    # first slot's statistic IS e0 (so dir0 ~ e0); the rest pure constants
    # (zero coefficients -> degenerate fallback, whose naive eye(d)[i]
    # choice for i=1 would collide with nothing, but i=0's kept e0 shows
    # the re-orthogonalisation)
    stats = {m: (z[:, 0] if i == 0 else np.zeros(100))
             for i, m in enumerate(SHAPE_SLOTS)}
    dirs, report = regression_directions(z, stats)
    mat = np.stack(dirs)
    np.testing.assert_allclose(np.linalg.norm(mat, axis=1), 1.0, atol=1e-5)
    gram = mat @ mat.T
    np.testing.assert_allclose(gram, np.eye(4), atol=1e-5)


def test_pool_guards_raise_clearly(tiny_editor, tmp_path):
    """Empty or underdetermined pools are loud errors, not silent
    garbage fits (ADVICE r4)."""
    import pytest
    from PIL import Image

    from ctrlhair_tpu.constants import HAIR_IDX
    from ctrlhair_tpu.pipeline.direction_finder import (
        data_driven_shape_directions)
    empty = tmp_path / 'empty'
    empty.mkdir()
    with pytest.raises(ValueError, match='no .png masks'):
        data_driven_shape_directions(tiny_editor, tiny_editor.params,
                                     str(empty))
    small = tmp_path / 'small'
    small.mkdir()
    s = tiny_editor.cfg.shape.img_size
    for i in range(3):
        lab = np.zeros((s, s), np.uint8)
        lab[:s // 2] = HAIR_IDX
        Image.fromarray(lab).save(small / f'm{i}.png')
    with pytest.raises(ValueError, match='underdetermined'):
        data_driven_shape_directions(tiny_editor, tiny_editor.params,
                                     str(small))
