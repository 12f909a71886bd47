# Learned landmark regressor (dlib stand-in): model contract, training
# convergence on the synthetic face distribution, and the
# load/estimate/fallback integration in ops.landmarks.
# Ref contract: external_code/landmarks_util.py:17-55 (detector + 68/81
# shape predictors behind module-level singletons).

import os

import numpy as np
import pytest


@pytest.fixture(scope='module')
def tiny_cfg():
    from ctrlhair_tpu.models.landmark_net import LandmarkNetConfig
    return LandmarkNetConfig(input_size=64, base_channels=8, stages=3,
                             hidden_dim=64, total_batch_size=16)


def test_forward_shapes(tiny_cfg):
    import jax
    import jax.numpy as jnp
    from ctrlhair_tpu.models.landmark_net import LandmarkNet
    net = LandmarkNet(tiny_cfg)
    x = jnp.zeros((3, 64, 64, 3))
    params = net.init(jax.random.PRNGKey(0), x)
    out = net.apply(params, x)
    assert out['landmarks'].shape == (3, 81, 2)
    assert out['presence'].shape == (3,)
    # zero-init head => the prediction starts AT the template prior
    from ctrlhair_tpu.ops.landmarks import canonical_template_81
    np.testing.assert_allclose(np.asarray(out['landmarks'][0]),
                               canonical_template_81(), atol=1e-4)


def test_synthetic_dataset_contract():
    from ctrlhair_tpu.data import landmark_dataset as D
    rng = np.random.default_rng(0)
    b = D.training_batch(rng, 12, size=64, neg_frac=0.3)
    assert b['image'].shape == (12, 64, 64, 3)
    assert b['landmarks'].shape == (12, 81, 2)
    assert b['image'].min() >= -1.0 and b['image'].max() <= 1.0
    assert b['landmarks'].min() >= 0.0 and b['landmarks'].max() <= 1.0
    assert set(np.unique(b['presence'])) <= {0.0, 1.0}
    # faces and negatives both occur at this neg_frac
    assert 0 < b['presence'].sum() < 12


def test_training_converges(tiny_cfg):
    """A few hundred tiny steps must cut the landmark error well below the
    template-prior baseline and classify face presence."""
    import jax
    import jax.numpy as jnp
    from ctrlhair_tpu.data import landmark_dataset as D
    from ctrlhair_tpu.training.landmark_trainer import LandmarkTrainer

    tr = LandmarkTrainer(tiny_cfg)
    state = tr.init_state(jax.random.PRNGKey(0))
    rng = np.random.default_rng(1)
    held = {k: jnp.asarray(v) for k, v in D.training_batch(
        np.random.default_rng(99), 64, size=64).items()}
    before = tr.eval_metrics(state.model.params, held)
    for _ in range(400):
        b = D.training_batch(rng, tiny_cfg.total_batch_size, size=64)
        state, m = tr.train_step(state,
                                 {k: jnp.asarray(v) for k, v in b.items()})
    assert bool(m['finite'])
    after = tr.eval_metrics(state.model.params, held)
    # initial = the template prior's error against transformed faces
    assert float(after['test/mean_dist_norm']) < \
        0.6 * float(before['test/mean_dist_norm'])
    assert float(after['test/presence_accuracy']) >= 0.9


def test_load_estimate_fallback(tiny_cfg, tmp_path):
    """load_landmark_net -> estimate_landmarks_81(method='net') round-trip,
    presence-reject fallback to contour, and unload."""
    import jax
    import jax.numpy as jnp
    from ctrlhair_tpu.data import landmark_dataset as D
    from ctrlhair_tpu.ops import landmarks as LM
    from ctrlhair_tpu.training.landmark_trainer import LandmarkTrainer
    from ctrlhair_tpu.utils.checkpoint import save_checkpoint

    tr = LandmarkTrainer(tiny_cfg)
    state = tr.init_state(jax.random.PRNGKey(0))
    rng = np.random.default_rng(2)
    for _ in range(300):
        b = D.training_batch(rng, tiny_cfg.total_batch_size, size=64)
        state, _ = tr.train_step(state,
                                 {k: jnp.asarray(v) for k, v in b.items()})
    ckpt = str(tmp_path / 'ckpt')
    save_checkpoint(ckpt, jax.tree_util.tree_map(
        np.asarray, state.model.params), 300)

    assert not LM.load_landmark_net(str(tmp_path / 'nothing'),
                                    cfg=tiny_cfg)
    assert LM.load_landmark_net(ckpt, cfg=tiny_cfg)
    try:
        # a rendered face: the net must land near ground truth
        lm_gt = D.transform_landmarks(np.random.default_rng(5))
        img = D.render_face(lm_gt, np.random.default_rng(5), size=64)
        label = np.zeros((64, 64), np.int32)   # parse intentionally empty
        est = LM.estimate_landmarks_81(label, method='net', image=img)
        gt_err = np.linalg.norm(est - np.clip(lm_gt, 0, 1),
                                axis=-1).mean()
        from ctrlhair_tpu.ops.landmarks import canonical_template_81
        prior_err = np.linalg.norm(
            canonical_template_81() - np.clip(lm_gt, 0, 1), axis=-1).mean()
        assert gt_err < prior_err
        # 68-point view slices the same estimate
        est68 = LM.estimate_landmarks_68(label, method='net', image=img)
        np.testing.assert_allclose(est68, est[:68])
        # presence-reject: a pure background must fall back to contour
        # (which, on an empty parse, is the bare template)
        bg = D.background(np.random.default_rng(6), 64)
        res = LM.net_landmarks_81(bg)
        if res is not None:           # net may accept an ambiguous frame
            assert res[1] >= 0.5
        fallback = LM.estimate_landmarks_81(label, method='net', image=bg)
        assert fallback.shape == (81, 2)
    finally:
        LM.unload_landmark_net()
    # with no net, method='net' falls back to contour
    out = LM.estimate_landmarks_81(label, method='net', image=img)
    np.testing.assert_allclose(
        out, LM.contour_landmarks_81(label), atol=1e-6)


@pytest.mark.skipif(not os.path.isdir('/root/reference/imgs'),
                    reason='reference sample photos not present')
def test_shipped_net_on_real_photos():
    """Detector-signal proof on REAL photographs (the synthetic suite
    can't prove this): the shipped net must accept every in-repo
    CelebA-HQ/FFHQ sample (presence >= 0.9) with sane geometry — eyes
    above mouth above chin, face spanning a plausible fraction of the
    aligned crop — and reject noise / flat / gradient non-faces.
    Ref runtime analogue: the dlib frontal detector + predictors,
    external_code/landmarks_util.py:17-19."""
    from ctrlhair_tpu.ops import landmarks as LM
    from ctrlhair_tpu.utils.image import read_rgb

    LM.unload_landmark_net()
    if not LM.load_landmark_net():
        pytest.skip('no trained landmark_net checkpoint in-tree')
    try:
        root = '/root/reference/imgs'
        files = sorted(f for f in os.listdir(root) if f.endswith('.png'))
        sel = files[::max(len(files) // 12, 1)][:12]
        assert len(sel) >= 8
        for f in sel:
            res = LM.net_landmarks_81(read_rgb(os.path.join(root, f)))
            assert res is not None, f'{f}: face rejected'
            lm, presence = res
            assert presence >= 0.9, (f, presence)
            assert lm.min() >= 0.0 and lm.max() <= 1.0, f
            eyes_y = lm[36:48, 1].mean()
            mouth_y = lm[48:68, 1].mean()
            chin_y = lm[8, 1]
            assert eyes_y < mouth_y < chin_y, (f, eyes_y, mouth_y, chin_y)
            assert 0.3 <= float(np.ptp(lm[:, 0])) <= 0.95, f
        rng = np.random.default_rng(0)
        non_faces = (
            rng.integers(0, 255, (256, 256, 3), dtype=np.uint8),
            np.full((256, 256, 3), 90, np.uint8),
            np.tile(np.linspace(0, 255, 256, dtype=np.uint8)[:, None, None],
                    (1, 256, 3)),
        )
        for i, im in enumerate(non_faces):
            assert LM.net_landmarks_81(im) is None, f'non-face {i} accepted'
    finally:
        LM.unload_landmark_net()


def _label_from_landmarks(lm, size):
    """GT landmarks -> a clean CelebA-style parse (the contour estimator's
    input contract) so net-from-image and contour-from-parse can be scored
    against the same ground truth."""
    import cv2
    from ctrlhair_tpu.constants import PARSING_LABEL_LIST
    from ctrlhair_tpu.data import landmark_dataset as D
    L = {n: i for i, n in enumerate(PARSING_LABEL_LIST)}
    lab = np.zeros((size, size), np.int32)

    def poly(pts, value):
        p = np.round(np.clip(np.asarray(pts), 0, 1) * size).astype(np.int32)
        cv2.fillPoly(lab, [p.reshape(-1, 1, 2)], value)

    c = lm[D._NOSE].mean(0)
    face_outline = np.concatenate([lm[D._JAW], lm[D._HAIRLINE][::-1]], 0)
    poly(c + (face_outline - c) * 1.22, L['hair'])
    poly(face_outline, L['skin_other'])
    poly(lm[D._BROW_L], L['l_brow'])
    poly(lm[D._BROW_R], L['r_brow'])
    poly(lm[D._EYE_L], L['l_eye'])
    poly(lm[D._EYE_R], L['r_eye'])
    poly(lm[D._NOSE], L['nose'])
    poly(lm[D._MOUTH_OUT], L['u_lip'])
    poly(lm[D._MOUTH_IN], L['mouth'])
    return lab


def test_shipped_net_matches_or_beats_contour():
    """VERDICT r4 gate: with the in-tree trained checkpoint, the learned
    regressor (from the IMAGE) must match or beat the contour estimator
    (from a CLEAN parse) on the synthetic transformed-face suite —
    rotations to +-25 deg, scale 0.75-1.2, shifts, per-group deformation
    (the adversarial axes of tests/test_landmarks.py).  Skips when no
    checkpoint ships (ref runtime artifact analogue:
    external_code/landmarks_util.py:17-19)."""
    from ctrlhair_tpu.data import landmark_dataset as D
    from ctrlhair_tpu.ops import landmarks as LM

    LM.unload_landmark_net()
    if not LM.load_landmark_net():
        pytest.skip('no trained landmark_net checkpoint in-tree')
    try:
        size = 256
        net_errs, contour_errs = [], []
        for i in range(24):
            rng = np.random.default_rng(1000 + i)
            gt = np.clip(D.transform_landmarks(rng), 0.0, 1.0)
            img = D.render_face(gt, rng, size=size)
            label = _label_from_landmarks(gt, size)
            est_net = LM.estimate_landmarks_81(label, method='net',
                                               image=img)
            est_contour = LM.estimate_landmarks_81(label, method='contour')
            net_errs.append(
                np.linalg.norm(est_net - gt, axis=-1).mean())
            contour_errs.append(
                np.linalg.norm(est_contour - gt, axis=-1).mean())
        net_err = float(np.mean(net_errs))
        contour_err = float(np.mean(contour_errs))
        print(f'clean parse: net {net_err:.4f} vs contour '
              f'{contour_err:.4f}')
        assert net_err <= contour_err + 0.005, \
            (net_err, contour_err)

        # the ADVERSARIAL half: parses corrupted the way real photos
        # corrupt them (glasses erase the eye regions; hair drawn over the
        # forehead shifts the apparent hairline/brows — the cases of
        # tests/test_landmarks.py).  The net reads the IMAGE and must now
        # strictly beat the parse-bound contour estimator.
        from ctrlhair_tpu.constants import PARSING_LABEL_LIST
        L = {n: i for i, n in enumerate(PARSING_LABEL_LIST)}
        net_errs2, contour_errs2 = [], []
        for i in range(24):
            rng = np.random.default_rng(2000 + i)
            gt = np.clip(D.transform_landmarks(rng), 0.0, 1.0)
            img = D.render_face(gt, rng, size=size)
            label = _label_from_landmarks(gt, size)
            # glasses: eyes+brows vanish from the parse
            for k in ('l_eye', 'r_eye', 'l_brow', 'r_brow'):
                label[label == L[k]] = L['eye_g']
            # fringe: hair claims the top rows of the face
            top = int((gt[D._HAIRLINE][:, 1].mean()
                       + 0.12 * rng.uniform(0.5, 1.5)) * size)
            band = label[:top] == L['skin_other']
            label[:top][band] = L['hair']
            est_net = LM.estimate_landmarks_81(label, method='net',
                                               image=img)
            est_contour = LM.estimate_landmarks_81(label,
                                                   method='contour')
            net_errs2.append(np.linalg.norm(est_net - gt, axis=-1).mean())
            contour_errs2.append(
                np.linalg.norm(est_contour - gt, axis=-1).mean())
        net_err2 = float(np.mean(net_errs2))
        contour_err2 = float(np.mean(contour_errs2))
        print(f'corrupted parse: net {net_err2:.4f} vs contour '
              f'{contour_err2:.4f}')
        assert net_err2 < contour_err2, (net_err2, contour_err2)
        # and 'auto' with an image routes through the net
        rng = np.random.default_rng(77)
        gt = np.clip(D.transform_landmarks(rng), 0, 1)
        img = D.render_face(gt, rng, size=size)
        label = _label_from_landmarks(gt, size)
        auto = LM.estimate_landmarks_81(label, image=img)
        np.testing.assert_allclose(
            auto, LM.estimate_landmarks_81(label, method='net', image=img))
    finally:
        LM.unload_landmark_net()
