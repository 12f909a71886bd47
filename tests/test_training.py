# Trainer tests: one fused D/G/Dz step per branch runs, stays finite, and
# actually moves parameters; predictor trainer learns a synthetic mapping;
# data-parallel + tensor-parallel execution over the virtual 8-device mesh.
import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from ctrlhair_tpu.config import (
    ColorTextureConfig, PredictorConfig, ShapeConfig)
from ctrlhair_tpu.parallel import mesh as pmesh
from ctrlhair_tpu.training.color_texture_trainer import (
    ColorTextureTrainer, synthetic_batch as ct_batch)
from ctrlhair_tpu.training.predictor_trainer import PredictorTrainer
from ctrlhair_tpu.training.shape_trainer import (
    ShapeTrainer, synthetic_batch as shape_batch)

TINY_CT = ColorTextureConfig(style_dim=64, g_hidden_dim=32, d_hidden_dim=32)
TINY_SHAPE = ShapeConfig(img_size=32, layer_num=3, max_channel=32,
                         hidden_in_channel=8, d_hidden_in_channel=8,
                         hair_dim=16, face_dim=64, d_hidden_dim=32)


def _params_changed(a, b) -> bool:
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    return any(not np.allclose(np.asarray(x), np.asarray(y))
               for x, y in zip(la, lb))


def test_ct_trainer_step():
    tr = ColorTextureTrainer(TINY_CT)
    state, pred = tr.init_state(jax.random.PRNGKey(0))
    batch = ct_batch(jax.random.PRNGKey(1), TINY_CT, 8)
    new_state, metrics = tr.train_step(state, batch, pred,
                                       jax.random.PRNGKey(2))
    assert bool(metrics['finite'])
    assert int(new_state.step) == 1
    assert np.isfinite(float(metrics['d_total']))
    assert np.isfinite(float(metrics['g_total']))
    assert np.isfinite(float(metrics['dz_total']))
    state2, _ = tr.init_state(jax.random.PRNGKey(0))
    assert _params_changed(new_state.gen.params, state2.gen.params)
    assert _params_changed(new_state.dis.params, state2.dis.params)


def test_ct_trainer_rec_img_loss():
    import dataclasses
    from ctrlhair_tpu.config import SEANConfig
    from ctrlhair_tpu.models.sean import SEAN
    sean_cfg = SEANConfig(crop_size=32, ngf=2, zencoder_ngf=2, style_dim=64)
    sean = SEAN(sean_cfg)
    img = jnp.zeros((1, 32, 32, 3))
    lab = jnp.zeros((1, 32, 32), jnp.int32)
    sean_params = sean.init(jax.random.PRNGKey(0), img, lab)
    # schedule the image loss on from step 0 so one step exercises it
    cfg = dataclasses.replace(TINY_CT, lambda_rec_img={0: 10.0})
    tr = ColorTextureTrainer(cfg, sean=sean, sean_params=sean_params)
    state, pred = tr.init_state(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    batch = dict(ct_batch(jax.random.PRNGKey(1), cfg, 4))
    batch['sean_code'] = jnp.asarray(
        rng.standard_normal((4, 19, 64)).astype(np.float32))
    batch['label'] = jnp.asarray(
        rng.integers(0, 19, (4, 32, 32)).astype(np.int32))
    batch['image'] = jnp.asarray(
        rng.standard_normal((4, 32, 32, 3)).astype(np.float32) * 0.3)
    new_state, metrics = tr.train_step(state, batch, pred,
                                       jax.random.PRNGKey(2))
    assert 'g/lambda_rec_img' in metrics
    assert np.isfinite(float(metrics['g/lambda_rec_img']))
    assert bool(metrics['finite'])


def test_ct_trainer_split_rec_img_matches_fused():
    """split_rec_img=True (rec_img gradient in its own program, for relay
    compile limits) computes the same update as the fused step."""
    import dataclasses
    import optax
    from ctrlhair_tpu.config import SEANConfig
    from ctrlhair_tpu.models.sean import SEAN
    sean_cfg = SEANConfig(crop_size=32, ngf=2, zencoder_ngf=2, style_dim=64)
    sean = SEAN(sean_cfg)
    sean_params = sean.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
                            jnp.zeros((1, 32, 32), jnp.int32))
    cfg = dataclasses.replace(TINY_CT, lambda_rec_img={0: 10.0})
    rng = np.random.default_rng(0)
    batch = dict(ct_batch(jax.random.PRNGKey(1), cfg, 4))
    batch['sean_code'] = jnp.asarray(
        rng.standard_normal((4, 19, 64)).astype(np.float32))
    batch['label'] = jnp.asarray(
        rng.integers(0, 19, (4, 32, 32)).astype(np.int32))
    batch['image'] = jnp.asarray(
        rng.standard_normal((4, 32, 32, 3)).astype(np.float32) * 0.3)
    outs = []
    for split in (False, True):
        tr = ColorTextureTrainer(cfg, sean=sean, sean_params=sean_params,
                                 split_rec_img=split)
        # SGD so the param diff is a toleranced gradient diff (Adam first
        # steps amplify last-bit reassociation into sign flips)
        tr.tx_g = tr.tx_d = tr.tx_dz = optax.sgd(0.1)
        state, pred = tr.init_state(jax.random.PRNGKey(0))
        new_state, m = tr.train_step(state, batch, pred,
                                     jax.random.PRNGKey(2))
        assert bool(m['finite'])
        assert np.isfinite(float(m['g/lambda_rec_img']))
        outs.append((new_state, m))
    (s_f, m_f), (s_s, m_s) = outs
    np.testing.assert_allclose(float(m_f['g_total']), float(m_s['g_total']),
                               rtol=1e-5)
    np.testing.assert_allclose(float(m_f['g/lambda_rec_img']),
                               float(m_s['g/lambda_rec_img']), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s_f.gen.params),
                    jax.tree_util.tree_leaves(s_s.gen.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=1e-4)


def test_ct_schedule_weights():
    from ctrlhair_tpu.training.losses import LossSchedule
    sch = LossSchedule(ColorTextureConfig())
    # lambda_rec_img: {0: 0, 600000: 1000}
    assert float(sch.weight('lambda_rec_img', 0)) == 0.0
    assert float(sch.weight('lambda_rec_img', 599999)) == 0.0
    assert float(sch.weight('lambda_rec_img', 600000)) == 1000.0
    assert float(sch.weight('lambda_rec', 5)) == 1000.0
    # the pure-host evaluation (used in per-step control flow) must agree
    # with the traced path at every schedule boundary
    for name in ('lambda_rec_img', 'lambda_rec'):
        for step in (0, 1, 599999, 600000, 600001):
            assert sch.weight_host(name, step) == float(
                sch.weight(name, step))


def test_adam_dict_lr_schedule():
    # adam() accepts {step: lr} so a GAN run can drop its learning rate
    # when a late loss term (lambda_rec_img) activates mid-run — the
    # optimizer-side half of the activation ramp (VERDICT r3 item 3).
    from ctrlhair_tpu.training.train_state import _dict_schedule, adam
    sched = _dict_schedule({0: 2e-4, 100: 5e-5, 200: 1e-5})
    assert float(sched(0)) == pytest.approx(2e-4)
    assert float(sched(99)) == pytest.approx(2e-4)
    assert float(sched(100)) == pytest.approx(5e-5)
    assert float(sched(199)) == pytest.approx(5e-5)
    assert float(sched(200)) == pytest.approx(1e-5)
    assert float(sched(10_000)) == pytest.approx(1e-5)

    # integration: the scheduled optimizer takes smaller steps after the
    # boundary than a same-gradient step before it
    tx = adam({0: 1e-2, 3: 1e-4})
    p = {'w': jnp.ones((4,))}
    st = tx.init(p)
    g = {'w': jnp.full((4,), 0.5)}
    sizes = []
    for _ in range(5):
        upd, st = tx.update(g, st, p)
        sizes.append(float(jnp.abs(upd['w']).max()))
        p = optax.apply_updates(p, upd)
    assert sizes[0] > 50 * sizes[-1]


def test_shape_trainer_step():
    tr = ShapeTrainer(TINY_SHAPE)
    state = tr.init_state(jax.random.PRNGKey(0))
    batch = shape_batch(jax.random.PRNGKey(1), TINY_SHAPE, 2)
    new_state, metrics = tr.train_step(state, batch, jax.random.PRNGKey(2))
    assert bool(metrics['finite'])
    assert np.isfinite(float(metrics['g_total']))
    state2 = tr.init_state(jax.random.PRNGKey(0))
    assert _params_changed(new_state.gen.params, state2.gen.params)


def test_shape_trainer_optional_branches():
    """lambda_info / lambda_moment_1/2 / disturb_real_batch_mask — the
    reference config branches inactive in 054 (ref:
    shape_branch/solver.py:94-107,136-141,227-230)."""
    import dataclasses
    cfg = dataclasses.replace(
        TINY_SHAPE, lambda_info=1.0, lambda_moment_1=1.0,
        lambda_moment_2=1.0, disturb_real_batch_mask=True)
    tr = ShapeTrainer(cfg)
    state = tr.init_state(jax.random.PRNGKey(0))
    batch = shape_batch(jax.random.PRNGKey(1), cfg, 2)
    # moment formulas vs the forward's own hair code (ref: solver.py:136-141)
    # — computed before train_step, which donates `state`
    fwd = jax.tree.map(np.asarray, tr._forward(
        state.gen.params, batch,
        jax.random.split(jax.random.PRNGKey(2))[0]))
    new_state, metrics = tr.train_step(state, batch, jax.random.PRNGKey(2))
    assert bool(metrics['finite'])
    for key in ('g/lambda_info', 'g/lambda_moment_1', 'g/lambda_moment_2'):
        assert key in metrics and np.isfinite(float(metrics[key]))
    code = np.asarray(fwd['hair_code'])
    m1 = float(np.mean(np.mean(code, axis=0) ** 2))
    m2 = float(np.mean((np.mean(code ** 2, axis=0) - 0.973) ** 2))
    assert np.isclose(float(metrics['g/lambda_moment_1']), m1, rtol=1e-4)
    assert np.isclose(float(metrics['g/lambda_moment_2']), m2, rtol=1e-4)
    assert 'gan_out_hair_code' in fwd
    state2 = tr.init_state(jax.random.PRNGKey(0))
    assert _params_changed(new_state.gen.params, state2.gen.params)


def test_shape_disturb_real_formula():
    """disturb_real: mask + U[0,0.03), renormalised over the label channel
    (ref: shape_branch/solver.py:227-230, torch dim=1 == NHWC axis -1)."""
    from ctrlhair_tpu.training.shape_trainer import disturb_real
    rng = np.random.default_rng(3)
    mask = jnp.asarray(rng.random((2, 8, 8, 19)).astype(np.float32))
    out = np.asarray(disturb_real(mask, jax.random.PRNGKey(0)))
    assert np.allclose(out.sum(-1), 1.0, atol=1e-5)
    delta = out * np.asarray(
        (jnp.sum(jax.random.uniform(jax.random.PRNGKey(0), mask.shape) * 0.03
                 + mask, axis=-1, keepdims=True))) - np.asarray(mask)
    assert delta.min() >= 0.0 and delta.max() <= 0.03 + 1e-6


def test_shape_geo_stats_formula():
    """geo_stats: hand-checked statistics on a known rectangle mask."""
    from ctrlhair_tpu.training.shape_trainer import N_GEO_STATS, geo_stats
    s = 32
    hair = np.zeros((1, s, s, 1), np.float32)
    hair[0, 10:20, 5:25, 0] = 1.0
    g = np.asarray(geo_stats(jnp.asarray(hair)))[0]
    assert g.shape == (N_GEO_STATS,)
    assert np.isclose(g[0], 10 * 20 / (s * s))          # area
    assert np.isclose(g[1], 19 / s)                     # lowest hair row
    assert np.isclose(g[2], 10 / s)                     # first hair row
    # forehead band rows 9..12, cols 11..19 -> hair rows 10..12 of 3 rows
    fore = hair[0, int(0.30 * s):int(0.42 * s),
                int(0.35 * s):int(0.65 * s), 0]
    assert np.isclose(g[3], fore.mean())
    # symmetric around the column midline except cols 5..15 vs 16..24
    left = hair[0, :, :16, 0].mean()
    right = hair[0, :, 16:, 0].mean()
    assert np.isclose(g[4], left - right)
    assert np.isclose(g[5], (24 - 5) / s)               # column extent
    fl, fr = fore[:, :fore.shape[1] // 2].sum(), \
        fore[:, fore.shape[1] // 2:].sum()
    assert np.isclose(g[6], (fl - fr) / (fl + fr + 1e-3))


def test_shape_trainer_geo_head_makes_latent_encode_geometry():
    """lambda_geo end-to-end: after a short train on masks whose hair area
    varies, the hair latent's posterior MEAN linearly predicts the area —
    the exact property pipeline/direction_finder.regression_directions
    needs (the r4/r5 soaks measured R^2 ~ 1e-4 without this term)."""
    import dataclasses
    from ctrlhair_tpu.constants import HAIR_IDX
    cfg = dataclasses.replace(TINY_SHAPE, lambda_geo=30.0,
                              kl_free_bits=0.25)
    tr = ShapeTrainer(cfg)
    state = tr.init_state(jax.random.PRNGKey(0))
    assert 'geo_head' in state.gen.params['params']
    s = cfg.img_size

    def mask_batch(key, n):
        ks = jax.random.split(key, n)
        labs = []
        for k in ks:
            depth = int(jax.random.randint(k, (), 4, s - 4))
            lab = np.full((s, s), 1, np.int32)        # skin everywhere
            lab[:depth] = HAIR_IDX                    # hair bar of var. depth
            labs.append(lab)
        oh = jax.nn.one_hot(jnp.asarray(np.stack(labs)), 19)
        return oh

    def batch(key):
        k = jax.random.split(key, 4)
        return {'target': mask_batch(k[0], 4), 'face': mask_batch(k[1], 4),
                'hair': mask_batch(k[2], 4), 'real': mask_batch(k[3], 4)}

    first_geo, last_geo = None, None
    for i in range(150):
        state, m = tr.train_step(state, batch(jax.random.PRNGKey(10 + i)),
                                 jax.random.PRNGKey(1000 + i))
        if first_geo is None:
            first_geo = float(m['g/lambda_geo'])
        last_geo = float(m['g/lambda_geo'])
    assert bool(m['finite'])
    assert last_geo < 0.7 * first_geo, (first_geo, last_geo)

    # probe: encode 48 fresh masks, ridge-regress area on the means
    probe = mask_batch(jax.random.PRNGKey(99), 48)
    hair = probe[..., HAIR_IDX:HAIR_IDX + 1]
    gen = tr.gen
    _, mean, _ = gen.apply(state.gen.params, hair,
                           method=gen.encode_hair)
    z = np.asarray(mean, np.float64)
    y = np.asarray(hair.mean((1, 2, 3)), np.float64)
    z0, y0 = z - z.mean(0), y - y.mean()
    w = np.linalg.solve(z0.T @ z0 + 1e-2 * len(y) * np.eye(z.shape[1]),
                        z0.T @ y0)
    r2 = 1.0 - ((y0 - z0 @ w) ** 2).sum() / ((y0 ** 2).sum() + 1e-12)
    assert r2 > 0.5, r2


def test_bisenet_trainer_step():
    from ctrlhair_tpu.config import BiSeNetConfig
    from ctrlhair_tpu.training.bisenet_trainer import (
        BiSeNetTrainer, ohem_cross_entropy)
    rng = np.random.default_rng(0)
    tr = BiSeNetTrainer(BiSeNetConfig(input_size=64), lr=1e-3)
    state = tr.init_state(jax.random.PRNGKey(0))
    batch = {'image': jnp.asarray(
        rng.standard_normal((2, 64, 64, 3)).astype(np.float32)),
        'label': jnp.asarray(rng.integers(0, 19, (2, 64, 64)).astype(
            np.int32))}
    new_state, metrics = tr.train_step(state, batch, jax.random.PRNGKey(1))
    assert bool(metrics['finite'])
    assert np.isfinite(float(metrics['total']))
    assert int(new_state.step) == 1  # (old state buffers are donated)
    # OHEM: an easy batch (one-hot-correct logits) has low loss, a hard
    # batch high loss
    labels = jnp.asarray(rng.integers(0, 19, (1, 16, 16)).astype(np.int32))
    easy = jax.nn.one_hot(labels, 19) * 20.0
    hard = -easy
    assert float(ohem_cross_entropy(easy, labels)) < 0.01
    assert float(ohem_cross_entropy(hard, labels)) > 1.0
    # ignore_label=255 pixels contribute nothing (upstream ignore_lb=255):
    # corrupting ignored pixels' logits must not change the loss
    lab255 = labels.at[0, :4, :4].set(255)
    base = float(ohem_cross_entropy(easy, lab255))
    corrupted = easy.at[0, :4, :4].set(-50.0)
    assert abs(float(ohem_cross_entropy(corrupted, lab255)) - base) < 1e-6
    all_ignored = jnp.full_like(labels, 255)
    assert float(ohem_cross_entropy(easy, all_ignored)) == 0.0


def test_predictor_trainer_learns():
    cfg = PredictorConfig(style_dim=16, hidden_dim=32, dropout=0.0,
                          norm='none', predict_dict={'rgb_mean': 3,
                                                     'pca_std': 1})
    tr = PredictorTrainer(cfg)
    state = tr.init_state(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    w = rng.standard_normal((16, 3)).astype(np.float32)
    codes = rng.standard_normal((256, 16)).astype(np.float32)
    batch = {'code': jnp.asarray(codes),
             'rgb_mean': jnp.asarray(codes @ w),
             'pca_std': jnp.asarray(codes.sum(1, keepdims=True))}
    first = None
    for i in range(60):
        state, metrics = tr.train_step(state, batch, jax.random.PRNGKey(i))
        if first is None:
            first = float(metrics['total'])
    assert float(metrics['total']) < first * 0.2
    ev = tr.eval_metrics(state.model.params, state.stats, batch)
    assert np.isfinite(float(ev['test/lambda_rgb']))


def test_dp_training_over_mesh():
    assert len(jax.devices()) >= 8, 'conftest must provide 8 cpu devices'
    mesh = pmesh.make_mesh(8, tp=1)
    tr = ColorTextureTrainer(TINY_CT)
    state, pred = tr.init_state(jax.random.PRNGKey(0))
    batch = ct_batch(jax.random.PRNGKey(1), TINY_CT, 16)
    with mesh:
        state = jax.device_put(state, pmesh.replicated(mesh))
        pred = jax.device_put(pred, pmesh.replicated(mesh))
        batch = pmesh.shard_batch(batch, mesh)
        new_state, metrics = tr.train_step(state, batch, pred,
                                           jax.random.PRNGKey(2))
    assert bool(metrics['finite'])


def test_dp_tp_mesh_param_sharding():
    mesh = pmesh.make_mesh(8, tp=2)
    tr = ColorTextureTrainer(TINY_CT)
    state, pred = tr.init_state(jax.random.PRNGKey(0))
    sharded = pmesh.shard_params(state.dis.params, mesh)
    # at least one kernel should actually be split over tp
    specs = [x.sharding.spec for x in jax.tree_util.tree_leaves(sharded)
             if hasattr(x, 'sharding')]
    assert any('tp' in str(s) for s in specs)
    batch = ct_batch(jax.random.PRNGKey(1), TINY_CT, 16)
    with mesh:
        state = state.replace(
            dis=state.dis.replace(params=sharded))
        batch = pmesh.shard_batch(batch, mesh)
        new_state, metrics = tr.train_step(state, batch, pred,
                                           jax.random.PRNGKey(2))
    assert bool(metrics['finite'])


def test_kl_free_bits_floor():
    """kl_loss_free_bits == kl_loss at free_bits=0; with a floor, collapsed
    dimensions contribute the constant floor (gradient-free), so the total
    can never be pushed below free_bits (the posterior-collapse counter)."""
    import jax
    import jax.numpy as jnp

    from ctrlhair_tpu.training import losses as L
    rng = np.random.default_rng(0)
    mean = jnp.asarray(rng.standard_normal((8, 16)), jnp.float32)
    std = jnp.asarray(rng.uniform(0.5, 1.5, (8, 16)), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(L.kl_loss_free_bits(mean, std, 0.0)),
        np.asarray(L.kl_loss(mean, std)), rtol=1e-6)
    # a collapsed posterior (mean 0, std 1): plain KL ~ 0, floored KL = fb
    zm, zs = jnp.zeros((8, 16)), jnp.ones((8, 16))
    assert float(L.kl_loss(zm, zs)) < 1e-3
    fb = 0.25
    np.testing.assert_allclose(
        float(L.kl_loss_free_bits(zm, zs, fb)), fb, atol=1e-4)
    # gradient through a collapsed dim is zero (the floor is a constant)
    g = jax.grad(lambda m: L.kl_loss_free_bits(m, zs, fb))(zm)
    np.testing.assert_allclose(np.asarray(g), 0.0, atol=1e-6)


def test_chunked_loop_matches_per_step():
    """ChunkRunner(K steps per dispatch) matches the per-step host loop:
    same per-step PRNG streams (batch_seed/step_seed offsets), same update
    order, same recording cadence.  Numerics agree to float32 tolerance —
    XLA fuses the scan body differently from the standalone step, so
    rounding differs in the last bits (~1e-9 after 7 Adam steps)."""
    from ctrlhair_tpu.training.chunked import ChunkRunner

    tr = ShapeTrainer(TINY_SHAPE)
    batch_seed, step_seed, total = 2_000_000, 0, 7

    def make_batch(key):
        return shape_batch(key, TINY_SHAPE, 2)

    # per-step reference loop (exactly the soak's structure)
    state_a = tr.init_state(jax.random.PRNGKey(0))
    rows_a = []
    for step in range(total):
        b = make_batch(jax.random.PRNGKey(batch_seed + step))
        state_a, m = tr.train_step(state_a, b,
                                   jax.random.PRNGKey(step_seed + step))
        if step % 2 == 0 or step == total - 1:
            rows_a.append({'step': step,
                           **{k: float(v) for k, v in m.items()}})

    # chunked loop, uneven chunk size to exercise the remainder dispatch
    runner = ChunkRunner(tr._train_step, make_batch,
                         batch_seed=batch_seed, step_seed=step_seed)
    state_b = tr.init_state(jax.random.PRNGKey(0))
    seen_chunks = []
    state_b, rows_b, trips = runner.run(
        state_b, 0, total, chunk_size=3, record_every=2,
        on_chunk=lambda s, st, rws: seen_chunks.append(s))
    assert seen_chunks == [3, 6, 7]
    assert trips == 0
    assert int(np.asarray(state_b.step)) == total

    assert [r['step'] for r in rows_b] == [r['step'] for r in rows_a]
    for ra, rb in zip(rows_a, rows_b):
        for k in ra:
            np.testing.assert_allclose(rb[k], ra[k], rtol=1e-6, err_msg=k)
    for la, lb in zip(jax.tree_util.tree_leaves(state_a.gen.params),
                      jax.tree_util.tree_leaves(state_b.gen.params)):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   rtol=1e-3, atol=1e-6)


def test_chunked_loop_resume_matches_straight_run():
    """Stopping a chunked run mid-way and resuming from the returned state
    continues the identical stream (start offsets are honoured)."""
    from ctrlhair_tpu.training.chunked import ChunkRunner

    tr = ShapeTrainer(TINY_SHAPE)

    def make_batch(key):
        return shape_batch(key, TINY_SHAPE, 2)

    runner = ChunkRunner(tr._train_step, make_batch, batch_seed=77)
    s1 = tr.init_state(jax.random.PRNGKey(0))
    s1, _, _ = runner.run(s1, 0, 6, chunk_size=2)

    s2 = tr.init_state(jax.random.PRNGKey(0))
    s2, _, _ = runner.run(s2, 0, 4, chunk_size=4)
    s2, _, _ = runner.run(s2, 4, 6, chunk_size=4)   # resume
    for la, lb in zip(jax.tree_util.tree_leaves(s1.gen.params),
                      jax.tree_util.tree_leaves(s2.gen.params)):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
