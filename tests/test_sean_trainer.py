# SEAN pix2pix trainer: one fused G/D step on a tiny config.
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ctrlhair_tpu.config import SEANConfig
from ctrlhair_tpu.models.sean_discriminator import (
    MultiscaleDiscriminator, NLayerDiscriminator, VGG19Features)
from ctrlhair_tpu.training.sean_trainer import SEANTrainer

TINY = SEANConfig(crop_size=64, ngf=4, zencoder_ngf=4, style_dim=64,
                  use_ace_noise=True)
TINY_REMAT = SEANConfig(crop_size=64, ngf=4, zencoder_ngf=4, style_dim=64,
                        use_ace_noise=True, remat_blocks=True)


def test_sean_train_step_with_remat(rng):
    tr = SEANTrainer(TINY_REMAT, use_vgg=False)
    state = tr.init_state(jax.random.PRNGKey(0))
    batch = {
        'image': jnp.asarray(
            rng.standard_normal((2, 64, 64, 3)).astype(np.float32)) * 0.5,
        'label': jnp.asarray(rng.integers(0, 19, (2, 64, 64)).astype(
            np.int32)),
    }
    new_state, metrics = tr.train_step(state, batch, jax.random.PRNGKey(1))
    assert bool(metrics['finite'])


def test_nlayer_discriminator_shapes(rng):
    d = NLayerDiscriminator(ndf=8, input_nc=22)
    x = jnp.asarray(rng.standard_normal((1, 64, 64, 22)).astype(np.float32))
    p = d.init(jax.random.PRNGKey(0), x)
    feats = d.apply(p, x)
    assert len(feats) == 5           # 4 intermediate + logits
    assert feats[-1].shape[-1] == 1


def test_multiscale_discriminator(rng):
    d = MultiscaleDiscriminator(ndf=8, input_nc=22)
    x = jnp.asarray(rng.standard_normal((1, 64, 64, 22)).astype(np.float32))
    p = d.init(jax.random.PRNGKey(0), x)
    outs = d.apply(p, x)
    assert len(outs) == 2
    # second scale operates on 2x downsampled input (±1 from k4/p2 rounding)
    assert abs(outs[1][0].shape[1] - outs[0][0].shape[1] // 2) <= 1


def test_vgg19_slices(rng):
    v = VGG19Features()
    x = jnp.asarray(rng.standard_normal((1, 64, 64, 3)).astype(np.float32))
    p = v.init(jax.random.PRNGKey(0), x)
    slices = v.apply(p, x)
    assert len(slices) == 5
    assert slices[0].shape == (1, 64, 64, 64)     # relu1_1
    assert slices[-1].shape[-1] == 512


def test_vgg19_conversion_structure(rng):
    torch = pytest.importorskip('torch')
    from ctrlhair_tpu.models.sean_discriminator import (
        convert_vgg19, _VGG19_CFG)
    # build a torchvision-layout features state dict
    sd = {}
    feat_idx = 0
    cin = 3
    for v in _VGG19_CFG:
        if v == 'M':
            feat_idx += 1
            continue
        sd[f'{feat_idx}.weight'] = torch.randn(v, cin, 3, 3)
        sd[f'{feat_idx}.bias'] = torch.zeros(v)
        cin = v
        feat_idx += 2
    params = convert_vgg19(sd)
    model = VGG19Features()
    x = jnp.zeros((1, 32, 32, 3))
    target = model.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(target) == \
        jax.tree_util.tree_structure(
            jax.tree_util.tree_map(jnp.asarray, params))


def test_sean_train_step(rng):
    tr = SEANTrainer(TINY, use_vgg=True)
    state = tr.init_state(jax.random.PRNGKey(0))
    batch = {
        'image': jnp.asarray(
            rng.standard_normal((2, 64, 64, 3)).astype(np.float32)) * 0.5,
        'label': jnp.asarray(rng.integers(0, 19, (2, 64, 64)).astype(
            np.int32)),
    }
    # snapshot before stepping: train_step donates the old state buffers
    stats_before = jax.tree_util.tree_map(np.asarray, state.gen_stats)
    new_state, metrics = tr.train_step(state, batch, jax.random.PRNGKey(1))
    assert bool(metrics['finite'])
    assert np.isfinite(float(metrics['g_total']))
    assert np.isfinite(float(metrics['d_total']))
    assert int(new_state.step) == 1
    # running sync-BN stats moved
    a = jax.tree_util.tree_leaves(stats_before)
    b = jax.tree_util.tree_leaves(new_state.gen_stats)
    assert any(not np.allclose(np.asarray(x), np.asarray(y))
               for x, y in zip(a, b))


def test_sean_spectral_norm_state(rng):
    """With cfg.spectral_norm: power-iteration vectors exist for the SEAN
    generator convs AND every discriminator conv (reference default
    norm_D='spectralinstance'), and both update after a step."""
    cfg = SEANConfig(crop_size=32, ngf=4, zencoder_ngf=4, style_dim=32,
                     use_ace_noise=False, spectral_norm=True)
    tr = SEANTrainer(cfg, use_vgg=False)
    state = tr.init_state(jax.random.PRNGKey(0))
    assert state.sn_u is not None and state.dis_sn_u is not None
    d_us = [u for u in jax.tree_util.tree_leaves(state.dis_sn_u)
            if u is not None]
    # every D conv kernel is normalised (2 scales x (n_layers + out))
    n_kernels = sum(1 for p, l in jax.tree_util.tree_flatten_with_path(
        state.dis.params)[0]
        if str(getattr(p[-1], 'key', p[-1])) == 'kernel' and l.ndim == 4)
    assert len(d_us) == n_kernels and n_kernels > 0
    before = np.asarray(d_us[0]).copy()   # train_step donates the state
    batch = {
        'image': jnp.asarray(np.random.default_rng(0).uniform(
            -1, 1, (2, 32, 32, 3)), jnp.float32),
        'label': jnp.asarray(np.random.default_rng(0).integers(
            0, 19, (2, 32, 32)), jnp.int32),
    }
    new_state, m = tr.train_step(state, batch, jax.random.PRNGKey(1))
    assert bool(m['finite'])
    after = [u for u in jax.tree_util.tree_leaves(new_state.dis_sn_u)
             if u is not None][0]
    assert not np.allclose(before, np.asarray(after))


def test_sean_split_step_matches_fused(rng):
    """The split-program fallback (two half-size programs for environments
    with prohibitive fused-compile cost) computes the same update as the
    fused step."""
    batch = {
        'image': jnp.asarray(
            rng.standard_normal((2, 64, 64, 3)).astype(np.float32)) * 0.5,
        'label': jnp.asarray(rng.integers(0, 19, (2, 64, 64)).astype(
            np.int32)),
    }
    import optax
    outs = []
    for split in (False, True):
        tr = SEANTrainer(TINY, use_vgg=False, split_step=split)
        # SGD instead of Adam for the comparison: Adam with beta1=0 turns
        # the first update into lr*sign(g), so last-bit gradient
        # reassociation between the one-program and two-program partitions
        # flips signs on near-zero grads; with SGD the param diff IS a
        # toleranced gradient diff
        tr.tx_g = tr.tx_d = optax.sgd(0.1)
        state = tr.init_state(jax.random.PRNGKey(0))
        new_state, metrics = tr.train_step(state, batch,
                                           jax.random.PRNGKey(1))
        assert bool(metrics['finite'])
        outs.append((new_state, metrics))
    (s_f, m_f), (s_s, m_s) = outs
    np.testing.assert_allclose(float(m_f['g_total']),
                               float(m_s['g_total']), rtol=1e-5)
    np.testing.assert_allclose(float(m_f['d_total']),
                               float(m_s['d_total']), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s_f.gen.params),
                    jax.tree_util.tree_leaves(s_s.gen.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(s_f.dis.params),
                    jax.tree_util.tree_leaves(s_s.dis.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)
