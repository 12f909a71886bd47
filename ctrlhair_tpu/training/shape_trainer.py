# Shape branch (mask VAE-GAN) trainer.
#
# Parity target: shape_branch/train.py + shape_branch/solver.py:68-244 —
# triplet batches (face mask, warped-target mask, donor-hair mask), VAE
# encode of the target hair with per-pixel CE regularisers, self-rec through
# the donor mask, KL, hinge2 adversarial with R0 gradient penalty on reals,
# and a latent-prior discriminator on hair codes.  One jitted fused
# D/G/Dz step; DP comes from jit + batch sharding.

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from ctrlhair_tpu.config import ShapeConfig
from ctrlhair_tpu.models.shape import (
    ShapeDiscriminator, ShapeDiscriminatorNoise, ShapeGenerator)
from ctrlhair_tpu.training import losses as L
from ctrlhair_tpu.training.train_state import (
    GANTrainState, ModelOpt, adam, grads_finite, safe_apply_updates)
from ctrlhair_tpu.utils.masks import split_hair_face


def _masked_mean(values: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    m = mask.astype(jnp.float32)
    return jnp.sum(values * m) / jnp.maximum(jnp.sum(m), 1.0)


def disturb_real(mask: jnp.ndarray, rng: jax.Array) -> jnp.ndarray:
    """Uniform-noise mask disturbance, renormalised over the label channel
    (ref: shape_branch/solver.py:227-230; torch dim=1 == our NHWC axis -1)."""
    cur = jax.random.uniform(rng, mask.shape, mask.dtype) * 0.03 + mask
    return cur / jnp.sum(cur, axis=-1, keepdims=True)


N_GEO_STATS = 7


def geo_stats(hair: jnp.ndarray) -> jnp.ndarray:
    """[B,S,S,1] soft hair mask -> [B, N_GEO_STATS] geometry statistics,
    all O(1) fractions, computed in-graph (static shapes, reductions only —
    no host round trip).  Columns: area, lowest-hair-row (length), first-
    hair-row (top), forehead-band coverage (bangs), left/right mass
    asymmetry, column extent (width), band-normalised left/right asymmetry
    (bangs_direction).  Targets for the lambda_geo head; mirrors the
    host-side statistics direction curation regresses on
    (pipeline/direction_finder.py::shape_metrics)."""
    h = hair[..., 0].astype(jnp.float32)            # [B,S,S]
    s = h.shape[1]
    present = jnp.float32(1.0) * (h > 0.5)
    row_any = jnp.max(present, axis=2)              # [B,S]
    col_any = jnp.max(present, axis=1)              # [B,S]
    idx = jnp.arange(s, dtype=jnp.float32) / s
    rev = jnp.arange(s - 1, -1, -1, dtype=jnp.float32) / s
    area = jnp.mean(h, axis=(1, 2))
    length = jnp.max(row_any * idx[None], axis=1)
    # first hair row r == (s-1)/s - max over the descending ramp (s-1-r)/s;
    # degenerates to (s-1)/s when no hair at all
    top = (s - 1.0) / s - jnp.max(row_any * rev[None], axis=1)
    fore = h[:, int(0.30 * s):int(0.42 * s), int(0.35 * s):int(0.65 * s)]
    bangs = jnp.mean(fore, axis=(1, 2))
    half = s // 2
    asym = jnp.mean(h[:, :, :half], axis=(1, 2)) - \
        jnp.mean(h[:, :, half:], axis=(1, 2))
    width = jnp.max(col_any * idx[None], axis=1) - \
        ((s - 1.0) / s - jnp.max(col_any * rev[None], axis=1))
    fhalf = fore.shape[2] // 2
    fl = jnp.sum(fore[:, :, :fhalf], axis=(1, 2))
    fr = jnp.sum(fore[:, :, fhalf:], axis=(1, 2))
    band_asym = (fl - fr) / (fl + fr + 1e-3)
    return jnp.stack([area, length, top, bangs, asym, width, band_asym],
                     axis=1)


class ShapeTrainer:
    def __init__(self, cfg: ShapeConfig):
        self.cfg = cfg
        self.gen = ShapeGenerator(cfg, train=True)
        self.dis = ShapeDiscriminator(cfg, train=True)
        self.dis_noise = ShapeDiscriminatorNoise(cfg, train=True)
        self.schedule = L.LossSchedule(cfg)
        self.tx_g = adam(cfg.lr_g, cfg.beta1, cfg.beta2)
        self.tx_d = adam(cfg.lr_d, cfg.beta1, cfg.beta2)
        self.tx_dz = adam(cfg.lr_dz, cfg.beta1, cfg.beta2)
        self.train_step = jax.jit(self._train_step, donate_argnums=(0,))

    def init_state(self, rng: jax.Array) -> GANTrainState:
        cfg = self.cfg
        k = jax.random.split(rng, 3)
        s = cfg.img_size
        hair = jnp.zeros((2, s, s, 1))
        face = jnp.zeros((2, s, s, 18))
        mask = jnp.zeros((2, s, s, 19))
        gen_params = self.gen.init(k[0], hair, face)
        if cfg.lambda_geo > 0:
            # the geometry head rides inside the generator's param tree
            # (flax apply ignores the extra collection key), so optimizer,
            # checkpointing, and sharding all cover it with no state-
            # structure change; inference applies never touch it
            gen_params = {'params': dict(
                gen_params['params'],
                geo_head={'kernel': jnp.zeros((cfg.hair_dim, N_GEO_STATS)),
                          'bias': jnp.zeros((N_GEO_STATS,))})}
        return GANTrainState(
            step=jnp.zeros((), jnp.int32),
            gen=ModelOpt.create(gen_params, self.tx_g),
            dis=ModelOpt.create(self.dis.init(k[1], mask), self.tx_d),
            dis_noise=ModelOpt.create(
                self.dis_noise.init(k[2], jnp.zeros((2, cfg.hair_dim))),
                self.tx_dz))

    # ------------------------------------------------------------------ step
    def _forward(self, params_g, batch, rng):
        """(ref: shape_branch/solver.py:68-117)"""
        cfg = self.cfg
        k_vae, k_noise, k_branch, k_dist_t, k_dist_f, k_info = \
            jax.random.split(rng, 6)
        target, face_mask = batch['target'], batch['face']
        if cfg.disturb_real_batch_mask:   # ref: solver.py:73-77
            target = disturb_real(target, k_dist_t)
            face_mask = disturb_real(face_mask, k_dist_f)
        ae_in_hair, ae_in_target_face = split_hair_face(target)
        _, ae_in_face = split_hair_face(face_mask)

        hair_code, hair_mean, hair_std = self.gen.apply(
            params_g, ae_in_hair, k_vae, method=self.gen.encode_hair)
        face_code = self.gen.apply(params_g, ae_in_face,
                                   method=self.gen.encode_face)
        ae_hair_logit, ae_face_logit = self.gen.apply(
            params_g, hair_code, face_code, method=self.gen.decode_logits)
        ae_out_mask = self.gen.apply(params_g, ae_hair_logit, ae_face_logit,
                                     method=self.gen.merge_logits)

        real_noise = jax.random.normal(
            k_noise, (batch['target'].shape[0], cfg.hair_dim))
        gan_hair_logit, _ = self.gen.apply(
            params_g, real_noise, face_code, method=self.gen.decode_logits)
        gan_mid_mask = self.gen.apply(params_g, gan_hair_logit,
                                      ae_face_logit,
                                      method=self.gen.merge_logits)
        # With lambda_info the AE-vs-GAN coin is a fair 0.5 (ref:
        # solver.py:104-107); otherwise random_ae_prob (ref: :109-116).
        ae_prob = 0.5 if cfg.lambda_info > 0 else cfg.random_ae_prob
        use_ae = jax.random.bernoulli(k_branch, ae_prob)
        fake_for_dis = jnp.where(use_ae, ae_out_mask, gan_mid_mask)
        out = dict(ae_in_hair=ae_in_hair,
                   ae_in_target_face=ae_in_target_face,
                   hair_code=hair_code, hair_mean=hair_mean,
                   hair_std=hair_std, face_code=face_code,
                   ae_out_mask=ae_out_mask, real_noise=real_noise,
                   fake_for_dis=fake_for_dis)
        if cfg.lambda_info > 0:
            # Re-encode the prior-noise decode's hair channel; info loss is
            # the code-space reconstruction (ref: solver.py:100-102,143-144;
            # the reference re-encodes with VAE sampling active).
            gan_mid_hair, _ = split_hair_face(gan_mid_mask)
            gan_out_code, _, _ = self.gen.apply(
                params_g, gan_mid_hair, k_info, method=self.gen.encode_hair)
            out['gan_out_hair_code'] = gan_out_code
        return out

    def _train_step(self, state: GANTrainState,
                    batch: Dict[str, jnp.ndarray], rng: jax.Array):
        cfg = self.cfg
        sch = self.schedule
        step = state.step
        k_fwd, k_dreal = jax.random.split(rng)
        real_batch = batch['real']
        if cfg.disturb_real_batch_mask:   # ref: solver.py:217-218
            real_batch = disturb_real(real_batch, k_dreal)

        # ----------------------------- D step (ref: solver.py:216-225)
        def d_loss_fn(params_d):
            fwd = self._forward(state.gen.params, batch, k_fwd)
            adv_fn = lambda x: self.dis.apply(params_d, x)
            dis_real = adv_fn(real_batch)
            dis_fake = adv_fn(jax.lax.stop_gradient(fwd['fake_for_dis']))
            ld = {'lambda_adv': L.gan_loss_d(cfg.gan_type, dis_real,
                                             dis_fake)}
            if cfg.lambda_gp_0 > 0:
                ld['lambda_gp_0'] = L.r0_gradient_penalty(
                    adv_fn, real_batch)
            return sch.total(ld, step), (ld, fwd)

        (d_total, (d_losses, fwd)), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True)(state.dis.params)

        # ----------------------------- G step (ref: solver.py:119-148)
        def g_loss_fn(params_g):
            f = self._forward(params_g, batch, k_fwd)
            dis_fake = self.dis.apply(state.dis.params, f['fake_for_dis'])
            lg = {'lambda_adv': L.gan_loss_g(cfg.gan_type, dis_fake)}
            hair, face = split_hair_face(f['ae_out_mask'])
            lg['lambda_hair'] = _masked_mean(
                -jnp.log(hair + 1e-5), f['ae_in_hair'] > 0.5)
            lg['lambda_non_hair'] = _masked_mean(
                -jnp.log(1 - hair + 1e-5), f['ae_in_hair'] < 0.5)
            lg['lambda_face'] = _masked_mean(
                -jnp.log(face + 1e-5), f['ae_in_target_face'] > 0.5)
            # self-reconstruction through the donor mask (solver.py:128-132)
            hair_hair, hair_face = split_hair_face(batch['hair'])
            _, donor_mean, _ = self.gen.apply(
                params_g, hair_hair, method=self.gen.encode_hair)
            donor_face_code = self.gen.apply(
                params_g, hair_face, method=self.gen.encode_face)
            donor_mask = self.gen.apply(params_g, donor_mean,
                                        donor_face_code,
                                        method=self.gen.decode)
            lg['lambda_self_rec'] = _masked_mean(
                -jnp.log(donor_mask + 1e-5), batch['hair'] > 0.5)
            lg['lambda_kl'] = (
                L.kl_loss_free_bits(f['hair_mean'], f['hair_std'],
                                    cfg.kl_free_bits)
                if cfg.kl_free_bits > 0
                else L.kl_loss(f['hair_mean'], f['hair_std']))
            if cfg.lambda_geo > 0:
                head = params_g['params']['geo_head']
                pred = f['hair_mean'] @ head['kernel'] + head['bias']
                target_stats = jax.lax.stop_gradient(
                    geo_stats(f['ae_in_hair']))
                lg['lambda_geo'] = jnp.mean((pred - target_stats) ** 2)
            if cfg.lambda_moment_1 > 0:   # ref: solver.py:136-139
                lg['lambda_moment_1'] = jnp.mean(
                    jnp.mean(f['hair_code'], axis=0) ** 2)
            if cfg.lambda_moment_2 > 0:   # ref: solver.py:140-141
                lg['lambda_moment_2'] = jnp.mean(
                    (jnp.mean(f['hair_code'] ** 2, axis=0) - 0.973) ** 2)
            if cfg.lambda_info > 0:       # ref: solver.py:143-144
                lg['lambda_info'] = jnp.mean(
                    (f['gan_out_hair_code'] - f['real_noise']) ** 2)
            dz = self.dis_noise.apply(state.dis_noise.params,
                                      f['hair_code'])
            lg['lambda_adv_noise'] = L.gan_loss_g(cfg.gan_type, dz)
            return sch.total(lg, step), lg

        (g_total, g_losses), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True)(state.gen.params)

        # ----------------------------- Dz step (ref: solver.py:232-244)
        real_noise = fwd['real_noise']
        fake_code = jax.lax.stop_gradient(fwd['hair_code'])

        def dz_loss_fn(params_dz):
            adv_fn = lambda x: self.dis_noise.apply(params_dz, x)
            dis1 = adv_fn(real_noise)
            dis0 = adv_fn(fake_code)
            total = L.gan_loss_d(cfg.gan_type, dis1, dis0)
            if cfg.lambda_gp_0_noise > 0:
                total = total + cfg.lambda_gp_0_noise * \
                    L.r0_gradient_penalty(adv_fn, real_noise)
            return total

        dz_total, dz_grads = jax.value_and_grad(dz_loss_fn)(
            state.dis_noise.params)

        finite = grads_finite(d_grads) & grads_finite(g_grads) & \
            grads_finite(dz_grads)
        new_state = GANTrainState(
            step=step + 1,
            gen=safe_apply_updates(state.gen, g_grads, self.tx_g, finite),
            dis=safe_apply_updates(state.dis, d_grads, self.tx_d, finite),
            dis_noise=safe_apply_updates(state.dis_noise, dz_grads,
                                         self.tx_dz, finite))
        metrics = {'d_total': d_total, 'g_total': g_total,
                   'dz_total': dz_total, 'finite': finite}
        metrics.update({f'g/{k}': v for k, v in g_losses.items()})
        return new_state, metrics


def synthetic_batch(rng: jax.Array, cfg: ShapeConfig, batch_size: int):
    """Random soft-mask triplet batch with the warp-pool contract
    (ref: shape_branch/dataset.py:24-183): target/face/hair one-hot masks
    plus a CelebA-only real batch."""
    import jax.nn
    def soft_mask(key):
        logits = jax.random.normal(
            key, (batch_size, cfg.img_size, cfg.img_size, 19)) * 3.0
        return jax.nn.one_hot(jnp.argmax(logits, -1), 19)
    k = jax.random.split(rng, 4)
    return {'target': soft_mask(k[0]), 'face': soft_mask(k[1]),
            'hair': soft_mask(k[2]), 'real': soft_mask(k[3])}
