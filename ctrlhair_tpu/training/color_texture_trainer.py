# Color & texture branch trainer — one fused D/G/Dz step per call.
#
# Parity target: the training flow of color_texture_branch/train.py:115-158
# with the losses of color_texture_branch/solver.py:85-268:
#   one shared forward (AE pass + shuffled-condition GAN pass), then a D
#   update, a G update computed against the PRE-update discriminator (exactly
#   the reference's ordering, train.py:128-158), then the latent-prior
#   discriminator update.  All three gradient computations live in one jitted
#   function; data parallelism is jit + NamedSharding over the batch axis
#   (replacing DDP/NCCL, ref: solver.py:68-74) — XLA inserts the gradient
#   all-reduce that DDP did by hand.

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from ctrlhair_tpu.config import ColorTextureConfig, PipelineConfig
from ctrlhair_tpu.models.color_texture import (
    CTDiscriminator, CTDiscriminatorNoise, Predictor, make_generator)
from ctrlhair_tpu.training import losses as L
from ctrlhair_tpu.training.train_state import (
    GANTrainState, ModelOpt, adam, grads_finite, safe_apply_updates)


class ColorTextureTrainer:
    """Builds models, state, and the jitted train_step.

    Pass `sean` + `sean_params` (a frozen SEAN model) to enable the
    image-space hair reconstruction loss lambda_rec_img — the reference's
    render-through-frozen-SEAN MSE over hair pixels that turns on at step
    600k (ref: solver.py:270-299, config lambda_rec_img {0:0, 600000:1000});
    its weight still follows the schedule, so enabling it early is harmless.
    """

    def __init__(self, cfg: ColorTextureConfig,
                 rgb_pred_cfg=None, curliness_pred_cfg=None,
                 sean=None, sean_params=None, rec_img_subset: int = 4,
                 split_rec_img: bool = False):
        from ctrlhair_tpu.config import (
            curliness_predictor_config, rgb_predictor_config)
        self.cfg = cfg
        self.gen = make_generator(cfg)
        self.dis = CTDiscriminator(cfg, train=True)
        self.dis_noise = CTDiscriminatorNoise(cfg, train=True)
        self.rgb_pred = Predictor(rgb_pred_cfg or rgb_predictor_config())
        self.curliness_pred = Predictor(
            curliness_pred_cfg or curliness_predictor_config())
        self.sean = sean
        self.sean_params = sean_params
        self.rec_img_subset = rec_img_subset
        self.schedule = L.LossSchedule(cfg)
        self.tx_g = adam(cfg.lr_g, cfg.beta1, cfg.beta2)
        self.tx_d = adam(cfg.lr_d, cfg.beta1, cfg.beta2)
        self.tx_dz = adam(cfg.lr_g, cfg.beta1, cfg.beta2)
        self.split_rec_img = split_rec_img and sean is not None
        self._step_jit = jax.jit(self._train_step, donate_argnums=(0,))
        if self.split_rec_img:
            # The rec_img term contains a full SEAN decode forward+backward;
            # fused with the GAN step the program exceeds what this
            # environment's remote-compile service survives (drops the
            # connection after ~30 min).  Split, each half compiles like its
            # round-2-proven counterparts; the unweighted rec gradient is
            # computed in its own program and summed (scaled by the
            # schedule weight) into the G update inside the main step.
            # WarmJit: even split out, the rec program embeds a SEAN decode
            # backward (~40 min through the relay's compile service, which
            # drops connections at that scale) — a pre-serialized executable
            # (scripts/seed_train_cache.py ct_rec) sidesteps it entirely.
            from ctrlhair_tpu.utils.aot_cache import WarmJit
            self._rec_jit = WarmJit('ct_rec_img_grads', self._rec_img_grads)

            def _split_step(state, batch, predictor_params, rng,
                            host_step=None):
                """host_step (python int, optional): lets the caller skip
                the rec program entirely while its schedule weight is 0 —
                without it the weight lives on device and checking it would
                cost a host sync per step."""
                skip = (host_step is not None and self.schedule.weight_host(
                    'lambda_rec_img', host_step) == 0.0)
                if 'sean_code' not in batch or skip:
                    return self._step_jit(state, batch, predictor_params,
                                          rng)
                rec = self._rec_jit(state.gen.params, state.dis.params,
                                    batch, self.sean_params)
                return self._step_jit(state, batch, predictor_params, rng,
                                      rec)

            self.train_step = _split_step
        else:
            self.train_step = self._step_jit

    # ------------------------------------------------------------------ init
    def init_state(self, rng: jax.Array,
                   predictor_params: Dict[str, Any] | None = None
                   ) -> Tuple[GANTrainState, Dict[str, Any]]:
        cfg = self.cfg
        k = jax.random.split(rng, 5)
        data = {
            'noise': jnp.zeros((2, cfg.noise_dim)),
            'noise_curliness': jnp.zeros((2, cfg.curliness_dim)),
            'rgb_mean': jnp.zeros((2, 3)),
            'pca_std': jnp.zeros((2, 1)),
        }
        code = {'code': jnp.zeros((2, cfg.style_dim))}
        state = GANTrainState(
            step=jnp.zeros((), jnp.int32),
            gen=ModelOpt.create(self.gen.init(k[0], data), self.tx_g),
            dis=ModelOpt.create(self.dis.init(k[1], code), self.tx_d),
            dis_noise=ModelOpt.create(
                self.dis_noise.init(k[2], data), self.tx_dz))
        if predictor_params is None:
            predictor_params = {
                'rgb': self.rgb_pred.init(k[3], code),
                'curliness': self.curliness_pred.init(k[4], code),
            }
        return state, predictor_params

    # ------------------------------------------------------------------ step
    def _forward(self, params_g, params_d, batch, rng):
        """Shared AE + shuffled-condition GAN forward
        (ref: solver.py:85-117)."""
        cfg = self.cfg
        code = batch['code']
        n = code.shape[0]
        k_perm1, k_perm2, k_perm3, k_enc = jax.random.split(rng, 4)

        d_res_real = self.dis.apply(params_d, {'code': code})
        ae_mid = {'noise': d_res_real['noise'],
                  'noise_curliness': d_res_real['noise_curliness'],
                  'rgb_mean': batch['rgb_mean'],
                  'pca_std': batch['pca_std']}
        ae_out = self.gen.apply(params_g, ae_mid)

        p1 = jax.random.permutation(k_perm1, n)
        p2 = jax.random.permutation(k_perm2, n)
        p3 = jax.random.permutation(k_perm3, n)
        use_enc = jax.random.bernoulli(
            k_enc, cfg.gan_input_from_encoder_prob)
        gan_in = {
            'rgb_mean': batch['rgb_mean'][p1],
            'pca_std': batch['pca_std'][p1],
            'noise_curliness': batch['noise_curliness'][p2],
            'curliness_label': batch['curliness_label'][p2],
            'noise': jnp.where(
                use_enc, jax.lax.stop_gradient(d_res_real['noise'])[p3],
                batch['noise'][p3]),
        }
        gan_mid = self.gen.apply(params_g, gan_in)
        gan_out_fake = self.dis.apply(params_d, gan_mid)
        return d_res_real, ae_mid, ae_out, gan_in, gan_mid, gan_out_fake

    def _rec_img_hair_mse(self, params_g, params_d, batch,
                          sean_params=None):
        """Unweighted render-through-frozen-SEAN hair reconstruction MSE
        (ref: solver.py:270-299) as a function of the generator params via
        the AE path (D-encode -> generate -> hair-code swap -> SEAN
        decode).  The AE path is deterministic given (params, batch), so
        this recomputation is exactly the fused step's value.

        sean_params: pass the frozen SEAN tree EXPLICITLY when this runs
        as its own jitted program — closed over, jit embeds the whole tree
        as HLO constants, and the resulting multi-hundred-MB program is
        what the environment's remote-compile service drops mid-transfer.
        Defaults to the closure for the fused in-step use."""
        from ctrlhair_tpu.constants import HAIR_IDX
        sp = self.sean_params if sean_params is None else sean_params
        k = min(self.rec_img_subset, batch['sean_code'].shape[0])
        d_res_real = self.dis.apply(params_d, {'code': batch['code']})
        ae_mid = {'noise': d_res_real['noise'],
                  'noise_curliness': d_res_real['noise_curliness'],
                  'rgb_mean': batch['rgb_mean'],
                  'pca_std': batch['pca_std']}
        ae_out = self.gen.apply(params_g, ae_mid)
        codes = batch['sean_code'][:k].at[:, HAIR_IDX].set(
            ae_out['code'][:k])
        render = self.sean.apply(sp, batch['label'][:k],
                                 codes, method=self.sean.decode)
        hair = (batch['label'][:k] == HAIR_IDX)[..., None]
        diff = (batch['image'][:k] - render) ** 2 * hair
        return jnp.sum(diff) / jnp.maximum(jnp.sum(hair) * 3.0, 1.0)

    def _rec_img_grads(self, params_g, params_d, batch, sean_params=None):
        """Split-program half: (unweighted rec_img loss, its G-grads)."""
        return jax.value_and_grad(self._rec_img_hair_mse)(
            params_g, params_d, batch, sean_params)

    def _train_step(self, state: GANTrainState, batch: Dict[str, jnp.ndarray],
                    predictor_params: Dict[str, Any], rng: jax.Array,
                    rec=None):
        cfg = self.cfg
        sch = self.schedule
        step = state.step
        k_fwd, k_gp, k_gp_noise = jax.random.split(rng, 3)
        mse = lambda a, b: jnp.mean((a - b) ** 2)

        # ---------------- D step (ref: solver.py:218-245, train.py:128-148)
        def d_loss_fn(params_d):
            d_res_real, ae_mid, ae_out, gan_in, gan_mid, gan_out_fake = \
                self._forward(state.gen.params, params_d, batch, k_fwd)
            ld = {}
            ld['lambda_adv'] = L.gan_loss_d(
                cfg.gan_type, d_res_real['adv'], gan_out_fake['adv'])
            if cfg.gan_type == 'wgan_gp':
                adv_fn = lambda x: self.dis.apply(
                    params_d, {'code': x})['adv']
                ld['lambda_gp'] = L.wgan_gradient_penalty(
                    adv_fn, batch['code'], gan_mid['code'], k_gp)
            ld['lambda_info'] = mse(gan_out_fake['noise'], gan_in['noise'])
            ld['lambda_rec'] = mse(ae_out['code'], batch['code'])
            ld['lambda_info_curliness'] = mse(
                gan_out_fake['noise_curliness'], gan_in['noise_curliness'])
            # encoder fools the latent-prior discriminator
            dz_res = self.dis_noise.apply(state.dis_noise.params, ae_mid)
            ld['lambda_adv_noise'] = L.gan_loss_g(cfg.gan_type,
                                                  dz_res['adv'])
            noise_mid = jnp.concatenate(
                [ae_mid['noise_curliness'], ae_mid['noise']], axis=1)
            m1, m2 = L.moment_losses(noise_mid)
            ld['lambda_moment_1'] = m1
            ld['lambda_moment_2'] = m2
            return sch.total(ld, step), (ld, ae_mid)

        (d_total, (d_losses, ae_mid)), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True)(state.dis.params)

        # ---------------- G step against pre-update D (ref: train.py:150-152)
        def g_loss_fn(params_g):
            d_res_real, ae_mid_g, ae_out, gan_in, gan_mid, gan_out_fake = \
                self._forward(params_g, state.dis.params, batch, k_fwd)
            lg = {}
            lg['lambda_adv'] = L.gan_loss_g(cfg.gan_type,
                                            gan_out_fake['adv'])
            lg['lambda_info'] = mse(gan_out_fake['noise'], gan_in['noise'])
            lg['lambda_rec'] = mse(ae_out['code'], batch['code'])
            pred = self.rgb_pred.apply(predictor_params['rgb'], gan_mid)
            lg['lambda_rgb'] = mse(pred['rgb_mean'], gan_in['rgb_mean'])
            lg['lambda_pca_std'] = mse(pred['pca_std'], gan_in['pca_std'])
            lg['lambda_info_curliness'] = mse(
                gan_out_fake['noise_curliness'], gan_in['noise_curliness'])
            cls = self.curliness_pred.apply(
                predictor_params['curliness'], gan_mid)['cls_curliness']
            weights = (jnp.abs(gan_in['noise_curliness'])
                       if cfg.curliness_with_weight else None)
            lg['lambda_cls_curliness'] = L.weighted_bce_with_logits(
                cls, gan_in['curliness_label'].astype(jnp.float32) / 2 + 0.5,
                weights)
            if cfg.gen_mode == 'eigengan':
                lg['lambda_orthogonal'] = self.gen.orthogonal_loss(params_g)
            if (self.sean is not None and 'sean_code' in batch
                    and rec is None and not self.split_rec_img):
                # render-through-frozen-SEAN hair reconstruction
                # (ref: solver.py:270-299); a small subset for cost parity
                lg['lambda_rec_img'] = self._rec_img_hair_mse(
                    params_g, state.dis.params, batch)
            return sch.total(lg, step), lg

        (g_total, g_losses), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True)(state.gen.params)

        if rec is not None:
            # rec_img computed in its own program (split_rec_img): add the
            # schedule-weighted gradient and loss here, before the finite
            # gate, so the combined update matches the fused step
            rec_loss, rec_grads = rec
            w = sch.weight('lambda_rec_img', step)
            g_grads = jax.tree_util.tree_map(
                lambda a, b: a + w * b, g_grads, rec_grads)
            g_losses = dict(g_losses, lambda_rec_img=rec_loss)
            g_total = g_total + w * rec_loss

        # ------------- latent-prior discriminator step (ref: solver.py:253-268)
        real_noise = jnp.concatenate(
            [batch['noise'], batch['noise_curliness']], axis=1)
        fake_noise = jax.lax.stop_gradient(jnp.concatenate(
            [ae_mid['noise'], ae_mid['noise_curliness']], axis=1))

        def dz_loss_fn(params_dz):
            def adv_fn(x):
                data = {'noise': x[:, :cfg.noise_dim],
                        'noise_curliness': x[:, cfg.noise_dim:]}
                return self.dis_noise.apply(params_dz, data)['adv']
            dis1 = adv_fn(real_noise)
            dis0 = adv_fn(fake_noise)
            lz = {'lambda_adv_noise': L.gan_loss_d(cfg.gan_type, dis1, dis0)}
            if cfg.gan_type == 'wgan_gp':
                lz['lambda_gp_noise'] = L.wgan_gradient_penalty(
                    adv_fn, real_noise, fake_noise, k_gp_noise)
            total = lz['lambda_adv_noise'] + cfg.lambda_gp * lz.get(
                'lambda_gp_noise', 0.0)
            return total, lz

        (dz_total, dz_losses), dz_grads = jax.value_and_grad(
            dz_loss_fn, has_aux=True)(state.dis_noise.params)

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
        metrics.update({f'd/{k}': v for k, v in d_losses.items()})
        metrics.update({f'g/{k}': v for k, v in g_losses.items()})
        return new_state, metrics


def synthetic_batch(rng: jax.Array, cfg: ColorTextureConfig, batch_size: int):
    """Random batch with the dataset's field contract
    (ref: color_texture_branch/dataset.py:112-144): SEAN hair codes, colour
    stats, fresh prior noise, signed curliness noise + labels."""
    k = jax.random.split(rng, 5)
    label = jnp.where(jax.random.bernoulli(k[0], 0.5, (batch_size, 1)),
                      1.0, -1.0)
    return {
        'code': jax.random.normal(k[1], (batch_size, cfg.style_dim)) * 0.5,
        'rgb_mean': jax.random.uniform(k[2], (batch_size, 3)) * 255.0,
        'pca_std': jax.random.uniform(k[3], (batch_size, 1)) * 100.0 + 20.0,
        'noise': jax.random.normal(k[4], (batch_size, cfg.noise_dim)),
        'noise_curliness': jnp.abs(
            jax.random.normal(k[0], (batch_size, 1))) * label,
        'curliness_label': label,
    }
