# SEAN (pix2pix) generator training — the vendored path the reference keeps
# in sean_codes/trainers/pix2pix_trainer.py:10-41 + pix2pix_model losses,
# rebuilt as one fused jitted G/D step:
#   G: hinge adversarial + per-layer feature matching (lambda_feat=10) +
#      VGG19 perceptual (lambda_vgg=10)
#   D: hinge on (label ++ image) pairs through the 2-scale PatchGAN.
# Sync-BN across data-parallel replicas is the BatchNorm axis_name mechanism
# (models/layers.py) instead of the reference's master/slave pipe reduce
# (sync_batchnorm/batchnorm.py:50-80).

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.struct
import jax
import jax.numpy as jnp

from ctrlhair_tpu.config import SEANConfig
from ctrlhair_tpu.models.sean import SEAN
from ctrlhair_tpu.models.sean_discriminator import (
    MultiscaleDiscriminator, VGG19Features, vgg_preprocess)
from ctrlhair_tpu.training import losses as L
from ctrlhair_tpu.models.layers import spectral_normalize_tree
from ctrlhair_tpu.training.train_state import (
    ModelOpt, adam, grads_finite, safe_apply_updates)
from ctrlhair_tpu.utils.masks import label_to_one_hot

import numpy as np


@flax.struct.dataclass
class SEANTrainState:
    step: jnp.ndarray
    gen: ModelOpt          # 'params' collection only
    gen_stats: Any         # 'batch_stats' collection (sync-BN running stats)
    dis: ModelOpt
    sn_u: Any = None       # spectral-norm power-iteration vectors (or None)
    dis_sn_u: Any = None   # same, for the discriminator convs (all of them:
                           # reference norm_D='spectralinstance')


def _sn_u_template_d(dis_params, rng: jax.Array):
    """Power-iteration vector per discriminator conv kernel — the reference
    spectral-norms EVERY D conv (norm_D='spectralinstance',
    ref: sean_codes/models/networks/discriminator.py:84-87)."""
    flat = jax.tree_util.tree_flatten_with_path(dis_params)[0]
    treedef = jax.tree_util.tree_structure(dis_params)
    leaves = []
    for path, leaf in flat:
        names = [str(getattr(p, 'key', p)) for p in path]
        if names[-1] == 'kernel' and leaf.ndim == 4:
            rng, sub = jax.random.split(rng)
            k = int(np.prod(leaf.shape[:-1]))
            u = jax.random.normal(sub, (k,), jnp.float32)
            leaves.append(u / (jnp.linalg.norm(u) + 1e-12))
        else:
            leaves.append(None)
    return jax.tree_util.tree_unflatten(treedef, leaves)


def _sn_u_template(gen_params, rng: jax.Array):
    """Power-iteration vector per spectral-normed SEAN conv kernel
    (conv_0/conv_1/conv_s, ref: architecture.py:40-45); None elsewhere."""
    flat = jax.tree_util.tree_flatten_with_path(gen_params)[0]
    treedef = jax.tree_util.tree_structure(gen_params)
    leaves = []
    for path, leaf in flat:
        names = [str(getattr(p, 'key', p)) for p in path]
        is_sn = (any(n in ('conv_0', 'conv_1', 'conv_s') for n in names)
                 and names[-1] == 'kernel' and leaf.ndim == 4)
        if is_sn:
            rng, sub = jax.random.split(rng)
            k = int(np.prod(leaf.shape[:-1]))
            u = jax.random.normal(sub, (k,), jnp.float32)
            leaves.append(u / (jnp.linalg.norm(u) + 1e-12))
        else:
            leaves.append(None)
    return jax.tree_util.tree_unflatten(treedef, leaves)


class SEANTrainer:
    def __init__(self, cfg: SEANConfig, lambda_feat: float = 10.0,
                 lambda_vgg: float = 10.0, lr_g: float = 1e-4,
                 lr_d: float = 4e-4, use_vgg: bool = True,
                 vgg_params: Optional[Any] = None,
                 split_step: bool = False, dis_num_d: int = 2,
                 dis_ndf: int = 64, dis_n_layers: int = 4,
                 lambda_l1: float = 0.0):
        # lambda_l1: direct pixel-L1 reconstruction term.  NOT a reference
        # loss (SPADE/SEAN trains adv+FM+VGG only) — this environment has no
        # pretrained VGG19 (zero egress), so the perceptual slot is empty;
        # a small L1 restores a pixel-space learning signal for the
        # capability soak.  Default 0.0 = exact reference objective.
        self.cfg = cfg
        self.lambda_feat = lambda_feat
        self.lambda_vgg = lambda_vgg
        self.lambda_l1 = lambda_l1
        self.model = SEAN(cfg)
        # dis_* default to the reference topology (2-scale C64 4-layer
        # PatchGAN, discriminator.py:14-62); tiny dry-run builds shrink them
        self.dis = MultiscaleDiscriminator(
            num_d=dis_num_d, ndf=dis_ndf, n_layers=dis_n_layers,
            input_nc=cfg.semantic_nc + 3)
        self.use_vgg = use_vgg
        self.vgg = VGG19Features() if use_vgg else None
        self.vgg_params = vgg_params
        # TTUR betas (SPADE convention)
        self.tx_g = adam(lr_g, 0.0, 0.9)
        self.tx_d = adam(lr_d, 0.0, 0.9)
        # WarmJit: the fused G/D(/VGG) step is the repo's largest program
        # (~40 min through this environment's serial remote-compile
        # service); scripts/seed_train_cache.py compiles it once and
        # serializes the executable, after which fresh processes load it in
        # ~0.1 s (see utils/aot_cache.py)
        from ctrlhair_tpu.utils.aot_cache import WarmJit
        self.split_step = split_step
        # losses toggled by constructor floats are baked into the traced
        # program: distinct warm-artifact names per objective variant, or a
        # stale executable would silently train the wrong loss
        tag = '' if lambda_l1 == 0 else '_l1'
        if split_step:
            # Split-program fallback for environments where the fused
            # G+D(+VGG) program's compile is prohibitive (this relay's
            # serial remote-compile service scales super-linearly with
            # program size): two roughly half-size programs compile much
            # faster; `fake` stays on device between them, so steady-state
            # cost is one extra dispatch
            # vgg_params ride as a runtime ARGUMENT, not a closure: closed
            # over, jit embeds the whole VGG19 tree as HLO constants and
            # the program balloons ~1000x (measured on the ct rec program:
            # 882 MB -> 0.8 MB of HLO), which is what made this compile
            # take ~40 min through the relay
            self.g_step = WarmJit(f'sean_g_step{tag}', self._g_step,
                                  donate_argnums=(0,))
            self.d_step = WarmJit(f'sean_d_step{tag}', self._d_step,
                                  donate_argnums=(0,))

            def _two_program_step(state, batch, rng):
                state, fake_sg, gm = self.g_step(state, batch, rng,
                                                 self.vgg_params)
                state, dm = self.d_step(state, batch, fake_sg)
                m = {**gm, **dm}
                m['finite'] = gm['g_finite'] & dm['finite']
                return state, m

            self.train_step = _two_program_step
        else:
            self.train_step_jit = WarmJit(f'sean_train_step{tag}',
                                          self._train_step,
                                          donate_argnums=(0,))

            def _fused_step(state, batch, rng):
                return self.train_step_jit(state, batch, rng,
                                           self.vgg_params)

            self.train_step = _fused_step

    def init_state(self, rng: jax.Array) -> SEANTrainState:
        cfg = self.cfg
        k = jax.random.split(rng, 3)
        s = cfg.crop_size
        img = jnp.zeros((1, s, s, 3))
        label = jnp.zeros((1, s, s), jnp.int32)
        pair = jnp.zeros((1, s, s, cfg.semantic_nc + 3))
        gen_v = self.model.init(k[0], img, label)
        dis_p = self.dis.init(k[1], pair)
        if self.use_vgg and self.vgg_params is None:
            self.vgg_params = self.vgg.init(k[2], img)
        sn_u = (_sn_u_template(gen_v['params'], k[2])
                if self.cfg.spectral_norm else None)
        dis_sn_u = (_sn_u_template_d(dis_p['params'], k[1])
                    if self.cfg.spectral_norm else None)
        return SEANTrainState(
            step=jnp.zeros((), jnp.int32),
            gen=ModelOpt.create({'params': gen_v['params']}, self.tx_g),
            gen_stats=gen_v.get('batch_stats', {}),
            dis=ModelOpt.create(dis_p, self.tx_d),
            sn_u=sn_u, dis_sn_u=dis_sn_u)

    def _dis_in(self, label_oh, img):
        return jnp.concatenate([label_oh, img], axis=-1)

    def _train_step(self, state: SEANTrainState,
                    batch: Dict[str, jnp.ndarray], rng: jax.Array,
                    vgg_params=None):
        """Fused G+D step (one XLA program).
        batch: {'image': [N,S,S,3] in [-1,1], 'label': [N,S,S] int}."""
        state, fake_sg, gm = self._g_step(state, batch, rng, vgg_params)
        state, dm = self._d_step(state, batch, fake_sg)
        m = {**gm, **dm}
        m['finite'] = gm['g_finite'] & dm['finite']
        return state, m

    def _g_step(self, state: SEANTrainState,
                batch: Dict[str, jnp.ndarray], rng: jax.Array,
                vgg_params=None):
        """Generator half: G forward+losses+update, returns the detached
        fake for the D half.  Each half gates its own update on its own
        gradient finiteness (the reference has no finite-gating at all)."""
        img = batch['image']
        label = batch['label']
        label_oh = label_to_one_hot(label)

        def generate(params_g):
            inner = params_g['params']
            if state.sn_u is not None:
                # functional spectral norm on conv_0/1/s kernels
                # (ref: torch spectral_norm on SEAN convs); power-iteration
                # state updates outside the grad path
                inner, _ = spectral_normalize_tree(inner, state.sn_u)
            variables = {'params': inner,
                         'batch_stats': state.gen_stats}
            codes = self.model.apply(variables, img, label,
                                     method=self.model.encode)
            out, updated = self.model.apply(
                variables, label, codes, method=self.model.decode,
                train=True, noise_rng=rng, mutable=['batch_stats'])
            return out, updated['batch_stats']

        def dis_apply(params_d, x):
            inner = params_d['params']
            if state.dis_sn_u is not None:
                inner, _ = spectral_normalize_tree(inner, state.dis_sn_u)
            return self.dis.apply({'params': inner}, x)

        # ---------------- G step
        def g_loss_fn(params_g):
            fake, new_stats = generate(params_g)
            feats_fake = dis_apply(state.dis.params,
                                   self._dis_in(label_oh, fake))
            feats_real = dis_apply(state.dis.params,
                                   self._dis_in(label_oh, img))
            adv = sum(L.gan_loss_g('hinge', f[-1]) for f in feats_fake) \
                / len(feats_fake)
            fm = 0.0
            for ff, fr in zip(feats_fake, feats_real):
                for a, b in zip(ff[:-1], fr[:-1]):
                    fm = fm + jnp.mean(jnp.abs(
                        a - jax.lax.stop_gradient(b)))
            fm = fm / len(feats_fake)
            losses = {'adv': adv, 'feat': fm}
            total = adv + self.lambda_feat * fm
            if self.lambda_l1 > 0:
                losses['l1'] = jnp.mean(jnp.abs(fake - img))
                total = total + self.lambda_l1 * losses['l1']
            if self.use_vgg:
                vp = self.vgg_params if vgg_params is None else vgg_params
                vf = self.vgg.apply(vp, vgg_preprocess(fake))
                vr = self.vgg.apply(vp, vgg_preprocess(img))
                weights = [1 / 32, 1 / 16, 1 / 8, 1 / 4, 1.0]
                vgg_l = sum(w * jnp.mean(jnp.abs(a - b))
                            for w, a, b in zip(weights, vf, vr))
                losses['vgg'] = vgg_l
                total = total + self.lambda_vgg * vgg_l
            return total, (losses, fake, new_stats)

        (g_total, (g_losses, fake, new_stats)), g_grads = \
            jax.value_and_grad(g_loss_fn, has_aux=True)(state.gen.params)

        g_finite = grads_finite(g_grads)
        new_sn_u = state.sn_u
        if state.sn_u is not None:
            _, new_sn_u = spectral_normalize_tree(
                jax.lax.stop_gradient(state.gen.params['params']),
                state.sn_u)
        new_state = state.replace(
            gen=safe_apply_updates(state.gen, g_grads, self.tx_g, g_finite),
            gen_stats=jax.tree_util.tree_map(
                lambda a, b: jnp.where(g_finite, a, b), new_stats,
                state.gen_stats),
            sn_u=new_sn_u)
        metrics = {'g_total': g_total, 'g_finite': g_finite}
        metrics.update({f'g/{k}': v for k, v in g_losses.items()})
        return new_state, jax.lax.stop_gradient(fake), metrics

    def _d_step(self, state: SEANTrainState,
                batch: Dict[str, jnp.ndarray], fake_sg: jnp.ndarray):
        """Discriminator half: hinge on (label ++ image) pairs through the
        2-scale PatchGAN, against the G half's detached fake."""
        img = batch['image']
        label_oh = label_to_one_hot(batch['label'])

        def dis_apply(params_d, x):
            inner = params_d['params']
            if state.dis_sn_u is not None:
                inner, _ = spectral_normalize_tree(inner, state.dis_sn_u)
            return self.dis.apply({'params': inner}, x)

        def d_loss_fn(params_d):
            feats_fake = dis_apply(params_d,
                                   self._dis_in(label_oh, fake_sg))
            feats_real = dis_apply(params_d,
                                   self._dis_in(label_oh, img))
            loss = sum(L.gan_loss_d('hinge', r[-1], f[-1])
                       for r, f in zip(feats_real, feats_fake)) \
                / len(feats_fake)
            return loss

        d_total, d_grads = jax.value_and_grad(d_loss_fn)(state.dis.params)

        d_finite = grads_finite(d_grads)
        new_dis_sn_u = state.dis_sn_u
        if state.dis_sn_u is not None:
            _, new_dis_sn_u = spectral_normalize_tree(
                jax.lax.stop_gradient(state.dis.params['params']),
                state.dis_sn_u)
        new_state = state.replace(
            step=state.step + 1,
            dis=safe_apply_updates(state.dis, d_grads, self.tx_d, d_finite),
            dis_sn_u=new_dis_sn_u)
        metrics = {'d_total': d_total, 'finite': d_finite}
        return new_state, metrics
