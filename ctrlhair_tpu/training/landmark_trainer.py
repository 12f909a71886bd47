# Trainer for the landmark regressor (dlib shape-predictor stand-in).
#
# Supervised regression, same skeleton as the predictor trainer
# (predictor_trainer.py; ref training loop shape:
# color_texture_branch/predictor/predictor_train.py:36-146): Adam, jitted
# step, finite-guarded updates.  Losses: smooth-L1 on normalised landmark
# coordinates (masked to face-present samples) + BCE on the presence
# logit.  Eval reports mean landmark distance in normalised units and in
# pixels of the net's input resolution.

from __future__ import annotations

from typing import Dict

import flax.struct
import jax
import jax.numpy as jnp
import optax

from ctrlhair_tpu.models.landmark_net import LandmarkNet, LandmarkNetConfig
from ctrlhair_tpu.training.train_state import (
    ModelOpt, grads_finite, safe_apply_updates)


def smooth_l1(x: jnp.ndarray, beta: float = 0.02) -> jnp.ndarray:
    ax = jnp.abs(x)
    return jnp.where(ax < beta, 0.5 * ax * ax / beta, ax - 0.5 * beta)


@flax.struct.dataclass
class LandmarkTrainState:
    step: jnp.ndarray
    model: ModelOpt


class LandmarkTrainer:
    def __init__(self, cfg: LandmarkNetConfig):
        self.cfg = cfg
        self.model = LandmarkNet(cfg, train=True)
        self.eval_model = LandmarkNet(cfg, train=False)
        self.tx = optax.adam(cfg.lr, b1=cfg.beta1, b2=cfg.beta2)
        self.train_step = jax.jit(self._train_step, donate_argnums=(0,))
        self.eval_metrics = jax.jit(self._eval_metrics)

    def init_state(self, rng: jax.Array) -> LandmarkTrainState:
        x = jnp.zeros((2, self.cfg.input_size, self.cfg.input_size, 3))
        variables = self.model.init(rng, x)
        return LandmarkTrainState(
            step=jnp.zeros((), jnp.int32),
            model=ModelOpt.create({'params': variables['params']}, self.tx))

    def _losses(self, out, batch) -> Dict[str, jnp.ndarray]:
        pres = batch['presence']
        per_pt = smooth_l1(out['landmarks'] - batch['landmarks']).sum(-1)
        coord = (per_pt.mean(-1) * pres).sum() / jnp.maximum(pres.sum(), 1)
        bce = optax.sigmoid_binary_cross_entropy(out['presence'], pres)
        return {'coord': coord, 'presence': bce.mean()}

    def _train_step(self, state: LandmarkTrainState, batch):
        def loss_fn(params):
            out = self.model.apply(params, batch['image'])
            losses = self._losses(out, batch)
            return losses['coord'] + losses['presence'], losses

        (total, losses), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.model.params)
        finite = grads_finite(grads)
        new_state = LandmarkTrainState(
            step=state.step + 1,
            model=safe_apply_updates(state.model, grads, self.tx, finite))
        return new_state, dict(losses, total=total, finite=finite)

    def _eval_metrics(self, params, batch):
        out = self.eval_model.apply(params, batch['image'])
        pres = batch['presence']
        dist = jnp.linalg.norm(out['landmarks'] - batch['landmarks'],
                               axis=-1).mean(-1)
        mean_norm = (dist * pres).sum() / jnp.maximum(pres.sum(), 1)
        acc = jnp.mean((out['presence'] > 0) == (pres > 0.5))
        return {'test/mean_dist_norm': mean_norm,
                'test/mean_dist_px': mean_norm * self.cfg.input_size,
                'test/presence_accuracy': acc}
