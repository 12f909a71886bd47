# Supervised predictor trainer (curliness classifier / colour encoder).
#
# Parity target: color_texture_branch/predictor/predictor_train.py:36-146 +
# predictor_solver.py:17-51 — BCE for cls_curliness, MSE for
# rgb_mean/pca_std, Adam, step-scheduled loss weights.

from __future__ import annotations

from typing import Dict, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from ctrlhair_tpu.config import PredictorConfig
from ctrlhair_tpu.models.color_texture import Predictor
from ctrlhair_tpu.training import losses as L
from ctrlhair_tpu.training.train_state import (
    ModelOpt, grads_finite, safe_apply_updates)


@flax.struct.dataclass
class PredictorTrainState:
    step: jnp.ndarray
    model: ModelOpt


class PredictorTrainer:
    def __init__(self, cfg: PredictorConfig):
        self.cfg = cfg
        self.model = Predictor(cfg, train=True)
        self.eval_model = Predictor(cfg, train=False)
        self.schedule = L.LossSchedule(cfg)
        self.tx = optax.adam(cfg.lr, b1=cfg.beta1, b2=cfg.beta2)
        self.train_step = jax.jit(self._train_step, donate_argnums=(0,))
        self.eval_metrics = jax.jit(self._eval_metrics)

    def init_state(self, rng: jax.Array) -> PredictorTrainState:
        code = {'code': jnp.zeros((2, self.cfg.style_dim))}
        params = self.model.init({'params': rng, 'dropout': rng}, code)
        return PredictorTrainState(step=jnp.zeros((), jnp.int32),
                                   model=ModelOpt.create(params, self.tx))

    def _losses(self, out: Dict[str, jnp.ndarray],
                batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        losses = {}
        if 'cls_curliness' in out:
            losses['lambda_cls_curliness'] = L.weighted_bce_with_logits(
                out['cls_curliness'],
                batch['curliness_label'].astype(jnp.float32) / 2 + 0.5)
        if 'rgb_mean' in out:
            losses['lambda_rgb'] = jnp.mean(
                (out['rgb_mean'] - batch['rgb_mean']) ** 2)
        if 'pca_std' in out:
            losses['lambda_pca_std'] = jnp.mean(
                (out['pca_std'] - batch['pca_std']) ** 2)
        return losses

    def _train_step(self, state: PredictorTrainState,
                    batch: Dict[str, jnp.ndarray], rng: jax.Array):
        def loss_fn(params):
            out = self.model.apply(params, {'code': batch['code']},
                                   rngs={'dropout': rng})
            losses = self._losses(out, batch)
            return self.schedule.total(losses, state.step), losses

        (total, losses), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.model.params)
        finite = grads_finite(grads)
        new_state = PredictorTrainState(
            step=state.step + 1,
            model=safe_apply_updates(state.model, grads, self.tx, finite))
        metrics = dict(losses, total=total, finite=finite)
        return new_state, metrics

    def _eval_metrics(self, params, batch):
        out = self.eval_model.apply(params, {'code': batch['code']})
        metrics = {f'test/{k}': v
                   for k, v in self._losses(out, batch).items()}
        if 'cls_curliness' in out:
            pred = out['cls_curliness'] > 0
            truth = batch['curliness_label'] > 0
            metrics['test/accuracy'] = jnp.mean(pred == truth)
        return metrics
