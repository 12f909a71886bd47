# Supervised predictor trainer (curliness classifier / colour encoder).
#
# Parity target: color_texture_branch/predictor/predictor_train.py:36-146 +
# predictor_solver.py:17-51 — BCE for cls_curliness, MSE for
# rgb_mean/pca_std, Adam, step-scheduled loss weights, BatchNorm running
# stats carried explicitly (the jit-functional version of train()/eval()).

from __future__ import annotations

from typing import Any, Dict, Tuple

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
    model: ModelOpt          # 'params' collection only
    stats: Any               # 'batch_stats' (may be empty dict)


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
        variables = self.model.init({'params': rng, 'dropout': rng}, code)
        return PredictorTrainState(
            step=jnp.zeros((), jnp.int32),
            model=ModelOpt.create({'params': variables['params']}, self.tx),
            stats=variables.get('batch_stats', {}))

    def _losses(self, out: Dict[str, jnp.ndarray],
                batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        losses = {}
        if 'cls_curliness' in out and 'curliness_label' in batch:
            losses['lambda_cls_curliness'] = L.weighted_bce_with_logits(
                out['cls_curliness'],
                batch['curliness_label'].astype(jnp.float32) / 2 + 0.5)
        if 'rgb_mean' in out and 'rgb_mean' in batch:
            losses['lambda_rgb'] = jnp.mean(
                (out['rgb_mean'] - batch['rgb_mean']) ** 2)
        if 'pca_std' in out and 'pca_std' in batch:
            losses['lambda_pca_std'] = jnp.mean(
                (out['pca_std'] - batch['pca_std']) ** 2)
        return losses

    def _train_step(self, state: PredictorTrainState,
                    batch: Dict[str, jnp.ndarray], rng: jax.Array):
        has_stats = bool(jax.tree_util.tree_leaves(state.stats))

        def loss_fn(params):
            variables = dict(params)
            if has_stats:
                variables['batch_stats'] = state.stats
                out, updated = self.model.apply(
                    variables, {'code': batch['code']},
                    rngs={'dropout': rng}, mutable=['batch_stats'])
                new_stats = updated['batch_stats']
            else:
                out = self.model.apply(variables, {'code': batch['code']},
                                       rngs={'dropout': rng})
                new_stats = state.stats
            losses = self._losses(out, batch)
            return self.schedule.total(losses, state.step), (losses,
                                                             new_stats)

        (total, (losses, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.model.params)
        finite = grads_finite(grads)
        new_state = PredictorTrainState(
            step=state.step + 1,
            model=safe_apply_updates(state.model, grads, self.tx, finite),
            stats=jax.tree_util.tree_map(
                lambda a, b: jnp.where(finite, a, b), new_stats,
                state.stats))
        metrics = dict(losses, total=total, finite=finite)
        return new_state, metrics

    def _eval_metrics(self, params, stats, batch):
        variables = dict(params)
        if jax.tree_util.tree_leaves(stats):
            variables['batch_stats'] = stats
        out = self.eval_model.apply(variables, {'code': batch['code']})
        metrics = {f'test/{k}': v
                   for k, v in self._losses(out, batch).items()}
        if 'cls_curliness' in out and 'curliness_label' in batch:
            pred = out['cls_curliness'] > 0
            truth = batch['curliness_label'] > 0
            metrics['test/accuracy'] = jnp.mean(pred == truth)
        return metrics
