# Face-parser (BiSeNet) trainer.
#
# The reference vendors BiSeNet's upstream training code (ref:
# external_code/face_parsing/train.py, OHEM cross-entropy over main + two
# auxiliary heads, inplace-abn sync-BN) but ships only the pretrained
# checkpoint.  This trainer provides the same capability natively: one fused
# jitted step with online-hard-example-mined CE on all three heads; sync-BN
# comes from running the step inside shard_map with BatchNorm axis_name.

from __future__ import annotations

from typing import Any, Dict

import flax.struct
import jax
import jax.numpy as jnp
import optax

from ctrlhair_tpu.config import BiSeNetConfig
from ctrlhair_tpu.models.bisenet import BiSeNet
from ctrlhair_tpu.training.train_state import (
    ModelOpt, grads_finite, safe_apply_updates)


@flax.struct.dataclass
class BiSeNetTrainState:
    step: jnp.ndarray
    model: ModelOpt          # 'params'
    stats: Any               # 'batch_stats'


def ohem_cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray,
                       keep_fraction: float = 1.0 / 16.0,
                       thresh: float = 0.7,
                       ignore_label: int = 255) -> jnp.ndarray:
    """Online hard example mining CE: average the per-pixel losses over the
    hardest keep_fraction of pixels (at least), plus any pixel whose
    predicted true-class probability is below `thresh` — the upstream
    BiSeNet OhemCELoss recipe (incl. its ignore_lb=255), expressed with a
    static top-k."""
    n, h, w, c = logits.shape
    logp = jax.nn.log_softmax(logits, axis=-1)
    valid = (labels != ignore_label).reshape(n, -1)
    safe_labels = jnp.where(labels == ignore_label, 0, labels)
    per_pix = -jnp.take_along_axis(
        logp, safe_labels[..., None], axis=-1)[..., 0].reshape(n, -1)
    # ignored pixels contribute zero loss and never rank as 'hard'
    per_pix = jnp.where(valid, per_pix, 0.0)
    k = max(int(h * w * keep_fraction), 1)
    topk = jax.lax.top_k(per_pix, k)[0]
    min_loss = -jnp.log(jnp.asarray(thresh))
    hard = jnp.where(per_pix > min_loss, per_pix, 0.0)
    n_hard = jnp.sum(per_pix > min_loss, axis=1)
    use_thresh = n_hard > k
    loss_thresh = jnp.sum(hard, axis=1) / jnp.maximum(n_hard, 1)
    loss_topk = jnp.mean(topk, axis=1)
    return jnp.mean(jnp.where(use_thresh, loss_thresh, loss_topk))


class BiSeNetTrainer:
    def __init__(self, cfg: BiSeNetConfig, lr: float = 1e-2,
                 momentum: float = 0.9, weight_decay: float = 5e-4):
        self.cfg = cfg
        self.model = BiSeNet(cfg, train=True, return_aux=True)
        self.tx = optax.chain(
            optax.add_decayed_weights(weight_decay),
            optax.sgd(lr, momentum=momentum))
        from ctrlhair_tpu.utils.aot_cache import WarmJit
        self.train_step = WarmJit('bisenet_train_step', self._train_step,
                                  donate_argnums=(0,))

    def init_state(self, rng: jax.Array) -> BiSeNetTrainState:
        s = self.cfg.input_size
        variables = self.model.init(rng, jnp.zeros((1, s, s, 3)))
        return BiSeNetTrainState(
            step=jnp.zeros((), jnp.int32),
            model=ModelOpt.create({'params': variables['params']}, self.tx),
            stats=variables.get('batch_stats', {}))

    def _train_step(self, state: BiSeNetTrainState,
                    batch: Dict[str, jnp.ndarray], rng: jax.Array):
        """batch: {'image': ImageNet-normalised [N,S,S,3],
                   'label': int [N,S,S]} (BiSeNet class order)."""
        def loss_fn(params):
            variables = {'params': params['params'],
                         'batch_stats': state.stats}
            (main, a16, a32), updated = self.model.apply(
                variables, batch['image'], mutable=['batch_stats'])
            losses = {
                'main': ohem_cross_entropy(main, batch['label']),
                'aux16': ohem_cross_entropy(a16, batch['label']),
                'aux32': ohem_cross_entropy(a32, batch['label']),
            }
            total = losses['main'] + losses['aux16'] + losses['aux32']
            return total, (losses, updated['batch_stats'])

        (total, (losses, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.model.params)
        finite = grads_finite(grads)
        new_state = BiSeNetTrainState(
            step=state.step + 1,
            model=safe_apply_updates(state.model, grads, self.tx, finite),
            stats=jax.tree_util.tree_map(
                lambda a, b: jnp.where(finite, a, b), new_stats,
                state.stats))
        return new_state, dict(losses, total=total, finite=finite)
