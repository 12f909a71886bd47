# Generic GAN training state + finite-guarded optimizer updates.
#
# Replaces the reference's per-model torch Adam optimizers and the NaN/Inf
# raise guards (ref: my_torchlib/train_utils.py:54-89) with optax updates
# that are skipped atomically when any loss/grad is non-finite — the
# jit-compatible analogue of "raise on nan" for long unattended runs.

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax


def _dict_schedule(d: Dict[int, float]):
    """{step: value} -> piecewise-constant optax schedule, the same
    convention the loss-weight schedules use (losses.LossSchedule)."""
    items = sorted(d.items())
    bounds = jnp.asarray([s for s, _ in items[1:]], jnp.int32)
    vals = jnp.asarray([v for _, v in items], jnp.float32)

    def sched(count):
        return vals[jnp.searchsorted(bounds, count, side='right')]

    return sched


def adam(lr, beta1: float = 0.5, beta2: float = 0.999):
    """Adam with the GAN-standard betas (ref: solver.py:52-61).

    `lr` is a float or a {step: lr} dict — the dict form gives a
    piecewise-constant schedule on the optimizer's update count (used to
    drop the GAN learning rates when a late loss term such as
    lambda_rec_img activates, ref: color_texture_branch/config.py:35)."""
    if isinstance(lr, dict):
        lr = _dict_schedule(lr)
    return optax.adam(lr, b1=beta1, b2=beta2)


@flax.struct.dataclass
class ModelOpt:
    params: Any
    opt_state: Any

    @classmethod
    def create(cls, params, tx):
        return cls(params=params, opt_state=tx.init(params))


@flax.struct.dataclass
class GANTrainState:
    step: jnp.ndarray
    gen: ModelOpt
    dis: ModelOpt
    dis_noise: Optional[ModelOpt] = None


def safe_apply_updates(model: ModelOpt, grads, tx,
                       finite: jnp.ndarray) -> ModelOpt:
    """Apply optax updates only when `finite`; otherwise keep state as-is."""
    updates, new_opt = tx.update(grads, model.opt_state, model.params)
    new_params = optax.apply_updates(model.params, updates)
    pick = lambda new, old: jax.tree_util.tree_map(
        lambda a, b: jnp.where(finite, a, b), new, old)
    return ModelOpt(params=pick(new_params, model.params),
                    opt_state=pick(new_opt, model.opt_state))


def grads_finite(grads) -> jnp.ndarray:
    leaves = jax.tree_util.tree_leaves(grads)
    return jnp.all(jnp.stack([jnp.all(jnp.isfinite(g)) for g in leaves]))
