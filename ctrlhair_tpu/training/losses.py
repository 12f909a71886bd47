# Loss zoo + step-scheduled loss weights, jit-compatible.
#
# Parity targets: the GAN loss menu and penalties of both branch solvers
# (ref: color_texture_branch/solver.py:168-216, shape_branch/solver.py:157-
# 214), the KL/moment terms (shape solver :61-66,136-141), and the
# LossUpdater step schedule (ref: my_torchlib/train_utils.py:13-31) —
# reimplemented as pure functions; the schedule resolves inside jit via
# jnp.select over static thresholds instead of host-side dict mutation.

from __future__ import annotations

from typing import Callable, Dict, Mapping

import jax
import jax.numpy as jnp


def gan_loss_g(gan_type: str, dis_fake: jnp.ndarray) -> jnp.ndarray:
    """Generator-side adversarial loss (ref: solver.py:168-183)."""
    if gan_type == 'lsgan':
        return jnp.mean((dis_fake - 1.0) ** 2)
    if gan_type == 'nsgan':
        return jnp.mean(-jax.nn.log_sigmoid(dis_fake))
    if gan_type in ('wgan_gp', 'hinge'):
        return -jnp.mean(dis_fake)
    if gan_type == 'hinge2':
        return jnp.mean(jnp.maximum(1.0 - dis_fake, 0.0))
    raise NotImplementedError(gan_type)


def gan_loss_d(gan_type: str, dis_real: jnp.ndarray,
               dis_fake: jnp.ndarray) -> jnp.ndarray:
    """Discriminator-side adversarial loss (ref: solver.py:185-202)."""
    if gan_type == 'lsgan':
        return jnp.mean(dis_fake ** 2) + jnp.mean((dis_real - 1.0) ** 2)
    if gan_type == 'nsgan':
        return jnp.mean(-jax.nn.log_sigmoid(-dis_fake)) + \
            jnp.mean(-jax.nn.log_sigmoid(dis_real))
    if gan_type == 'wgan_gp':
        return jnp.mean(dis_fake) - jnp.mean(dis_real)
    if gan_type in ('hinge', 'hinge2'):
        return jnp.mean(jnp.maximum(1.0 - dis_real, 0.0)) + \
            jnp.mean(jnp.maximum(1.0 + dis_fake, 0.0))
    raise NotImplementedError(gan_type)


def wgan_gradient_penalty(adv_fn: Callable[[jnp.ndarray], jnp.ndarray],
                          real: jnp.ndarray, fake: jnp.ndarray,
                          rng: jax.Array) -> jnp.ndarray:
    """((|∇_x D(x̂)|₂ - 1)²) on interpolates (ref: solver.py:204-216)."""
    alpha_shape = (real.shape[0],) + (1,) * (real.ndim - 1)
    alpha = jax.random.uniform(rng, alpha_shape, real.dtype)
    x_hat = alpha * real + (1.0 - alpha) * fake

    def scalar_adv(x):
        return jnp.sum(adv_fn(x))

    grads = jax.grad(scalar_adv)(x_hat)
    norms = jnp.sqrt(jnp.sum(grads.reshape(grads.shape[0], -1) ** 2,
                             axis=1) + 1e-12)
    return jnp.mean((norms - 1.0) ** 2)


def r0_gradient_penalty(adv_fn: Callable[[jnp.ndarray], jnp.ndarray],
                        real: jnp.ndarray) -> jnp.ndarray:
    """|∇_x D(x)|² on real inputs — the shape branch's lambda_gp_0
    (ref: shape_branch/solver.py:207-214)."""
    def scalar_adv(x):
        return jnp.sum(adv_fn(x))

    grads = jax.grad(scalar_adv)(real)
    return jnp.mean(jnp.sum(grads.reshape(grads.shape[0], -1) ** 2, axis=1))


def kl_loss(mean: jnp.ndarray, std: jnp.ndarray) -> jnp.ndarray:
    """VAE KL with the reference's var-log form
    (ref: shape_branch/solver.py:61-66)."""
    var = std ** 2
    return 0.5 * jnp.mean(mean ** 2 + var - 1.0 - jnp.log(var + 1e-4))


def kl_loss_free_bits(mean: jnp.ndarray, std: jnp.ndarray,
                      free_bits: float) -> jnp.ndarray:
    """Per-dimension free-bits KL (Kingma et al., IAF appendix C.8).

    A latent dimension whose batch-mean KL is already below `free_bits`
    nats contributes the constant floor instead of its KL, so the penalty
    cannot keep pushing quiet dimensions toward the prior — the standard
    posterior-collapse counter-measure.  With free_bits=0 this reduces to
    kl_loss exactly.  The reference trains 380k steps and never needs it
    (ref: shape_branch/config.py:57); short soaks on tiny data do (the
    r4 soak's hair latent collapsed to KL ~ 0.014 total)."""
    var = std ** 2
    kl_per_dim = 0.5 * jnp.mean(
        mean ** 2 + var - 1.0 - jnp.log(var + 1e-4), axis=0)
    return jnp.mean(jnp.maximum(kl_per_dim, free_bits))


def moment_losses(noise: jnp.ndarray, second_moment_target: float = 1.0):
    """Match batch latent moments to the prior
    (ref: color solver :234-242 / shape solver :136-141)."""
    m1 = jnp.mean(jnp.mean(noise, axis=0) ** 2)
    m2 = jnp.mean((jnp.mean(noise ** 2, axis=0) - second_moment_target) ** 2)
    return m1, m2


def weighted_bce_with_logits(logits: jnp.ndarray, targets01: jnp.ndarray,
                             weights: jnp.ndarray | None = None
                             ) -> jnp.ndarray:
    """BCE(sigmoid(logits), targets) with optional per-sample weights
    normalised to mean 1 (ref: color solver :141-156)."""
    p = jnp.clip(jax.nn.sigmoid(logits), 1e-7, 1 - 1e-7)
    bce = -(targets01 * jnp.log(p) + (1 - targets01) * jnp.log(1 - p))
    if weights is not None:
        weights = weights / jnp.sum(weights) * weights.shape[0]
        bce = bce * weights
    return jnp.mean(bce)


class LossSchedule:
    """Step-scheduled scalar weights ({start_step: weight} dicts).

    Functional LossUpdater (ref: my_torchlib/train_utils.py:13-31): weights
    resolve to traced scalars from the step inside jit.
    """

    def __init__(self, cfg):
        self.static: Dict[str, float] = {}
        self.scheduled: Dict[str, Mapping[int, float]] = {}
        for name in dir(cfg):
            if not name.startswith('lambda_'):
                continue
            val = getattr(cfg, name)
            if isinstance(val, Mapping):
                self.scheduled[name] = dict(sorted(val.items()))
            elif isinstance(val, (int, float)):
                self.static[name] = float(val)

    def weight(self, name: str, step) -> jnp.ndarray:
        if name in self.static:
            return jnp.asarray(self.static[name], jnp.float32)
        sched = self.scheduled[name]
        steps = list(sched.keys())
        vals = [sched[s] for s in steps]
        out = jnp.asarray(vals[0], jnp.float32)
        for s, v in zip(steps[1:], vals[1:]):
            out = jnp.where(step >= s, jnp.asarray(v, jnp.float32), out)
        return out

    def weight_host(self, name: str, step: int) -> float:
        """Pure-Python weight for a concrete host step: no jnp ops, no
        device dispatch — usable in per-step host control flow (the split
        rec_img skip check runs every training step)."""
        if name in self.static:
            return self.static[name]
        out = None
        for s, v in self.scheduled[name].items():   # sorted at __init__
            if out is None or step >= s:
                out = v
        return float(out)

    def total(self, loss_dict: Dict[str, jnp.ndarray], step) -> jnp.ndarray:
        """Weighted sum; keys absent from the config are skipped, matching
        the reference's `if k not in cfg: continue`
        (ref: train_utils.py:72-75)."""
        tot = jnp.asarray(0.0, jnp.float32)
        for key, val in loss_dict.items():
            if key in self.static or key in self.scheduled:
                tot = tot + self.weight(key, step) * val.astype(jnp.float32)
        return tot


def check_finite(loss_dict: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    """All-finite flag over a loss dict — the jit-compatible analogue of the
    reference's NaN/Inf raise guards (ref: train_utils.py:66-71).  Callers
    skip the optimizer update when False (see training.train_state)."""
    flags = [jnp.all(jnp.isfinite(v)) for v in loss_dict.values()]
    return jnp.all(jnp.stack(flags))
