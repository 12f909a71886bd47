# Fused Pallas CG solver: interpret-mode correctness vs the XLA CG solver
# (hardware behaviour is exercised by bench/scripts on the real chip).
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ctrlhair_tpu.ops.poisson import poisson_blend
from ctrlhair_tpu.ops.poisson_pallas import poisson_blend_fused


def test_pallas_blend_matches_xla_cg(rng):
    s = 48
    src = jnp.asarray(rng.uniform(0, 255, (1, s, s, 3)), jnp.float32)
    tgt = jnp.asarray(rng.uniform(0, 255, (1, s, s, 3)), jnp.float32)
    mask = np.ones((s, s), np.float32)
    mask[12:36, 12:36] = 0.0   # keep target in the centre block
    mask = jnp.asarray(mask)[None]
    ref = jax.vmap(lambda a, b, c: poisson_blend(
        a, b, c, method='cg', iterations=600))(src, tgt, mask)
    got = poisson_blend_fused(src, tgt, mask, iterations=600,
                              interpret=True)
    assert float(jnp.abs(got - ref).max()) < 0.2


def test_pallas_blend_identity_outside_mask(rng):
    s = 32
    src = jnp.asarray(rng.uniform(0, 255, (1, s, s, 3)), jnp.float32)
    tgt = jnp.asarray(rng.uniform(0, 255, (1, s, s, 3)), jnp.float32)
    mask = np.zeros((s, s), np.float32)
    mask[4:20, 4:28] = 1.0
    out = np.asarray(poisson_blend_fused(src, tgt, jnp.asarray(mask)[None],
                                         iterations=200, interpret=True))
    keep = np.zeros((s, s), bool)
    keep[1:-1, 1:-1] = True
    keep &= mask == 0
    np.testing.assert_allclose(out[0][keep], np.asarray(tgt[0])[keep],
                               atol=6e-3)
