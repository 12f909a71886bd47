# Cross-replica sync-BN: BatchNorm with axis_name inside shard_map must
# compute GLOBAL batch statistics — the single-collective replacement for
# the reference's SynchronizedBatchNorm master/slave pipes
# (ref: sean_codes/.../sync_batchnorm/batchnorm.py:50-80) and InPlaceABNSync.
import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ctrlhair_tpu.models.layers import BatchNorm
from ctrlhair_tpu.parallel.mesh import make_mesh


def test_syncbn_matches_global_batchnorm(rng):
    mesh = make_mesh(8, tp=1)
    x = rng.standard_normal((16, 4, 4, 3)).astype(np.float32)

    sync_bn = BatchNorm(use_running_average=False, affine=False,
                        axis_name='dp')
    plain_bn = BatchNorm(use_running_average=False, affine=False)
    variables = plain_bn.init(jax.random.PRNGKey(0), jnp.asarray(x))

    # global-batch reference on one device
    ref, _ = plain_bn.apply(variables, jnp.asarray(x),
                            mutable=['batch_stats'])

    def shard_fn(xs):
        out, _ = sync_bn.apply(variables, xs, mutable=['batch_stats'])
        return out

    distributed = shard_map(shard_fn, mesh=mesh,
                            in_specs=P('dp'), out_specs=P('dp'))
    got = distributed(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                               rtol=2e-4, atol=2e-4)


def test_local_bn_differs_from_global(rng):
    """Sanity: without the collective, per-shard stats differ from global —
    proving the axis_name actually does the cross-replica reduction."""
    mesh = make_mesh(8, tp=1)
    x = rng.standard_normal((16, 4, 4, 3)).astype(np.float32) \
        + np.arange(16, dtype=np.float32)[:, None, None, None]
    plain_bn = BatchNorm(use_running_average=False, affine=False)
    variables = plain_bn.init(jax.random.PRNGKey(0), jnp.asarray(x))
    ref, _ = plain_bn.apply(variables, jnp.asarray(x),
                            mutable=['batch_stats'])

    def shard_fn(xs):
        out, _ = plain_bn.apply(variables, xs, mutable=['batch_stats'])
        return out

    distributed = shard_map(shard_fn, mesh=mesh,
                            in_specs=P('dp'), out_specs=P('dp'))
    got = distributed(jnp.asarray(x))
    assert np.abs(np.asarray(ref) - np.asarray(got)).max() > 0.1
