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


def test_bisenet_syncbn_under_shard_map(rng):
    """BiSeNet(axis_name='dp') inside shard_map computes GLOBAL batch-norm
    statistics — the conv-model path of the sync-BN story (the trainers'
    jit+GSPMD path is covered by test_multichip_training)."""
    from ctrlhair_tpu.config import BiSeNetConfig
    from ctrlhair_tpu.models.bisenet import BiSeNet

    mesh = make_mesh(8, tp=1)
    x = rng.standard_normal((16, 32, 32, 3)).astype(np.float32)
    cfg = BiSeNetConfig(input_size=32)

    plain = BiSeNet(cfg, train=True)
    variables = plain.init(jax.random.PRNGKey(0), jnp.asarray(x))
    ref_out, ref_mut = plain.apply(variables, jnp.asarray(x),
                                   mutable=['batch_stats'])

    synced = BiSeNet(cfg, train=True, axis_name='dp')

    def shard_fn(xs):
        out, mut = synced.apply(variables, xs, mutable=['batch_stats'])
        return out, mut

    fn = shard_map(shard_fn, mesh=mesh,
                   in_specs=P('dp'), out_specs=(P('dp'), P()),
                   check_rep=False)
    with mesh:
        out, mut = fn(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               atol=2e-4, rtol=2e-4)
    for (pa, a), b in zip(
            jax.tree_util.tree_flatten_with_path(mut)[0],
            jax.tree_util.tree_leaves(ref_mut)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=2e-5,
                                   err_msg='/'.join(map(str, pa)))
