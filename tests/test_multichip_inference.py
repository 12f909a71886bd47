# Batched inference sharded over the virtual device mesh: the serve-scale
# path — edit batches split across 'dp', XLA handles placement end to end.
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ctrlhair_tpu.parallel import mesh as pmesh
from ctrlhair_tpu.pipeline.latent import Latent


def test_sharded_edit_batch_matches_single_device(tiny_editor):
    editor = tiny_editor
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
    res = editor.analyze_image(img)

    n = 8
    codes = jnp.tile(res['sean_codes'], (n, 1, 1))
    label = jnp.tile(res['label'], (n, 1, 1))
    latent = Latent(
        hsv=jnp.asarray(rng.uniform(0, 255, (n, 3)), jnp.float32),
        pca_std=jnp.asarray(rng.uniform(20, 120, (n, 1)), jnp.float32),
        curliness=jnp.asarray(rng.standard_normal((n, 1)), jnp.float32),
        texture=jnp.asarray(rng.standard_normal((n, 8)), jnp.float32),
        shape=jnp.tile(res['latent'].shape, (n, 1)),
        face=jnp.tile(res['latent'].face, (n, 1)))

    ref = np.asarray(editor.edit_render(editor.params, codes, label, latent))

    mesh = pmesh.make_mesh(8, tp=1)
    with mesh:
        params = jax.device_put(editor.params, pmesh.replicated(mesh))
        codes_s = jax.device_put(codes, pmesh.batch_sharding(mesh))
        label_s = jax.device_put(label, pmesh.batch_sharding(mesh))
        latent_s = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, pmesh.batch_sharding(mesh)), latent)
        out = editor.edit_render(params, codes_s, label_s, latent_s)
        # result is sharded over dp
        assert 'dp' in str(out.sharding.spec)
    np.testing.assert_allclose(ref, np.asarray(out), atol=2e-2, rtol=2e-2)
