# Component-level timing of the edit pipeline on the real chip.
# Usage: python scripts/profile_components.py [batch ...]
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from ctrlhair_tpu.config import PipelineConfig
    from ctrlhair_tpu.pipeline.editor import HairEditorTPU
    from ctrlhair_tpu.pipeline.latent import Latent
    from ctrlhair_tpu.utils.profiling import benchmark

    batches = [int(a) for a in sys.argv[1:]] or [8, 16, 32]
    cfg = PipelineConfig()
    editor = HairEditorTPU(cfg, seed=0)
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (256, 256, 3), dtype=np.uint8)
    res = editor.analyze_image(img)

    for b in batches:
        codes = jnp.tile(res['sean_codes'], (b, 1, 1))
        label = jnp.tile(res['label'], (b, 1, 1))
        face = jnp.tile(jnp.asarray(img)[None], (b, 1, 1, 1))
        lat = Latent(
            hsv=jnp.asarray(rng.uniform(0, 255, (b, 3)), jnp.float32),
            pca_std=jnp.asarray(rng.uniform(20, 120, (b, 1)), jnp.float32),
            curliness=jnp.asarray(rng.standard_normal((b, 1)), jnp.float32),
            texture=jnp.asarray(rng.standard_normal((b, 8)), jnp.float32),
            shape=jnp.tile(res['latent'].shape, (b, 1)),
            face=jnp.tile(res['latent'].face, (b, 1)))

        t_feat = benchmark(editor.feature, editor.params, lat, iters=10)
        t_render = benchmark(editor.edit_render, editor.params, codes,
                             label, lat, iters=10)
        gen = editor.edit_render(editor.params, codes, label, lat)
        t_blend = benchmark(editor.blend, editor.params, face, gen, label,
                            label, iters=10)
        t_full = benchmark(editor.output, editor.params, codes, lat, face,
                           label, label, iters=10)
        t_mask = benchmark(editor.decode_mask, editor.params,
                           lat.shape, lat.face, iters=10)
        t_analyze = benchmark(editor.analyze, editor.params,
                              jnp.tile(jnp.asarray(img)[None], (b, 1, 1, 1)),
                              jnp.tile(jnp.asarray(img)[None], (b, 1, 1, 1)),
                              iters=5)
        print(f'batch={b}: feature={t_feat["p50_s"]*1e3:.1f}ms '
              f'render={t_render["p50_s"]*1e3:.1f}ms '
              f'blend={t_blend["p50_s"]*1e3:.1f}ms '
              f'full={t_full["p50_s"]*1e3:.1f}ms '
              f'mask={t_mask["p50_s"]*1e3:.1f}ms '
              f'analyze={t_analyze["p50_s"]*1e3:.1f}ms '
              f'-> {b / t_full["p50_s"]:.1f} edits/s', flush=True)


if __name__ == '__main__':
    main()
