# Device-time breakdown via async chaining: the axon relay charges a ~30 ms
# completion-poll tick per host synchronisation, so wall-clock per-call
# timing overstates small programs by that constant.  Timing k enqueued
# calls with ONE final block gives  T(k) = tick + k * device_time; the
# slope is the true per-call device time.
# Usage: python scripts/device_time.py [batch]
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def slope_ms(fn, make_arg, k_lo=2, k_hi=10, reps=5):
    """Per-call device ms via two queue depths (median of reps)."""
    def run(k):
        args = [make_arg(i) for i in range(k)]
        outs = []
        t0 = time.perf_counter()
        for a in args:
            outs.append(fn(*a))
        import jax
        jax.block_until_ready(outs)
        return time.perf_counter() - t0
    run(2)  # warm
    lo = np.median([run(k_lo) for _ in range(reps)])
    hi = np.median([run(k_hi) for _ in range(reps)])
    return (hi - lo) / (k_hi - k_lo) * 1e3


def main():
    import jax
    import jax.numpy as jnp
    from ctrlhair_tpu.config import PipelineConfig
    from ctrlhair_tpu.pipeline.editor import HairEditorTPU
    from ctrlhair_tpu.pipeline.latent import Latent

    b = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    cfg = PipelineConfig()
    editor = HairEditorTPU(cfg, seed=0)
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (256, 256, 3), dtype=np.uint8)
    res = editor.analyze_image(img)
    jax.block_until_ready(res['sean_codes'])

    codes = jnp.tile(res['sean_codes'], (b, 1, 1))
    label = jnp.tile(res['label'], (b, 1, 1))
    face = jnp.tile(jnp.asarray(img)[None], (b, 1, 1, 1))
    img512 = jnp.tile(jnp.asarray(img)[None], (b, 1, 1, 1))

    def lat(i):
        return Latent(
            hsv=jnp.asarray(rng.uniform(0, 255, (b, 3)), jnp.float32),
            pca_std=jnp.asarray(rng.uniform(20, 120, (b, 1)), jnp.float32),
            curliness=jnp.zeros((b, 1)) + 0.01 * i,
            texture=jnp.zeros((b, 8)) + 0.01 * i,
            shape=jnp.tile(res['latent'].shape, (b, 1)),
            face=jnp.tile(res['latent'].face, (b, 1)))

    gen = editor.edit_render(editor.params, codes, label, lat(0))
    jax.block_until_ready(gen)

    t_feat = slope_ms(editor.feature, lambda i: (editor.params, lat(i)))
    t_render = slope_ms(editor.edit_render,
                        lambda i: (editor.params, codes, label, lat(i)))
    t_blend = slope_ms(editor.blend,
                       lambda i: (editor.params, face, gen, label, label))
    t_full = slope_ms(editor.output,
                      lambda i: (editor.params, codes, lat(i), face,
                                 label, label))
    t_mask = slope_ms(editor.decode_mask,
                      lambda i: (editor.params, lat(i).shape, lat(i).face))
    t_analyze = slope_ms(editor.analyze,
                         lambda i: (editor.params, face, img512))
    print(f'batch={b} DEVICE ms/call: feature={t_feat:.2f} '
          f'render={t_render:.2f} blend={t_blend:.2f} full={t_full:.2f} '
          f'mask={t_mask:.2f} analyze={t_analyze:.2f}', flush=True)
    print(f'batch={b} device edits/s (full): {b / (t_full / 1e3):.1f}  '
          f'analyze img/s: {b / (t_analyze / 1e3):.1f}', flush=True)

    # Poisson variants at batch b
    from ctrlhair_tpu.ops.poisson import poisson_blend
    from ctrlhair_tpu.ops.poisson_pallas import poisson_blend_fused
    genf = gen * 127.5 + 127.5
    mask = (label == 13).astype(jnp.float32)
    facef = face.astype(jnp.float32)
    for iters in (100, 200):
        f_pal = jax.jit(lambda a, c, m: poisson_blend_fused(
            a, c, m, iterations=iters))
        jax.block_until_ready(f_pal(facef, genf, 1 - mask))
        t_p = slope_ms(f_pal, lambda i: (facef, genf, 1 - mask))
        print(f'  pallas CG {iters} iters: {t_p:.2f} ms', flush=True)
    f_cg = jax.jit(lambda a, c, m: jax.vmap(
        lambda x, y, z: poisson_blend(x, y, z, method='cg',
                                      iterations=200))(a, c, m))
    jax.block_until_ready(f_cg(facef, genf, 1 - mask))
    t_cg = slope_ms(f_cg, lambda i: (facef, genf, 1 - mask))
    print(f'  xla CG 200 iters: {t_cg:.2f} ms', flush=True)
    f_mg = jax.jit(lambda a, c, m: jax.vmap(
        lambda x, y, z: poisson_blend(x, y, z, method='mg'))(a, c, m))
    jax.block_until_ready(f_mg(facef, genf, 1 - mask))
    t_mg = slope_ms(f_mg, lambda i: (facef, genf, 1 - mask))
    print(f'  xla multigrid: {t_mg:.2f} ms', flush=True)


if __name__ == '__main__':
    main()
