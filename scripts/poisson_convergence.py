# How many CG iterations does the 256/512/1024px blend actually need?
# Compares N-iteration solutions against a 4000-iteration reference on a
# realistic dilated-hair mask, reporting max/99p abs pixel error (0-255).
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def hairish_mask(s):
    yy, xx = np.mgrid[0:s, 0:s].astype(np.float64) / s
    blob = (((xx - 0.5) / 0.35) ** 2 + ((yy - 0.38) / 0.33) ** 2) < 1.0
    face = (((xx - 0.5) / 0.22) ** 2 + ((yy - 0.55) / 0.28) ** 2) < 1.0
    hair = blob & ~face
    return hair.astype(np.uint8)


def main():
    if '--cpu' in sys.argv:
        import jax
        jax.config.update('jax_platforms', 'cpu')
    import jax.numpy as jnp
    from ctrlhair_tpu.ops.poisson import poisson_blend

    rng = np.random.default_rng(0)
    for s in (256, 512):
        hair = hairish_mask(s)
        blend_mask = 1 - hair  # non-hair region is solved, like the editor
        src = rng.uniform(0, 255, (s, s, 3))
        tgt = rng.uniform(0, 255, (s, s, 3))
        # smooth them so they resemble images
        import scipy.ndimage
        src = scipy.ndimage.gaussian_filter(src, (9, 9, 0))
        tgt = scipy.ndimage.gaussian_filter(tgt, (9, 9, 0))
        ref = np.asarray(poisson_blend(
            jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(blend_mask),
            iterations=4000, method='cg'))
        for it in (100, 200, 300, 500):
            got = np.asarray(poisson_blend(
                jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(blend_mask),
                iterations=it, method='cg'))
            err = np.abs(got - ref)
            print(f's={s} cg iters={it}: max={err.max():.3f} '
                  f'p99={np.percentile(err, 99):.3f} '
                  f'mean={err.mean():.4f}', flush=True)
        for cyc in (4, 6, 8, 10, 14, 20):
            got = np.asarray(poisson_blend(
                jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(blend_mask),
                method='mg', mg_cycles=cyc))
            err = np.abs(got - ref)
            print(f's={s} mg cycles={cyc}: max={err.max():.3f} '
                  f'p99={np.percentile(err, 99):.3f} '
                  f'mean={err.mean():.4f}', flush=True)


if __name__ == '__main__':
    main()
