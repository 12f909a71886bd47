# TPU timing of the Poisson solver variants at pipeline shapes.
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from ctrlhair_tpu.ops.poisson import poisson_blend
    from ctrlhair_tpu.utils.profiling import benchmark

    rng = np.random.default_rng(0)
    b = int(os.environ.get('B', '8'))
    s = 256
    src = jnp.asarray(rng.uniform(0, 255, (b, s, s, 3)), jnp.float32)
    tgt = jnp.asarray(rng.uniform(0, 255, (b, s, s, 3)), jnp.float32)
    yy, xx = np.mgrid[0:s, 0:s] / s
    hair = ((((xx - .5) / .35) ** 2 + ((yy - .4) / .3) ** 2) < 1)
    mask = jnp.asarray(np.tile(1 - hair.astype(np.float32), (b, 1, 1)))

    def run(method, **kw):
        f = jax.jit(lambda a, c, m: jax.vmap(
            lambda x, y, z: poisson_blend(x, y, z, method=method, **kw)
        )(a, c, m))
        t = benchmark(f, src, tgt, mask, iters=10)
        print(f'{method} {kw}: p50={t["p50_s"]*1e3:.1f}ms '
              f'({b / t["p50_s"]:.0f} img/s)', flush=True)

    run('cg', iterations=100)
    run('cg', iterations=200)
    run('cg', iterations=300)
    run('mg', mg_cycles=10)


if __name__ == '__main__':
    main()
