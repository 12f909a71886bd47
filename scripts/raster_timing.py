# Time the warp rasterizer variants at the shape-transfer working size
# (672 = 512 + 2*80 pad).  Usage: python scripts/raster_timing.py [size]
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from ctrlhair_tpu.ops.landmarks import canonical_template_81
    from ctrlhair_tpu.ops.raster_pallas import rasterize_uv_pallas
    from ctrlhair_tpu.ops.warp import (MAX_TRIS, CHOSEN_LANDMARKS,
                                       build_warp_mesh, rasterize_uv)
    from ctrlhair_tpu.utils.profiling import benchmark

    size = int(sys.argv[1]) if len(sys.argv) > 1 else 672
    lm = canonical_template_81() * (size * 0.76) + size * 0.12
    src = lm[CHOSEN_LANDMARKS]
    dst = src + np.array([9.0, -6.0])
    verts_src, verts_dst, tris = build_warp_mesh(src, dst, size, size,
                                                 use_arap=False)
    print(f'size={size} verts={len(verts_src)} tris={len(tris)}', flush=True)
    tris_pad = np.full((MAX_TRIS, 3), -1, np.int32)
    tris_pad[:len(tris)] = tris
    uv = (verts_src / size).astype(np.float32)

    t_xla = benchmark(
        lambda: rasterize_uv(jnp.asarray(verts_dst, jnp.float32),
                             jnp.asarray(tris_pad), jnp.asarray(uv),
                             size, size), iters=10)
    print(f'xla raster:    p50={t_xla["p50_s"]*1e3:.2f} ms', flush=True)

    # include host binning cost in the end-to-end number
    def run_pallas():
        return rasterize_uv_pallas(verts_dst.astype(np.float32), tris_pad,
                                   uv, size, size)
    t_pal = benchmark(run_pallas, iters=10)
    print(f'pallas binned: p50={t_pal["p50_s"]*1e3:.2f} ms', flush=True)

    # host binning alone
    from ctrlhair_tpu.ops.raster_pallas import _bin_triangles
    t0 = time.perf_counter()
    for _ in range(10):
        _bin_triangles(verts_dst.astype(np.float32), tris_pad, uv, size,
                       size)
    print(f'host binning:  {(time.perf_counter()-t0)/10*1e3:.2f} ms',
          flush=True)

    a = np.asarray(rasterize_uv(jnp.asarray(verts_dst, jnp.float32),
                                jnp.asarray(tris_pad), jnp.asarray(uv),
                                size, size))
    b = np.asarray(run_pallas())
    agree = (np.abs(a - b) < 1e-4).mean()
    print(f'agreement vs xla: {agree:.4f}', flush=True)


if __name__ == '__main__':
    main()
