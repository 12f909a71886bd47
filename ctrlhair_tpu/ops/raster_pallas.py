# Pallas triangle rasterizer for the mask-warp UV map.
#
# The XLA rasteriser (ops/warp.rasterize_uv) scans triangle chunks and
# materialises [P, chunk] edge-function temporaries in HBM each step — tens
# of GB of traffic at 672px.  This kernel tiles the pixel grid into VMEM
# blocks and loops triangles on-core: per tile only the final (u, v) map is
# written back.  Replaces the reference's Cython z-buffer rasteriser
# (mesh_core.cpp:150-215) at TPU speed.

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_H = 16


def _kernel(tri_ref, uvt_ref, out_u_ref, out_v_ref, *, n_tris: int,
            height: int, width: int):
    th = out_u_ref.shape[0]
    row0 = pl.program_id(0) * th
    # integer iota + cast: Mosaic does not lower float iota directly
    py = (jax.lax.broadcasted_iota(jnp.int32, (th, width), 0)
          + row0).astype(jnp.float32)
    px = jax.lax.broadcasted_iota(jnp.int32, (th, width), 1).astype(
        jnp.float32)

    ident_u = px / jnp.float32(width - 1)
    ident_v = py / jnp.float32(height - 1)

    tile_y_min = jnp.float32(row0)
    tile_y_max = jnp.float32(row0 + th - 1)

    # f32 masks throughout: Mosaic does not legalize i1-vector loop carries
    def body(t, state):
        found, u, v = state
        row = tri_ref[pl.ds(t, 1), :]        # [1, 8] dynamic row load
        min_y, max_y = row[0, 6], row[0, 7]
        hit_tile = (min_y <= tile_y_max) & (max_y >= tile_y_min)

        def compute(state):
            found, u, v = state
            ax, ay = row[0, 0], row[0, 1]
            bx, by = row[0, 2], row[0, 3]
            cx, cy = row[0, 4], row[0, 5]

            area = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
            s = jnp.where(area >= 0, 1.0, -1.0)
            inv_area = s / jnp.maximum(jnp.abs(area), 1e-12)

            w_a = ((cx - bx) * (py - by) - (cy - by) * (px - bx)) * s
            w_b = ((ax - cx) * (py - cy) - (ay - cy) * (px - cx)) * s
            w_c = ((bx - ax) * (py - ay) - (by - ay) * (px - ax)) * s
            eps = -1e-6
            inside = (jnp.where(w_a >= eps, 1.0, 0.0)
                      * jnp.where(w_b >= eps, 1.0, 0.0)
                      * jnp.where(w_c >= eps, 1.0, 0.0))

            alpha = w_a * inv_area
            beta = w_b * inv_area
            gamma = w_c * inv_area
            uvrow = uvt_ref[pl.ds(t, 1), :]      # [1, 8]
            u_tri = (alpha * uvrow[0, 0] + beta * uvrow[0, 2]
                     + gamma * uvrow[0, 4])
            v_tri = (alpha * uvrow[0, 1] + beta * uvrow[0, 3]
                     + gamma * uvrow[0, 5])
            new = inside * (1.0 - found)
            return (jnp.maximum(found, inside),
                    u + new * (u_tri - u), v + new * (v_tri - v))

        # bbox cull: skip whole tiles this triangle cannot touch (invalid
        # padding rows carry min_y=+inf so they never hit)
        return jax.lax.cond(hit_tile, compute, lambda st: st, state)

    init = (jnp.zeros((th, width), jnp.float32), ident_u, ident_v)
    _, u, v = jax.lax.fori_loop(0, n_tris, body, init)
    out_u_ref[:] = u
    out_v_ref[:] = v


@functools.partial(jax.jit,
                   static_argnames=('height', 'width', 'interpret'))
def rasterize_uv_pallas(verts_dst: jnp.ndarray, tris: jnp.ndarray,
                        uv: jnp.ndarray, height: int, width: int,
                        interpret: bool = False) -> jnp.ndarray:
    """Drop-in for ops.warp.rasterize_uv: returns [H, W, 2] UV map.

    verts_dst [V,2] px; tris [T,3] int32 (-1 padding rows); uv [V,2].
    """
    pad_h = (-height) % TILE_H
    h_pad = height + pad_h

    idx = jnp.maximum(tris, 0)
    a = verts_dst[idx[:, 0]]
    b = verts_dst[idx[:, 1]]
    c = verts_dst[idx[:, 2]]
    valid = tris[:, 0] >= 0
    ys = jnp.stack([a[:, 1], b[:, 1], c[:, 1]], axis=1)
    min_y = jnp.where(valid, jnp.min(ys, axis=1), 1e9)[:, None]
    max_y = jnp.where(valid, jnp.max(ys, axis=1), -1e9)[:, None]
    tri_data = jnp.concatenate([a, b, c, min_y, max_y], axis=1)  # [T, 8]
    uv_data = jnp.concatenate(
        [uv[idx[:, 0]], uv[idx[:, 1]], uv[idx[:, 2]],
         jnp.zeros((tris.shape[0], 2), uv.dtype)], axis=1)       # [T, 8]

    kern = functools.partial(_kernel, n_tris=tris.shape[0],
                             height=height, width=width)
    grid_spec = pl.GridSpec(
        grid=(h_pad // TILE_H,),
        in_specs=[
            pl.BlockSpec(tri_data.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(uv_data.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TILE_H, width), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_H, width), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    u, v = pl.pallas_call(
        kern,
        out_shape=[jax.ShapeDtypeStruct((h_pad, width), jnp.float32),
                   jax.ShapeDtypeStruct((h_pad, width), jnp.float32)],
        grid_spec=grid_spec,
        interpret=interpret,
    )(tri_data.astype(jnp.float32), uv_data.astype(jnp.float32))
    return jnp.stack([u[:height], v[:height]], axis=-1)
