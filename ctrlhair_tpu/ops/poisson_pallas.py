# Fused Pallas CG solver for Poisson blending.
#
# The XLA-level CG loop (ops/poisson.py) issues ~8 HBM-bound kernels per
# iteration; at 256px that is launch/traffic dominated (~0.4 ms/iter).  Here
# the ENTIRE solve runs inside one Pallas program per image: x, r, p and the
# rhs stay resident in VMEM (~4.5 MB at 256px), each iteration is pure
# VPU work with zero HBM traffic, and only the final solution is written
# back.  Layout is [3, H, W] so the trailing dims map onto (sublane, lane)
# tiles; the 5-point stencil is built from shifted VMEM slices.

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _lap(x):
    """5-point stencil 4x - neighbours on [3, H, W] with zero boundary."""
    y = 4.0 * x
    y = y - jnp.pad(x, ((0, 0), (1, 0), (0, 0)))[:, :-1, :]   # up nbr
    y = y - jnp.pad(x, ((0, 0), (0, 1), (0, 0)))[:, 1:, :]    # down nbr
    y = y - jnp.pad(x, ((0, 0), (0, 0), (1, 0)))[:, :, :-1]   # left
    y = y - jnp.pad(x, ((0, 0), (0, 0), (0, 1)))[:, :, 1:]    # right
    return y


@functools.partial(jax.jit, static_argnames=('iterations', 'interpret'))
def pallas_masked_cg(b_eff: jnp.ndarray, unk: jnp.ndarray, x0: jnp.ndarray,
                     iterations: int = 200,
                     interpret: bool = False) -> jnp.ndarray:
    """Solve the masked-Laplacian system fully in VMEM.

    b_eff, x0: [N, 3, H, W] float32; unk: [N, 3, H, W] {0,1} float32
    (channel-broadcast upstream so every operand tiles identically).
    Returns x: [N, 3, H, W].
    """
    n, c, h, w = b_eff.shape
    spec = lambda: pl.BlockSpec((1, c, h, w), lambda i: (i, 0, 0, 0),
                                memory_space=pltpu.VMEM)
    grid_spec = pl.GridSpec(
        grid=(n,),
        in_specs=[spec(), spec(), spec()],
        out_specs=spec(),
    )

    def kernel(b_ref, unk_ref, x0_ref, out_ref):
        b = b_ref[0]
        unk = unk_ref[0]
        x0 = x0_ref[0]

        def a_op(v):
            return _lap(v * unk) * unk

        r0 = (b - a_op(x0)) * unk
        rs0 = jnp.sum(r0 * r0)

        def body(i, state):
            x, r, p, rs = state
            ap = a_op(p)
            alpha = rs / (jnp.sum(p * ap) + 1e-20)
            x = x + alpha * p
            r = r - alpha * ap
            rs_new = jnp.sum(r * r)
            beta = rs_new / (rs + 1e-20)
            p = r + beta * p
            return x, r, p, rs_new

        x, _, _, _ = jax.lax.fori_loop(
            0, iterations, body, (x0, r0, r0, rs0))
        out_ref[0] = x

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, c, h, w), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
    )(b_eff, unk, x0)


@functools.partial(jax.jit,
                   static_argnames=('iterations', 'with_gamma', 'interpret'))
def poisson_blend_fused(source: jnp.ndarray, target: jnp.ndarray,
                        mask: jnp.ndarray, iterations: int = 200,
                        with_gamma: bool = True,
                        interpret: bool = False) -> jnp.ndarray:
    """Batched Poisson blend with the Pallas-fused CG core.

    source/target: [N, H, W, 3] in [0,255]; mask: [N, H, W] {0,1}
    (mask!=0 receives source gradients).  Same system semantics as
    ops.poisson.poisson_blend (ref: poisson_blending.py:29-87).
    """
    if not interpret and jax.default_backend() == 'cpu':
        interpret = True   # Mosaic kernels need the interpreter off-TPU
    gamma = 2.2 if with_gamma else 1.0
    src = jnp.power(jnp.maximum(source.astype(jnp.float32), 0.0), 1.0 / gamma)
    tgt = jnp.power(jnp.maximum(target.astype(jnp.float32), 0.0), 1.0 / gamma)
    n, h, w = src.shape[:3]
    m = (mask != 0)

    interior = jnp.zeros((h, w), bool).at[1:h - 1, 1:w - 1].set(True)[None]
    fixed = (~m) & interior
    unk = (~fixed).astype(jnp.float32)[..., None]

    from ctrlhair_tpu.ops.poisson import _laplacian_full
    lap = jax.vmap(_laplacian_full)
    b = lap(src)
    b = jnp.where(m[..., None], b, tgt)
    x_fixed = jnp.where(fixed[..., None], tgt, 0.0)
    b_eff = (b - lap(x_fixed)) * unk

    to_chw = lambda x: x.transpose(0, 3, 1, 2)
    unk3 = jnp.broadcast_to(unk, b_eff.shape)
    # x0 = src (not tgt): the solution is src + a harmonic ring correction,
    # so this start converges ~10x faster (see ops/poisson.py)
    x = pallas_masked_cg(to_chw(b_eff), to_chw(unk3), to_chw(src * unk),
                         iterations=iterations, interpret=interpret)
    x = x.transpose(0, 2, 3, 1)
    out = jnp.where(fixed[..., None], tgt, x)
    out = jnp.power(jnp.clip(out, 0.0, None), gamma)
    return jnp.clip(out, 0.0, 255.0)
