# Triangle-mesh hair-mask warping — the wrap_codes replacement.
#
# The reference chain is: write .node files -> subprocess Berkeley `triangle
# -q30` -> subprocess libigl `my_arap` (100 iters) -> parse OBJ -> Cython
# z-buffer rasterizer -> cv2.remap (ref: wrap_codes/wrap_triangle/
# triangle_wrap_hair.py:47-125, step_3/generate_node.py:23-93).  Five process/
# FFI boundaries with file-based I/O per edit.
#
# TPU-native redesign:
#   * mesh build (few hundred points) stays on host: scipy Delaunay over
#     landmarks + boundary + interior Steiner grid points;
#   * deformation: ARAP solved by the native C++ module
#     (ctrlhair_tpu/native/arap.cpp, same local-global algorithm as libigl's,
#     100 iterations) when built, else piecewise-affine displacement
#     interpolation — both produce deformed vertex positions;
#   * rasterization + UV gather fuse into ONE jitted XLA program:
#     chunked edge-function tests over static padded triangle lists, then a
#     bilinear gather (replaces mesh_core_cython + cv2.remap).

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ctrlhair_tpu.constants import HAIR_IDX, UNKNOWN_LABEL

# landmark subset used for warping: all 81 minus brow endpoints
# (ref: wrap_codes/mask_adaptor.py:110)
CHOSEN_LANDMARKS = [k for k in range(81) if k not in (26, 17, 25, 19)]
BG_PAD = 80          # border padding in px (ref: mask_adaptor.py:120)
BOUNDARY_POINTS = 50  # boundary samples per side (ref: triangle_wrap_hair.py:53)
MAX_TRIS = 2048       # static triangle budget for the jitted rasterizer


def boundary_nodes(width: int, height: int,
                   num: int = BOUNDARY_POINTS) -> np.ndarray:
    """Boundary control points, fixed in place during deformation
    (ref: step_3/generate_node.py:37-71: top, bottom, then side interiors)."""
    xs = np.linspace(0, width - 1, num)
    ys = np.linspace(0, height - 1, num)
    top = np.stack([xs, np.zeros(num)], 1)
    bottom = np.stack([xs, np.full(num, height - 1)], 1)
    left = np.stack([np.zeros(num - 2), ys[1:-1]], 1)
    right = np.stack([np.full(num - 2, width - 1), ys[1:-1]], 1)
    return np.concatenate([top, bottom, left, right]).astype(np.float64)


def _steiner_points(existing: np.ndarray, width: int, height: int,
                    spacing: float) -> np.ndarray:
    """Interior grid points not too close to existing ones — a cheap,
    robust stand-in for `triangle -q30` Steiner refinement: they give ARAP
    free vertices so the deformation bends smoothly between landmarks."""
    xs = np.arange(spacing, width - 1 - spacing / 2, spacing)
    ys = np.arange(spacing, height - 1 - spacing / 2, spacing)
    gx, gy = np.meshgrid(xs, ys)
    grid = np.stack([gx.ravel(), gy.ravel()], 1)
    if len(existing):
        d2 = ((grid[:, None, :] - existing[None, :, :]) ** 2).sum(-1)
        grid = grid[d2.min(1) > (spacing * 0.5) ** 2]
    return grid


def build_warp_mesh(src_landmarks: np.ndarray, dst_landmarks: np.ndarray,
                    width: int, height: int, use_arap: bool = True):
    """Triangulate source points and deform them onto target landmarks.

    Returns (verts_src [V,2], verts_dst [V,2], tris [T,3]).
    Constrained vertices: landmarks -> dst positions, boundary -> identity
    (exactly the reference's correspondence file, generate_node.py:48-71);
    Steiner vertices are free and solved by ARAP (or interpolated).
    """
    from scipy.spatial import Delaunay

    boundary = boundary_nodes(width, height)
    constrained_src = np.concatenate([src_landmarks, boundary])
    constrained_dst = np.concatenate([dst_landmarks, boundary])
    spacing = max(width, height) / 24.0
    steiner = _steiner_points(constrained_src, width, height, spacing)
    verts_src = np.concatenate([constrained_src, steiner])
    tri = Delaunay(verts_src)
    tris = tri.simplices.astype(np.int32)

    n_c = len(constrained_src)
    verts_dst = verts_src.copy()
    verts_dst[:n_c] = constrained_dst

    free_idx = np.arange(n_c, len(verts_src))
    if len(free_idx):
        solved = None
        if use_arap:
            from ctrlhair_tpu.native import arap_solve
            solved = arap_solve(verts_src, tris,
                                np.arange(n_c), constrained_dst)
        if solved is not None:
            verts_dst = solved
        else:
            verts_dst[free_idx] = piecewise_affine_free_verts(
                verts_src[free_idx], constrained_src, constrained_dst)
    return verts_src, verts_dst, tris


def piecewise_affine_free_verts(free_pts: np.ndarray,
                                constrained_src: np.ndarray,
                                constrained_dst: np.ndarray) -> np.ndarray:
    """Interpolate the constrained displacement field onto free points via
    the coarse constrained Delaunay: the non-ARAP piecewise-affine
    deformation.  Used as build_warp_mesh's fallback and as an
    ARAP-independent cross-check of warp fidelity (the reference pipes the
    same correspondences through libigl ARAP instead,
    ref: wrap_codes/wrap_triangle/triangle_wrap_hair.py:47-125)."""
    from scipy.spatial import Delaunay

    disp = constrained_dst - constrained_src
    coarse = Delaunay(constrained_src)
    simplex = coarse.find_simplex(free_pts)
    simplex = np.maximum(simplex, 0)
    trans = coarse.transform[simplex]
    bary2 = np.einsum('nij,nj->ni', trans[:, :2], free_pts - trans[:, 2])
    bary = np.concatenate([bary2, 1 - bary2.sum(1, keepdims=True)], 1)
    tri_pts = coarse.simplices[simplex]
    return free_pts + np.einsum('ni,nid->nd', bary, disp[tri_pts])


@functools.partial(jax.jit, static_argnames=('height', 'width', 'chunk'))
def rasterize_uv(verts_dst: jnp.ndarray, tris: jnp.ndarray,
                 uv: jnp.ndarray, height: int, width: int,
                 chunk: int = 16) -> jnp.ndarray:
    """Rasterize per-vertex UVs of the deformed mesh into a [H, W, 2] map.

    verts_dst: [V,2] float pixel coords; tris: [T,3] int32 (pad with -1 rows
    up to a static size); uv: [V,2].  Pixels covered by no triangle fall back
    to the identity mapping (the reference instead leaves -1 and patches
    borders, triangle_wrap_hair.py:78-85).
    Fused XLA program: edge-function tests over triangle chunks via lax.scan.
    """
    ys = jnp.arange(height, dtype=jnp.float32)
    xs = jnp.arange(width, dtype=jnp.float32)
    px, py = jnp.meshgrid(xs, ys)            # [H,W]
    p = jnp.stack([px.ravel(), py.ravel()], 1)  # [P,2]

    t_pad = (-tris.shape[0]) % chunk
    tris = jnp.concatenate(
        [tris, jnp.full((t_pad, 3), -1, jnp.int32)], 0)
    n_chunks = tris.shape[0] // chunk
    tris = tris.reshape(n_chunks, chunk, 3)

    ident_uv = jnp.stack([px.ravel() / width,
                          py.ravel() / height], 1)

    def body(carry, tri_chunk):
        found, uv_acc = carry
        valid = tri_chunk[:, 0] >= 0                       # [C]
        idx = jnp.maximum(tri_chunk, 0)
        a = verts_dst[idx[:, 0]]                            # [C,2]
        b = verts_dst[idx[:, 1]]
        c = verts_dst[idx[:, 2]]
        area = ((b[:, 0] - a[:, 0]) * (c[:, 1] - a[:, 1])
                - (b[:, 1] - a[:, 1]) * (c[:, 0] - a[:, 0]))  # [C]
        s = jnp.where(area >= 0, 1.0, -1.0)
        inv_area = s / jnp.maximum(jnp.abs(area), 1e-12)

        def edge(p0, p1):
            # cross(p1-p0, p-p0) for all pixels: [P,C]
            return ((p1[:, 0] - p0[:, 0]) * (p[:, None, 1] - p0[:, 1])
                    - (p1[:, 1] - p0[:, 1]) * (p[:, None, 0] - p0[:, 0]))

        w_a = edge(b, c) * s                                # [P,C] ~ alpha
        w_b = edge(c, a) * s
        w_c = edge(a, b) * s
        eps = -1e-6
        inside = (w_a >= eps) & (w_b >= eps) & (w_c >= eps) & valid
        alpha = w_a * inv_area
        beta = w_b * inv_area
        gamma = w_c * inv_area
        uv_tri = (alpha[..., None] * uv[idx[:, 0]][None]
                  + beta[..., None] * uv[idx[:, 1]][None]
                  + gamma[..., None] * uv[idx[:, 2]][None])  # [P,C,2]
        hit = jnp.any(inside, axis=1)                        # [P]
        first = jnp.argmax(inside, axis=1)                   # [P]
        uv_hit = jnp.take_along_axis(
            uv_tri, first[:, None, None], axis=1)[:, 0, :]
        new = hit & ~found
        uv_acc = jnp.where(new[:, None], uv_hit, uv_acc)
        return (found | hit, uv_acc), None

    (found, uv_flat), _ = jax.lax.scan(
        body, (jnp.zeros(p.shape[0], bool), ident_uv), tris)
    uv_flat = jnp.where(found[:, None], uv_flat, ident_uv)
    return uv_flat.reshape(height, width, 2)


@jax.jit
def sample_uv(img: jnp.ndarray, uv_map: jnp.ndarray) -> jnp.ndarray:
    """Bilinear gather img[v*H, u*W] (cv2.remap semantics incl. x=u*W scale,
    ref: step_4/get_pixelValue.py:34-48).  img: [H,W]; uv_map: [h,w,2]."""
    h_src, w_src = img.shape
    x = uv_map[..., 0] * w_src
    y = uv_map[..., 1] * h_src
    x0 = jnp.clip(jnp.floor(x), 0, w_src - 1).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor(y), 0, h_src - 1).astype(jnp.int32)
    x1 = jnp.clip(x0 + 1, 0, w_src - 1)
    y1 = jnp.clip(y0 + 1, 0, h_src - 1)
    fx = jnp.clip(x - x0, 0.0, 1.0)
    fy = jnp.clip(y - y0, 0.0, 1.0)
    imgf = img.astype(jnp.float32)
    v00 = imgf[y0, x0]
    v01 = imgf[y0, x1]
    v10 = imgf[y1, x0]
    v11 = imgf[y1, x1]
    out = (v00 * (1 - fx) * (1 - fy) + v01 * fx * (1 - fy)
           + v10 * (1 - fx) * fy + v11 * fx * fy)
    oob = (x < 0) | (x > w_src - 1) | (y < 0) | (y > h_src - 1)
    return jnp.where(oob, 0.0, out)


def naive_transfer(hair_parsing: np.ndarray,
                   target_parsing: np.ndarray) -> np.ndarray:
    """Overlay warped hair onto target parsing; uncovered old hair -> 255
    (ref: wrap_codes/mask_adaptor.py:63-73)."""
    out = np.asarray(target_parsing).astype(np.int32).copy()
    out[out == HAIR_IDX] = UNKNOWN_LABEL
    out[np.asarray(hair_parsing) == HAIR_IDX] = HAIR_IDX
    return out


def hair_mask_transfer_warp(hair_parsing: np.ndarray,
                            face_parsing: np.ndarray,
                            hair_lm_81: np.ndarray,
                            face_lm_81: np.ndarray,
                            use_arap: bool = True,
                            out_size: int = 0) -> np.ndarray:
    """Warp the donor's hair mask onto the target face geometry
    (ref: wrap_codes/mask_adaptor.py:87-143).

    hair_lm_81 / face_lm_81: [81,2] in [0,1]. Parsings: [512,512] labels.
    Returns the composite parsing (255 where old hair uncovered) at the
    working size, or nearest-downscaled to `out_size` inside the same
    device dispatch when given.
    """
    size = hair_parsing.shape[0]
    hair_lm = np.asarray(hair_lm_81, np.float64) * size
    face_lm = np.asarray(face_lm_81, np.float64) * size

    sel = CHOSEN_LANDMARKS
    src = hair_lm[sel] + BG_PAD
    dst = face_lm[sel] + BG_PAD
    pad = BG_PAD
    big = size + 2 * pad

    verts_src, verts_dst, tris = build_warp_mesh(src, dst, big, big,
                                                 use_arap=use_arap)
    if tris.shape[0] > MAX_TRIS:
        raise RuntimeError(f'triangle budget exceeded: {tris.shape[0]}')
    tris_pad = np.full((MAX_TRIS, 3), -1, np.int32)
    tris_pad[:tris.shape[0]] = tris
    # UV normalisation is verts/size with sampling at u*size — an exact
    # round trip for the identity warp (matches the reference convention:
    # my_arap texture coords + textureSampling, get_pixelValue.py:34-35)
    uv = (verts_src / big).astype(np.float32)

    if os.environ.get('CTRLHAIR_HOST_RASTER', '1') == '1':
        # DEFAULT: native host rasterize+sample+composite (raster.cpp).
        # This op is latency-bound (~450k pixels visited once); a device
        # dispatch through the TPU relay costs hundreds of ms of
        # transfer+sync for ~10 ms of host work.  The reference also
        # rasterizes on host (Cython mesh_core + cv2.remap).
        from ctrlhair_tpu import native
        hair_np = np.asarray(hair_parsing)
        face_np = np.asarray(face_parsing)
        total_np = _pad_smear_np(hair_np, pad)
        out = native.rasterize_warp_composite(
            verts_dst, tris, (verts_src / big), total_np, face_np, pad,
            HAIR_IDX, UNKNOWN_LABEL, out_size)
        if out is not None:
            return out

    if os.environ.get('CTRLHAIR_PALLAS_RASTER', '0') == '1' \
            and jax.default_backend() not in ('cpu',):
        # alternative: the Pallas tiled rasteriser.  Measured slower end to
        # end than the XLA chunked-einsum path (11.1 vs 0.39 ms at 672px,
        # scripts/raster_timing.py) because its host-side triangle binning
        # alone costs ~8 ms — kept for study/regression, not the default.
        from ctrlhair_tpu.ops.raster_pallas import rasterize_uv_pallas
        uv_map = rasterize_uv_pallas(
            jnp.asarray(verts_dst, jnp.float32), jnp.asarray(tris_pad),
            jnp.asarray(uv), big, big)
    else:
        # pad+smear + rasterize + UV gather + threshold + crop + composite
        # overlay (naive_transfer semantics) as ONE device dispatch + ONE
        # sync.  The parsings stay device-resident (the Backend caches the
        # parse outputs on device); only the small mesh arrays upload per
        # call — re-uploading the padded 672px mask through the device
        # relay dominated the whole transfer (measured 495 ms/call).
        return np.asarray(_rasterize_composite(
            jnp.asarray(verts_dst, jnp.float32), jnp.asarray(tris_pad),
            jnp.asarray(uv), jnp.asarray(hair_parsing, jnp.int32),
            jnp.asarray(face_parsing, jnp.int32), big, pad,
            out_size=out_size))
    total = np.asarray(
        _pad_smear(jnp.asarray(hair_parsing, jnp.int32), pad))
    warped = np.asarray(sample_uv(jnp.asarray(total), uv_map))
    # the reference truncates the bilinear-sampled float mask to uint8
    # (wrap_by_uv -> astype in hair_mask_transfer_wrap), keeping only
    # pixels whose interpolated value reaches 1.0 — i.e. fully inside the
    # warped hair; >0.5 would grow the contour by ~1px vs the reference
    warped = (warped >= 1.0 - 1e-6)[pad:-pad, pad:-pad]

    out = naive_transfer(warped * HAIR_IDX, face_parsing)
    if out_size and out_size != out.shape[0] \
            and out.shape[0] % out_size == 0:
        f = out.shape[0] // out_size
        out = out[::f, ::f]
    return out


def _pad_smear_np(hair_parsing: np.ndarray, pad: int) -> np.ndarray:
    """Host twin of _pad_smear (ref: mask_adaptor.py:119-131)."""
    size = hair_parsing.shape[0]
    hair = (hair_parsing == HAIR_IDX).astype(np.float32)
    total = np.zeros((size + 2 * pad, size + 2 * pad), np.float32)
    total[pad:size + pad, pad:size + pad] = hair
    total[pad - 10:pad, :][:, total[pad, :] == 1] = 1
    total[-pad:-pad + 10, :][:, total[-1 - pad, :] == 1] = 1
    total[total[:, pad] == 1, pad - 10:pad] = 1
    total[total[:, -1 - pad] == 1, -pad:-pad + 10] = 1
    return total


def _pad_smear(hair_parsing: jnp.ndarray, pad: int) -> jnp.ndarray:
    """Pad the hair mask by `pad` and smear border-touching hair 10px
    outward (ref: mask_adaptor.py:119-131), all on device."""
    s = hair_parsing.shape[0]
    big = s + 2 * pad
    hair = (hair_parsing == HAIR_IDX).astype(jnp.float32)
    total = jnp.zeros((big, big), jnp.float32)
    total = total.at[pad:pad + s, pad:pad + s].set(hair)
    top = total[pad]
    total = total.at[pad - 10:pad, :].set(
        jnp.where(top[None, :] == 1, 1.0, total[pad - 10:pad, :]))
    bot = total[big - 1 - pad]
    total = total.at[big - pad:big - pad + 10, :].set(
        jnp.where(bot[None, :] == 1, 1.0,
                  total[big - pad:big - pad + 10, :]))
    left = total[:, pad]
    total = total.at[:, pad - 10:pad].set(
        jnp.where(left[:, None] == 1, 1.0, total[:, pad - 10:pad]))
    right = total[:, big - 1 - pad]
    total = total.at[:, big - pad:big - pad + 10].set(
        jnp.where(right[:, None] == 1, 1.0,
                  total[:, big - pad:big - pad + 10]))
    return total


@functools.partial(jax.jit, static_argnames=('size', 'pad', 'out_size'))
def _rasterize_composite(verts_dst, tris_pad, uv, hair_parsing,
                         face_parsing, size: int, pad: int,
                         out_size: int = 0):
    total = _pad_smear(hair_parsing, pad)
    uv_map = rasterize_uv(verts_dst, tris_pad, uv, size, size)
    # truncation semantics: only fully-interior pixels (value 1.0) count,
    # matching the reference's astype-uint8 of the sampled float mask
    warped = sample_uv(total, uv_map) >= 1.0 - 1e-6
    warped = warped[pad:size - pad, pad:size - pad]
    # naive_transfer (ref: mask_adaptor.py:63-73): uncovered old hair -> 255
    out = jnp.where(face_parsing == HAIR_IDX, UNKNOWN_LABEL, face_parsing)
    out = jnp.where(warped, HAIR_IDX, out)
    work = size - 2 * pad
    if out_size and out_size != work and work % out_size == 0:
        # fold the edit-size nearest downscale (cv2.INTER_NEAREST strided
        # fast path) into the same dispatch: smaller downlink, no second
        # program (ref chain resizes after warp, ui/backend.py:277)
        f = work // out_size
        out = out[::f, ::f]
    return out


def warp_for_image_with_idx(catalog, landmark_dict, hair_key: str,
                            face_key: str,
                            use_arap: bool = True) -> np.ndarray:
    """Catalogue-driven warp for preprocessed datasets
    (ref: wrap_codes/mask_adaptor.py:146-172): label maps from disk,
    landmarks from the precomputed landmark81 dict, composite parsing out.
    """
    from PIL import Image

    from ctrlhair_tpu.ops.resize import resize_nearest

    hair = np.asarray(Image.open(catalog.label_path(hair_key))).astype(
        np.int32)
    face = np.asarray(Image.open(catalog.label_path(face_key))).astype(
        np.int32)
    size = 512
    hair512 = np.asarray(resize_nearest(jnp.asarray(hair), (size, size)))
    face512 = np.asarray(resize_nearest(jnp.asarray(face), (size, size)))
    return hair_mask_transfer_warp(
        hair512, face512, np.asarray(landmark_dict[hair_key]),
        np.asarray(landmark_dict[face_key]), use_arap=use_arap)


def _crop_for_warp(img: np.ndarray, editor, crop_size: int) -> np.ndarray:
    """FFHQ-align one raw photo at `crop_size` before shape transfer
    (ref: wrap_codes/mask_adaptor.py:186-200 crops BOTH images at 1024).

    Landmarks come from the parsing-contour estimator on the raw image's
    parse (the reference uses dlib 68 on the raw image)."""
    from ctrlhair_tpu.ops.crop import recreate_aligned_image
    from ctrlhair_tpu.ops.landmarks import estimate_landmarks_68

    label512 = np.asarray(
        editor.parse(editor.params, jnp.asarray(img)[None])[0])
    lm68 = estimate_landmarks_68(label512, image=img)
    lm68_px = lm68 * np.array([img.shape[1], img.shape[0]], np.float64)
    out, _ = recreate_aligned_image(img, lm68_px, crop_size)
    return out


def warp_hair_mask_between_images(hair_img: np.ndarray,
                                  face_img: np.ndarray, editor,
                                  use_arap: bool = True,
                                  need_crop: bool = True,
                                  crop_size: int = 1024,
                                  hair_parse512: np.ndarray = None,
                                  face_parse512: np.ndarray = None,
                                  hair_lm81: np.ndarray = None,
                                  face_lm81: np.ndarray = None) -> np.ndarray:
    """End-to-end reference-shape transfer between two raw images
    (ref: wrap_codes/mask_adaptor.py:175-220).

    Mirrors the reference chain: FFHQ-align BOTH images at `crop_size`
    (skippable for pre-aligned inputs), re-parse the crops, estimate 81
    landmarks from the crop parses, warp, and return a 256x256 composite
    parsing label map.

    hair_parse512/face_parse512/hair_lm81/face_lm81: optional precomputed
    512px parses and [81,2] landmarks for aligned inputs — the Backend
    already parsed both images at set_input/set_target time, so repeated
    transfers skip the parse program and the host landmark estimation
    (the reference instead re-runs dlib + BiSeNet per transfer,
    ref: mask_adaptor.py:202-212).
    """
    from ctrlhair_tpu.ops.landmarks import estimate_landmarks_81

    if need_crop:
        hair_img = _crop_for_warp(np.asarray(hair_img), editor, crop_size)
        face_img = _crop_for_warp(np.asarray(face_img), editor, crop_size)
        # crops invalidate every cached input: parses AND landmarks were
        # estimated in the pre-crop geometry
        hair_parse512 = face_parse512 = None
        hair_lm81 = face_lm81 = None

    if hair_parse512 is None or face_parse512 is None:
        hair_img, face_img = np.asarray(hair_img), np.asarray(face_img)
        if hair_img.shape == face_img.shape:
            # one batched parse + one downlink for both images
            both = np.asarray(editor.parse(
                editor.params, jnp.stack([jnp.asarray(hair_img),
                                          jnp.asarray(face_img)])
            ).astype(jnp.uint8)).astype(np.int32)
            hair512, face512 = both[0], both[1]
        else:
            hair512 = np.asarray(
                editor.parse(editor.params, jnp.asarray(hair_img)[None])[0])
            face512 = np.asarray(
                editor.parse(editor.params, jnp.asarray(face_img)[None])[0])
    else:
        # keep the cached parses device-resident: the warp dispatch consumes
        # them directly, avoiding a readback+re-upload through the relay
        hair512 = hair_parse512
        face512 = face_parse512
    hair_lm = (estimate_landmarks_81(np.asarray(hair512),
                                     image=np.asarray(hair_img))
               if hair_lm81 is None else np.asarray(hair_lm81))
    face_lm = (estimate_landmarks_81(np.asarray(face512),
                                     image=np.asarray(face_img))
               if face_lm81 is None else np.asarray(face_lm81))
    return hair_mask_transfer_warp(hair512, face512, hair_lm, face_lm,
                                   use_arap=use_arap,
                                   out_size=editor.cfg.edit_size)
