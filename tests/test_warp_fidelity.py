# Warp fidelity vs the reference's quality mesh (VERDICT r1 item 8).
#
# The reference triangulates with Berkeley `triangle -q30`
# (ref: wrap_codes/wrap_triangle/step_3/generate_node.py:23-93); its ARAP
# binary (my_arap) is the repo's one missing blob, so the comparable contract
# is the MESH: run the reference's exact .node/boundary contract through the
# shipped `triangle` binary, deform THEIR mesh with our native ARAP, rasterise
# with our rasteriser, and compare the warped hair mask against our full
# scipy-Delaunay+Steiner chain.  Gate: warped-mask IoU >= 0.98.
import os
import shutil
import subprocess

import numpy as np
import pytest

import jax.numpy as jnp

TRIANGLE_BIN = ('/root/reference/wrap_codes/wrap_triangle/step_3/'
                'triangle_berkeley/triangle')

pytestmark = pytest.mark.skipif(not os.path.exists(TRIANGLE_BIN),
                                reason='reference triangle binary absent')


def _write_node_file(path, landmarks, width, height, num_points=50):
    """The reference's .node contract (generate_node.py:40-73): landmarks
    (marker 1, attr 0) then top/bottom/left/right boundary (marker 1,
    attr 1)."""
    xs = np.linspace(0, width - 1, num_points)
    ys = np.linspace(0, height - 1, num_points)
    rows = [(x, y, 0) for x, y in landmarks]
    rows += [(x, 0.0, 1) for x in xs]
    rows += [(x, height - 1.0, 1) for x in xs]
    rows += [(0.0, y, 1) for y in ys[1:-1]]
    rows += [(width - 1.0, y, 1) for y in ys[1:-1]]
    with open(path, 'w') as f:
        f.write(f'{len(rows)} 2 1 1\n')
        for i, (x, y, attr) in enumerate(rows):
            f.write(f'{i + 1} {x:.8f} {y:.8f} 1 {attr}\n')
    return len(rows)


def _load_node_rows(path):
    rows = []
    with open(path) as f:
        next(f)
        for line in f:
            t = line.strip().split()
            if t and t[0] != '#':
                rows.append([float(v) for v in t[1:]])
    return rows


def _reference_mesh(landmarks, width, height, tmp_path):
    """verts [V,2], tris [T,3] from the reference triangle -q30 pipeline."""
    exe = str(tmp_path / 'triangle')
    shutil.copy(TRIANGLE_BIN, exe)
    os.chmod(exe, 0o755)
    node = str(tmp_path / 'mesh.node')
    _write_node_file(node, landmarks, width, height)
    subprocess.run([exe, '-q30', str(tmp_path / 'mesh')], check=True,
                   capture_output=True)
    verts = np.array([r[:2] for r in
                      _load_node_rows(str(tmp_path / 'mesh.1.node'))])
    tris = np.array([[int(v) - 1 for v in r[:3]] for r in
                     _load_node_rows(str(tmp_path / 'mesh.1.ele'))],
                    np.int32)
    return verts, tris


def _warp_mask_with_mesh(hair_mask, verts_src, verts_dst, tris):
    from ctrlhair_tpu.ops.warp import rasterize_uv, sample_uv

    size = hair_mask.shape[0]
    t_pad = max(2048, tris.shape[0])
    tris_pad = np.full((t_pad, 3), -1, np.int32)
    tris_pad[:tris.shape[0]] = tris
    uv = (verts_src / size).astype(np.float32)
    uv_map = rasterize_uv(jnp.asarray(verts_dst, jnp.float32),
                          jnp.asarray(tris_pad), jnp.asarray(uv),
                          size, size)
    warped = np.asarray(sample_uv(jnp.asarray(hair_mask, jnp.float32),
                                  uv_map))
    return warped > 0.5


def _min_angle_deg(verts, tris):
    a, b, c = verts[tris[:, 0]], verts[tris[:, 1]], verts[tris[:, 2]]
    def ang(p, q, r):
        u, v = q - p, r - p
        cosv = (u * v).sum(1) / np.maximum(
            np.linalg.norm(u, axis=1) * np.linalg.norm(v, axis=1), 1e-12)
        return np.degrees(np.arccos(np.clip(cosv, -1, 1)))
    return np.minimum.reduce([ang(a, b, c), ang(b, c, a), ang(c, a, b)])


def test_warped_mask_iou_vs_reference_mesh(tmp_path):
    from ctrlhair_tpu.native import arap_solve
    from ctrlhair_tpu.ops.landmarks import contour_landmarks_81
    from ctrlhair_tpu.ops.warp import (BG_PAD, CHOSEN_LANDMARKS,
                                       build_warp_mesh, boundary_nodes)
    from ctrlhair_tpu.constants import HAIR_IDX
    from test_landmarks import synthetic_face

    donor, _ = synthetic_face(size=512, cx=0.44, cy=0.50)
    target, _ = synthetic_face(size=512, cx=0.56, cy=0.55)
    lm_d = contour_landmarks_81(donor)[CHOSEN_LANDMARKS] * 512
    lm_t = contour_landmarks_81(target)[CHOSEN_LANDMARKS] * 512

    pad = BG_PAD
    big = 512 + 2 * pad
    hair = np.zeros((big, big), np.float32)
    hair[pad:-pad, pad:-pad] = (donor == HAIR_IDX)
    src = lm_d + pad
    dst = lm_t + pad

    # --- reference mesh (triangle -q30, exact .node contract)
    ref_verts, ref_tris = _reference_mesh(src, big, big, tmp_path)
    # quality contract: -q30 guarantees min angle >= ~30deg (modulo
    # boundary-constrained corners)
    angles = _min_angle_deg(ref_verts, ref_tris)
    assert np.percentile(angles, 5) > 25.0

    n_con = len(src) + 4 * 50 - 4
    boundary = boundary_nodes(big, big)
    con_dst = np.concatenate([dst, boundary])
    assert np.allclose(ref_verts[len(src):n_con], boundary, atol=1e-3)
    ref_dst = arap_solve(ref_verts, ref_tris, np.arange(n_con), con_dst)
    assert ref_dst is not None, 'native ARAP unavailable'
    mask_ref = _warp_mask_with_mesh(hair, ref_verts, ref_dst, ref_tris)

    # --- our chain (scipy Delaunay + Steiner + native ARAP)
    our_src, our_dst, our_tris = build_warp_mesh(src, dst, big, big,
                                                 use_arap=True)
    mask_ours = _warp_mask_with_mesh(hair, our_src, our_dst, our_tris)

    inter = (mask_ref & mask_ours).sum()
    union = (mask_ref | mask_ours).sum()
    iou = inter / max(union, 1)
    assert union > 1000
    assert iou >= 0.98, f'warped-mask IoU {iou:.4f} vs reference mesh'

    # --- ARAP-independent cross-check (VERDICT r2 item 10): deform the
    # reference mesh's free (Steiner) vertices piecewise-affinely instead of
    # with ARAP.  Our ARAP sits on BOTH sides of the gate above, so a shared
    # ARAP bias would cancel there; agreement with a non-ARAP deformation of
    # the reference mesh bounds that bias.
    from ctrlhair_tpu.ops.warp import piecewise_affine_free_verts
    free = np.arange(n_con, len(ref_verts))
    ref_dst_affine = ref_verts.copy()
    ref_dst_affine[:n_con] = con_dst
    if len(free):
        ref_dst_affine[free] = piecewise_affine_free_verts(
            ref_verts[free], ref_verts[:n_con], con_dst)
    mask_affine = _warp_mask_with_mesh(hair, ref_verts, ref_dst_affine,
                                       ref_tris)
    iou_affine = (mask_affine & mask_ours).sum() / max(
        (mask_affine | mask_ours).sum(), 1)
    iou_arap_vs_affine = (mask_affine & mask_ref).sum() / max(
        (mask_affine | mask_ref).sum(), 1)
    print(f'warp-fidelity IoUs: ref-ARAP vs ours {iou:.4f}, '
          f'ref-affine vs ours {iou_affine:.4f}, '
          f'ref-ARAP vs ref-affine {iou_arap_vs_affine:.4f}')
    # All three deformations share the SAME constrained vertices
    # (landmarks + boundary); they differ only in how Steiner interiors
    # move (ARAP rigidity vs affine interpolation — measured legitimate
    # spread ~0.92).  A biased/broken ARAP would push both ARAP masks far
    # from the affine one; bound that divergence absolutely, and require
    # our full chain to sit no further from the affine reference than the
    # reference-mesh ARAP does (within mesh-difference noise).
    assert iou_arap_vs_affine >= 0.88, \
        f'ARAP diverges from affine interiors: {iou_arap_vs_affine:.4f}'
    assert iou_affine >= iou_arap_vs_affine - 0.03, \
        (f'our chain further from the affine reference '
         f'({iou_affine:.4f}) than ARAP rigidity explains '
         f'({iou_arap_vs_affine:.4f})')
