# Config-3 (reference shape transfer) stage breakdown on the real chip.
#
# Prints per-stage times for the full chain the Backend runs per transfer:
#   landmarks (host, cached after first) | mesh build (Delaunay+Steiner) |
#   ARAP solve (native C++) | rasterize+composite dispatch+sync |
#   shape encode | fused decode+render+blend output | total
# plus the end-to-end Backend.transfer+output loop the bench measures.
# Ref anchor: the subprocess chain this replaces
# (wrap_codes/mask_adaptor.py:175-220).
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
    from ctrlhair_tpu.pipeline.backend import Backend
    from ctrlhair_tpu.pipeline.editor import HairEditorTPU
    from ctrlhair_tpu.utils.image import read_rgb

    cfg = PipelineConfig()
    editor = HairEditorTPU(cfg, seed=0)
    be = Backend(blending=True, cfg=cfg, editor=editor)

    root = '/root/reference/imgs'
    files = sorted(f for f in os.listdir(root) if f.endswith('.png'))
    be.set_input_img(read_rgb(os.path.join(root, files[-1])))
    be.set_target_img(read_rgb(os.path.join(root, files[0])))

    # warm every program involved
    be.transfer_latent_representation('shape')
    jax.block_until_ready(be.output(be.cur_latent))

    reps = 10

    # --- end-to-end (what bench config 3 measures)
    t0 = time.time()
    for _ in range(reps):
        be.transfer_latent_representation('shape')
        be.output(be.cur_latent)
    e2e_ms = (time.time() - t0) / reps * 1000
    print(f'e2e transfer+output: {e2e_ms:.1f} ms', flush=True)

    # --- stage breakdown
    from ctrlhair_tpu.ops import warp as W
    from ctrlhair_tpu.ops.landmarks import estimate_landmarks_81

    hair512 = np.asarray(be._parse512['target'])
    face512 = np.asarray(be._parse512['input'])

    t0 = time.time()
    for _ in range(reps):
        lm_h = estimate_landmarks_81(hair512)
        lm_f = estimate_landmarks_81(face512)
    print(f'landmarks (2 imgs, host, cached in Backend): '
          f'{(time.time() - t0) / reps * 1000:.1f} ms', flush=True)

    size = hair512.shape[0]
    pad = W.BG_PAD
    big = size + 2 * pad
    src = lm_h[W.CHOSEN_LANDMARKS] * size + pad
    dst = lm_f[W.CHOSEN_LANDMARKS] * size + pad

    t0 = time.time()
    for _ in range(reps):
        verts_src, verts_dst, tris = W.build_warp_mesh(
            src, dst, big, big, use_arap=False)
    print(f'mesh build (Delaunay+Steiner+affine): '
          f'{(time.time() - t0) / reps * 1000:.1f} ms', flush=True)

    t0 = time.time()
    for _ in range(reps):
        W.build_warp_mesh(src, dst, big, big, use_arap=True)
    arap_ms = (time.time() - t0) / reps * 1000
    print(f'mesh build + native ARAP: {arap_ms:.1f} ms '
          f'({len(verts_src)} verts, {len(tris)} tris)', flush=True)

    from ctrlhair_tpu import native
    total_np = W._pad_smear_np(hair512, pad)
    uv = (verts_src / big)
    native.rasterize_warp_composite(verts_dst, tris, uv, total_np,
                                    face512, pad, 13, 255, cfg.edit_size)
    t0 = time.time()
    for _ in range(reps):
        native.rasterize_warp_composite(verts_dst, tris, uv, total_np,
                                        face512, pad, 13, 255,
                                        cfg.edit_size)
    print(f'native rasterize+sample+composite (host): '
          f'{(time.time() - t0) / reps * 1000:.1f} ms', flush=True)

    args = (jnp.asarray(verts_dst, jnp.float32),
            jnp.asarray(np.pad(tris, ((0, W.MAX_TRIS - len(tris)), (0, 0)),
                               constant_values=-1)),
            jnp.asarray(uv, jnp.float32),
            jnp.asarray(hair512, jnp.int32),
            jnp.asarray(face512, jnp.int32))
    np.asarray(W._rasterize_composite(*args, big, pad,
                                      out_size=cfg.edit_size))
    t0 = time.time()
    for _ in range(reps):
        np.asarray(W._rasterize_composite(*args, big, pad,
                                          out_size=cfg.edit_size))
    print(f'device rasterize+composite FALLBACK (dispatch+sync): '
          f'{(time.time() - t0) / reps * 1000:.1f} ms', flush=True)

    wt = W.warp_hair_mask_between_images(
        be.target_img, be.input_img, editor=editor, need_crop=False,
        hair_parse512=hair512, face_parse512=face512,
        hair_lm81=lm_h, face_lm81=lm_f)
    t0 = time.time()
    for _ in range(reps):
        W.warp_hair_mask_between_images(
            be.target_img, be.input_img, editor=editor, need_crop=False,
            hair_parse512=hair512, face_parse512=face512,
            hair_lm81=lm_h, face_lm81=lm_f)
    print(f'warp total (cached parse+landmarks): '
          f'{(time.time() - t0) / reps * 1000:.1f} ms', flush=True)

    wt_j = jnp.asarray(wt, jnp.int32)[None]
    jax.block_until_ready(editor.encode_shape(editor.params, wt_j))
    t0 = time.time()
    for _ in range(reps):
        sc, fc = editor.encode_shape(editor.params, wt_j)
    jax.block_until_ready(sc)
    print(f'shape encode: {(time.time() - t0) / reps * 1000:.1f} ms',
          flush=True)

    lat = be.cur_latent
    jax.block_until_ready(be.output(lat))
    t0 = time.time()
    for _ in range(reps):
        out = be.output(lat)
    print(f'fused decode+render+blend output (incl readback): '
          f'{(time.time() - t0) / reps * 1000:.1f} ms', flush=True)


if __name__ == '__main__':
    main()
