# Render demonstration artefacts from the in-repo sample images on the real
# chip: parsed masks, colour-slider sweeps, texture samples, and a transfer
# matrix.  (Weights are randomly initialised unless checkpoints are
# converted or CTRLHAIR_TRAINED_ROOT points at a model_trained tree — e.g.
# a train_soak workdir — so outputs demonstrate the pipeline, and trained
# quality when trained checkpoints are given.)
# Usage: [CTRLHAIR_TRAINED_ROOT=dir] python scripts/make_samples.py \
#            [out_dir] [n_images]
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else 'samples'
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    os.makedirs(out_dir, exist_ok=True)

    from ctrlhair_tpu.pipeline.backend import Backend
    from ctrlhair_tpu.training.validation import transfer_matrix_canvas
    from ctrlhair_tpu.utils.image import (Canvas, mask_to_rgb, read_rgb,
                                          write_rgb)

    img_root = '/root/reference/imgs'
    files = sorted(f for f in os.listdir(img_root)
                   if f.endswith('.png'))[:n]
    imgs = [read_rgb(os.path.join(img_root, f)) for f in files]

    be = Backend(maximum_value_fe=2.5, blending=True)
    trained_root = os.environ.get('CTRLHAIR_TRAINED_ROOT')
    if trained_root:
        from ctrlhair_tpu.convert.load import load_trained_root
        load_trained_root(be.editor, trained_root)
        print(f'[make_samples] loaded trained checkpoints from '
              f'{trained_root}', flush=True)
    img0, mask_rgb = be.set_input_img(imgs[0])
    write_rgb(os.path.join(out_dir, 'input.png'), img0)
    write_rgb(os.path.join(out_dir, 'parsed_mask.png'),
              mask_to_rgb(be.input_mask, draw_type=0))
    write_rgb(os.path.join(out_dir, 'regen_mask.png'), mask_rgb)

    # colour sweep (brightness slider)
    canvas = Canvas(1, 5, cell=256)
    for i, v in enumerate((-2.0, -1.0, 0.0, 1.0, 2.0)):
        be.change_color(v, 2)
        canvas.paste(0, i, be.output())
    canvas.save(os.path.join(out_dir, 'color_sweep.png'))

    # random texture sweep (batched)
    grid = be.random_texture_sweep(5)
    canvas = Canvas(1, 5, cell=256)
    for i in range(5):
        canvas.paste(0, i, grid[i])
    canvas.save(os.path.join(out_dir, 'texture_samples.png'))

    if len(imgs) > 1:
        be.set_target_img(imgs[1])
        be.transfer_latent_representation('color')
        be.transfer_latent_representation('texture')
        write_rgb(os.path.join(out_dir, 'transfer_color_texture.png'),
                  be.output())
        be.transfer_latent_representation('shape')
        write_rgb(os.path.join(out_dir, 'transfer_shape.png'), be.output())
        transfer_matrix_canvas(
            be.editor, imgs[:min(n, 3)],
            out_path=os.path.join(out_dir, 'transfer_matrix.png'))
    print(f'[make_samples] wrote artefacts to {out_dir}/')


if __name__ == '__main__':
    main()
