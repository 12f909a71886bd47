# The COMPLETE reference workflow, end to end, on real images:
#   L0 data prep (masks, SEAN codes, colour stats, PCA variance, landmarks,
#   median style codes) over the reference's 50 sample images
#   -> color_texture GAN training on the prepped pickles (real data)
#   -> native checkpoint loading back into the editing pipeline
#   -> a colour/texture transfer edit rendered with the trained branch.
# (ref chain: README.md:72-93 scripts -> train.py -> hair_editor.py loads)
#
# Usage: python scripts/e2e_workflow.py [workdir] [steps]
import os
import pickle
import shutil
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    work = sys.argv[1] if len(sys.argv) > 1 else '/tmp/ctrlhair_e2e'
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    t00 = time.time()

    def stamp(msg):
        print(f'[{time.time() - t00:7.1f}s] {msg}', flush=True)

    import jax
    from ctrlhair_tpu.config import PipelineConfig
    from ctrlhair_tpu.data import prep
    from ctrlhair_tpu.data.catalog import DataCatalog
    from ctrlhair_tpu.pipeline.editor import HairEditorTPU

    # ---- stage the reference images into the dataset layout contract
    src_dir = '/root/reference/imgs'
    names = sorted(f for f in os.listdir(src_dir) if f.endswith('.png'))
    datasets = set()
    for f in names:
        ds, name = f.split('___', 1)
        datasets.add(ds)
        dst = os.path.join(work, ds, 'images_256')
        os.makedirs(dst, exist_ok=True)
        shutil.copy(os.path.join(src_dir, f), os.path.join(dst, name))
    datasets = sorted(datasets)
    stamp(f'staged {len(names)} images into {datasets}')

    editor = HairEditorTPU(PipelineConfig(), seed=0)
    stamp('editor initialised')

    # ---- L0 prep chain (ref: dataset_scripts/)
    for ds in datasets:
        n = prep.compute_masks(
            editor, os.path.join(work, ds, 'images_256'),
            os.path.join(work, ds, 'label'), batch_size=8)
        stamp(f'masks[{ds}]: {n}')
    catalog = DataCatalog(work, datasets, filter_female_and_frontal=False)
    stamp(f'catalog: {len(catalog.items)} valid items '
          f'({len(catalog.train_items)} train)')
    codes = prep.compute_sean_codes(
        editor, catalog, os.path.join(work, 'sean_code_dict.pkl'),
        batch_size=8)
    stamp(f'sean codes: {len(codes)}')
    prep.compute_color_stats(
        catalog, os.path.join(work, 'rgb_stat_dict.pkl'),
        os.path.join(work, 'hsv_stat_dict_ordered.pkl'))
    prep.compute_color_variance(
        catalog, os.path.join(work, 'color_var_stat_dict.pkl'))
    prep.compute_landmarks(editor, catalog,
                           os.path.join(work, 'landmark81.pkl'))
    prep.compute_mean_style_codes(codes, os.path.join(work,
                                                      'mean_style_code'))
    stamp('colour stats + variance + landmarks + median style codes done')

    # ---- train the color_texture branch on the REAL prepped data
    from ctrlhair_tpu.training import run_color_texture
    state = run_color_texture.main([
        '--data-root', work, '--steps', str(steps),
        '--out-dir', os.path.join(work, 'model_trained', 'color_texture')])
    stamp(f'color_texture trained {int(state.step)} steps on real data')

    # ---- load the native checkpoint back into the pipeline and edit
    from ctrlhair_tpu.convert.load import load_native_params
    from ctrlhair_tpu.pipeline.backend import Backend
    from ctrlhair_tpu.utils.image import read_rgb, write_rgb
    load_native_params(editor, color_texture_dir=os.path.join(
        work, 'model_trained', 'color_texture', 'checkpoints'))
    editor.load_style_fallback(os.path.join(work, 'mean_style_code',
                                            'median'))
    with open(os.path.join(work, 'hsv_stat_dict_ordered.pkl'), 'rb') as f:
        hsv_table = pickle.load(f)
    be = Backend(blending=True, cfg=editor.cfg, editor=editor,
                 hsv_table=hsv_table)
    be.set_input_img(read_rgb(os.path.join(src_dir, names[0])))
    be.set_target_img(read_rgb(os.path.join(src_dir, names[-1])))
    be.transfer_latent_representation('color')
    be.transfer_latent_representation('texture')
    be.change_color(1.0, 2)
    out = be.output(be.cur_latent)
    write_rgb(os.path.join(work, 'edited.png'), out)
    stamp(f'edit rendered with the trained branch -> {work}/edited.png')
    assert out.shape == (256, 256, 3)
    print('E2E WORKFLOW PASS', flush=True)


if __name__ == '__main__':
    main()
