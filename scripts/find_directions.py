# Semantic-direction curation driver (ref: the two script_find_direction.py
# drivers, color_texture_branch/script_find_direction.py:27-74).
#
# Renders sweep grids for N random orthogonal candidate directions so an
# operator can pick the ones that read as "length", "volume", "bangs", ...
# and save them in the slider-loading contract (sorted <idx>.pkl files,
# ref: hair_editor.py:84-119).
#
# Usage:
#   python scripts/find_directions.py --att shape --input face.png \
#       --out-dir /tmp/shape_candidates --n 20
#   # inspect /tmp/shape_candidates/candidate_*.png, then:
#   python scripts/find_directions.py --att shape --choose 7 --index 0 \
#       --input face.png --out-dir /tmp/shape_candidates \
#       --save-dir model_trained/shape_dir_used
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument('--att', choices=['shape', 'texture'], required=True)
    p.add_argument('--input', required=True, help='aligned face image')
    p.add_argument('--out-dir', required=True)
    p.add_argument('--n', type=int, default=20)
    p.add_argument('--seed', type=int, default=0)
    p.add_argument('--choose', type=int, default=None,
                   help='candidate index to persist (after inspection)')
    p.add_argument('--index', type=int, default=0,
                   help='slider slot to save the chosen direction under')
    p.add_argument('--save-dir', default=None,
                   help='directions dir (default model_trained/<att>_dir_used)')
    p.add_argument('--auto', action='store_true',
                   help='metric-scored curation: fill EVERY slider slot '
                        'and write a score report (no operator in the loop)')
    p.add_argument('--pool-dir', default=None,
                   help='shape only: warp-pool label dir; regress the '
                        'pool latents on mask geometry and ship the '
                        'regression directions (strongest method — random '
                        'probes can all miss the decoder\'s responsive '
                        'subspace)')
    p.add_argument('--trained-root', default=None,
                   help='model_trained root with <family>/checkpoints dirs '
                        '(e.g. a train_soak workdir) to load before curating')
    args = p.parse_args(argv)

    from ctrlhair_tpu.pipeline.backend import Backend
    from ctrlhair_tpu.pipeline.direction_finder import (
        auto_curate, render_candidate_grids, save_direction)
    from ctrlhair_tpu.utils.image import read_rgb

    backend = Backend(blending=False)
    if args.trained_root:
        from ctrlhair_tpu.convert.load import load_trained_root
        load_trained_root(backend.editor, args.trained_root)
        print(f'loaded trained checkpoints from {args.trained_root}',
              flush=True)
    backend.set_input_img(backend.crop_face(read_rgb(args.input)))

    if args.pool_dir:
        if args.att != 'shape':
            p.error('--pool-dir applies to --att shape only')
        from ctrlhair_tpu.pipeline.direction_finder import (
            data_driven_shape_directions)
        save_dir = args.save_dir or os.path.join(
            'model_trained', 'shape_dir_used')
        os.makedirs(args.out_dir, exist_ok=True)
        dirs_, report = data_driven_shape_directions(
            backend.editor, backend.editor.params, args.pool_dir,
            save_dir=save_dir,
            report_path=os.path.join(args.out_dir,
                                     'shape_dir_regression.json'))
        for i, r in enumerate(report):
            print(f"slot {i} ({r['label']}): r2 {r['r2']:.3f} over "
                  f"{r['n_masks']} masks", flush=True)
        _render_chosen_grids(backend, 'shape', dirs_, args.out_dir)
        print(f'{len(dirs_)} directions shipped to {save_dir}', flush=True)
        return

    if args.auto:
        save_dir = args.save_dir or os.path.join(
            'model_trained', f'{args.att}_dir_used')
        os.makedirs(args.out_dir, exist_ok=True)
        dirs_, report = auto_curate(
            backend, args.att, n_candidates=args.n, seed=args.seed,
            save_dir=save_dir,
            report_path=os.path.join(args.out_dir,
                                     f'{args.att}_curation.json'))
        for r in report:
            print(f"slot {r['slot']} ({r['label']}): candidate "
                  f"{r['candidate']} slope {r['slope']:+.5f} "
                  f"score {r['score']:.2f}", flush=True)
        # sweep grid per shipped slot for visual audit
        _render_chosen_grids(backend, args.att, dirs_, args.out_dir)
        print(f'{len(dirs_)} directions shipped to {save_dir}', flush=True)
        return

    candidates = render_candidate_grids(
        backend, args.att, args.out_dir, n_candidates=args.n,
        seed=args.seed)
    print(f'{len(candidates)} candidate grids in {args.out_dir}', flush=True)

    if args.choose is not None:
        save_dir = args.save_dir or os.path.join(
            'model_trained', f'{args.att}_dir_used')
        save_direction(save_dir, args.index, candidates[args.choose])
        print(f'saved candidate {args.choose} as slot {args.index} '
              f'in {save_dir}', flush=True)


def _render_chosen_grids(backend, att_name, directions, out_dir,
                         values=(-2.0, -1.0, 0.0, 1.0, 2.0)):
    from ctrlhair_tpu.pipeline.direction_finder import (
        render_candidate_grids)
    render_candidate_grids(backend, att_name, out_dir, values=values,
                           directions=directions,
                           name_fmt=f'slot_{{i}}_{att_name}.png')


if __name__ == '__main__':
    main()
