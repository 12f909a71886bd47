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
    args = p.parse_args(argv)

    from ctrlhair_tpu.pipeline.backend import Backend
    from ctrlhair_tpu.pipeline.direction_finder import (
        render_candidate_grids, save_direction)
    from ctrlhair_tpu.utils.image import read_rgb

    backend = Backend(blending=False)
    backend.set_input_img(backend.crop_face(read_rgb(args.input)))
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


if __name__ == '__main__':
    main()
