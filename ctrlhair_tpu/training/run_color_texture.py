# Runnable color & texture branch training driver.
#
# Parity target: `python color_texture_branch/train.py -c 045` (ref:
# train.py:37-160), rebuilt without import-time argparse: dataset batches
# (or a synthetic fallback when no dataset is present), fused jitted train
# step, optional ('dp','tp') mesh, tensorboard scalars, checkpoint/resume,
# validation canvases through the frozen SEAN renderer.
#
# Usage: python -m ctrlhair_tpu.training.run_color_texture \
#            --data-root dataset_info_ctrlhair --steps 650100

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument('--data-root', default='dataset_info_ctrlhair')
    parser.add_argument('--out-dir',
                        default='model_trained/color_texture/ctrlhair_tpu')
    parser.add_argument('--steps', type=int, default=None)
    parser.add_argument('--batch-size', type=int, default=None)
    parser.add_argument('--dp', type=int, default=1,
                        help='data-parallel devices')
    parser.add_argument('--seed', type=int, default=0)
    parser.add_argument('--synthetic', action='store_true',
                        help='train on synthetic batches (smoke runs)')
    parser.add_argument('--sean-checkpoint', default=None,
                        help='reference SEAN netG .pth for the frozen-SEAN '
                             'lambda_rec_img loss (scheduled on at 600k, '
                             'ref solver.py:270-299); without it the term '
                             'stays off')
    args = parser.parse_args(argv)

    from ctrlhair_tpu.config import ColorTextureConfig
    from ctrlhair_tpu.parallel import mesh as pmesh
    from ctrlhair_tpu.training.color_texture_trainer import (
        ColorTextureTrainer, synthetic_batch)
    from ctrlhair_tpu.training.loop import run_training

    cfg = ColorTextureConfig()
    total_steps = args.steps or cfg.total_step
    batch_size = args.batch_size or cfg.total_batch_size
    sean = sean_params = None
    if args.sean_checkpoint and os.path.exists(args.sean_checkpoint):
        import torch
        import jax.numpy as jnp
        from ctrlhair_tpu.config import SEANConfig
        from ctrlhair_tpu.convert import torch_import as ti
        from ctrlhair_tpu.models.sean import SEAN
        scfg = SEANConfig()
        sd = torch.load(args.sean_checkpoint, map_location='cpu',
                        weights_only=False)
        if hasattr(sd, 'state_dict'):
            sd = sd.state_dict()
        sean_params = jax.tree_util.tree_map(jnp.asarray, ti.convert_sean(
            ti.strip_ddp_prefix(sd), ngf=scfg.ngf,
            semantic_nc=scfg.semantic_nc, style_dim=scfg.style_dim))
        sean = SEAN(scfg)
        print('[run_color_texture] frozen SEAN loaded: lambda_rec_img '
              'active per schedule')
    elif cfg.lambda_rec_img:
        print('[run_color_texture] NOTE: no --sean-checkpoint — the '
              'scheduled lambda_rec_img term (on at 600k in the reference) '
              'stays OFF', flush=True)
    trainer = ColorTextureTrainer(cfg, sean=sean, sean_params=sean_params)
    rng = jax.random.PRNGKey(args.seed)
    state, predictor_params = trainer.init_state(rng)

    dataset = None
    if not args.synthetic and os.path.isdir(args.data_root):
        try:
            from ctrlhair_tpu.data.color_texture_dataset import (
                ColorTextureDataset)
            dataset = ColorTextureDataset(cfg, args.data_root)
            if not dataset.train_keys:
                dataset = None
        except Exception as exc:
            print(f'[run_color_texture] dataset unavailable ({exc}); '
                  'falling back to synthetic batches')

    host_rng = np.random.default_rng(args.seed)

    def batch_fn(step):
        if dataset is not None:
            batch = dataset.training_batch(batch_size)
            batch.pop('items', None)
            return {k: jnp.asarray(v) for k, v in batch.items()}
        return synthetic_batch(jax.random.PRNGKey(
            int(host_rng.integers(2 ** 31))), cfg, batch_size)

    mesh = None
    if args.dp > 1:
        mesh = pmesh.make_mesh(args.dp, tp=1)
        state = jax.device_put(state, pmesh.replicated(mesh))
        predictor_params = jax.device_put(predictor_params,
                                          pmesh.replicated(mesh))
        inner = batch_fn
        batch_fn = lambda step: pmesh.shard_batch(inner(step), mesh)

    import contextlib
    ctx = mesh if mesh is not None else contextlib.nullcontext()
    with ctx:
        state, metrics = run_training(
            state, trainer.train_step, batch_fn, total_steps,
            rng=jax.random.PRNGKey(args.seed + 1),
            step_args=lambda: (predictor_params,),
            log_dir=os.path.join(args.out_dir, 'logs'),
            ckpt_dir=os.path.join(args.out_dir, 'checkpoints'),
            model_save_step=20000, sample_step=25000, tag='color_texture')
    print('[run_color_texture] done:',
          {k: float(np.asarray(v)) for k, v in metrics.items()
           if np.asarray(v).size == 1})
    return state


if __name__ == '__main__':
    main()
