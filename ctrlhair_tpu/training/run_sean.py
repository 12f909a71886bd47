# Runnable SEAN pix2pix training driver.
#
# Parity target: the reference's vendored SEAN training path
# (ref: sean_codes/trainers/pix2pix_trainer.py:10-41 + train loop), rebuilt
# on the fused jitted G/D step with TTUR, sync-BN generator, spectral norm
# and optional VGG perceptual loss; tensorboard, checkpoint/resume, dp.
#
# Usage: python -m ctrlhair_tpu.training.run_sean --image-dir ... --label-dir ...

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument('--image-dir', default='dataset_info_ctrlhair/images_256')
    parser.add_argument('--label-dir', default='dataset_info_ctrlhair/label')
    parser.add_argument('--out-dir', default='model_trained/sean/ctrlhair_tpu')
    parser.add_argument('--steps', type=int, default=50000)
    parser.add_argument('--batch-size', type=int, default=4)
    parser.add_argument('--dp', type=int, default=1)
    parser.add_argument('--seed', type=int, default=0)
    parser.add_argument('--no-vgg', action='store_true',
                        help='drop the VGG perceptual term')
    parser.add_argument('--vgg-weights', default=None,
                        help='torch .pth of torchvision vgg19().features '
                             'state dict (pretrained) for the perceptual '
                             'loss')
    parser.add_argument('--crop-size', type=int, default=None)
    parser.add_argument('--ngf', type=int, default=None,
                        help='generator width override (tests/debug)')
    parser.add_argument('--split-step', action='store_true',
                        help='two half-size G/D programs instead of the '
                             'fused step: much cheaper to compile where '
                             'the compile service is the bottleneck')
    parser.add_argument('--synthetic', action='store_true')
    args = parser.parse_args(argv)

    from ctrlhair_tpu.config import SEANConfig
    from ctrlhair_tpu.parallel import mesh as pmesh
    from ctrlhair_tpu.training.loop import run_training
    from ctrlhair_tpu.training.sean_trainer import SEANTrainer

    overrides = {}
    if args.crop_size is not None:
        overrides['crop_size'] = args.crop_size
    if args.ngf is not None:
        overrides.update(ngf=args.ngf, zencoder_ngf=args.ngf,
                         style_dim=max(4 * args.ngf, 16))
    cfg = SEANConfig(**overrides)
    vgg_params = None
    if args.vgg_weights and not args.no_vgg:
        import torch
        from ctrlhair_tpu.models.sean_discriminator import convert_vgg19
        sd = torch.load(args.vgg_weights, map_location='cpu',
                        weights_only=False)
        if hasattr(sd, 'state_dict'):
            sd = sd.state_dict()
        vgg_params = jax.tree_util.tree_map(jnp.asarray, convert_vgg19(sd))
        print('[run_sean] loaded pretrained VGG19 features for the '
              'perceptual loss')
    elif not args.no_vgg:
        print('[run_sean] WARNING: no --vgg-weights given — the perceptual '
              'loss will use RANDOM VGG19 features, which is NOT the '
              'reference objective (pass --vgg-weights vgg19_features.pth, '
              'or --no-vgg to drop the term)', flush=True)
    trainer = SEANTrainer(cfg, use_vgg=not args.no_vgg,
                          vgg_params=vgg_params,
                          split_step=args.split_step)
    state = trainer.init_state(jax.random.PRNGKey(args.seed))

    dataset = None
    if not args.synthetic:
        from ctrlhair_tpu.data.sean_dataset import SEANDataset
        try:
            dataset = SEANDataset(args.image_dir, args.label_dir,
                                  crop_size=cfg.crop_size, seed=args.seed)
            if len(dataset) == 0:
                dataset = None
        except Exception as exc:
            print(f'[run_sean] dataset unavailable ({exc}); synthetic')
    if dataset is None and not args.synthetic:
        print('[run_sean] no paired data found; using synthetic batches')

    host_rng = np.random.default_rng(args.seed)
    s = cfg.crop_size

    def batch_fn(step):
        if dataset is not None:
            batch = dataset.batch(args.batch_size)
            if batch is not None:
                return {k: jnp.asarray(v) for k, v in batch.items()}
        return {
            'image': jnp.asarray(host_rng.uniform(
                -1, 1, (args.batch_size, s, s, 3)), jnp.float32),
            'label': jnp.asarray(host_rng.integers(
                0, cfg.semantic_nc, (args.batch_size, s, s)), jnp.int32),
        }

    if args.dp > 1:
        mesh = pmesh.make_mesh(args.dp, tp=1)
        state = jax.device_put(state, pmesh.replicated(mesh))
        inner = batch_fn
        batch_fn = lambda step: pmesh.shard_batch(inner(step), mesh)
        ctx = mesh
    else:
        import contextlib
        ctx = contextlib.nullcontext()

    with ctx:
        state, metrics = run_training(
            state, trainer.train_step, batch_fn, args.steps,
            rng=jax.random.PRNGKey(args.seed + 1),
            log_dir=os.path.join(args.out_dir, 'summaries'),
            ckpt_dir=os.path.join(args.out_dir, 'checkpoints'),
            model_save_step=10000, sample_step=10000, max_keep=1,
            tag='sean')
    print('[run_sean] done:',
          {k: float(np.asarray(v)) for k, v in metrics.items()
           if np.asarray(v).size == 1})
    return state


if __name__ == '__main__':
    main()
