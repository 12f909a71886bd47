# Runnable BiSeNet face-parser training driver.
#
# Parity target: the reference's vendored face-parsing training
# (ref: external_code/face_parsing/train.py — OHEM cross-entropy over main
# + two aux heads), rebuilt on the fused jitted step with sync-BN over dp;
# tensorboard, checkpoint/resume.
#
# Usage: python -m ctrlhair_tpu.training.run_bisenet --image-dir ... --label-dir ...

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
    parser.add_argument('--out-dir',
                        default='model_trained/bisenet/ctrlhair_tpu')
    parser.add_argument('--steps', type=int, default=80000)
    parser.add_argument('--batch-size', type=int, default=16)
    parser.add_argument('--dp', type=int, default=1)
    parser.add_argument('--seed', type=int, default=0)
    parser.add_argument('--input-size', type=int, default=None)
    parser.add_argument('--synthetic', action='store_true')
    args = parser.parse_args(argv)

    from ctrlhair_tpu.config import BiSeNetConfig
    from ctrlhair_tpu.models.bisenet import normalize_imagenet
    from ctrlhair_tpu.parallel import mesh as pmesh
    from ctrlhair_tpu.training.bisenet_trainer import BiSeNetTrainer
    from ctrlhair_tpu.training.loop import run_training

    cfg = BiSeNetConfig() if args.input_size is None else BiSeNetConfig(
        input_size=args.input_size)
    trainer = BiSeNetTrainer(cfg)
    state = trainer.init_state(jax.random.PRNGKey(args.seed))

    dataset = None
    if not args.synthetic:
        from ctrlhair_tpu.data.sean_dataset import SEANDataset
        try:
            # same paired image/label layout as SEAN training
            dataset = SEANDataset(args.image_dir, args.label_dir,
                                  crop_size=cfg.input_size, seed=args.seed)
            if len(dataset) == 0:
                dataset = None
        except Exception as exc:
            print(f'[run_bisenet] dataset unavailable ({exc}); synthetic')
    if dataset is None and not args.synthetic:
        print('[run_bisenet] no paired data found; using synthetic batches')

    host_rng = np.random.default_rng(args.seed)
    s = cfg.input_size

    def batch_fn(step):
        if dataset is not None:
            batch = dataset.batch(args.batch_size)
            if batch is not None:
                img = jnp.asarray(batch['image']) * 0.5 + 0.5   # [-1,1]->[0,1]
                return {'image': normalize_imagenet(img),
                        'label': jnp.asarray(batch['label'])}
        return {
            'image': jnp.asarray(host_rng.standard_normal(
                (args.batch_size, s, s, 3)), jnp.float32),
            'label': jnp.asarray(host_rng.integers(
                0, 19, (args.batch_size, s, s)), jnp.int32),
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
            tag='bisenet')
    print('[run_bisenet] done:',
          {k: float(np.asarray(v)) for k, v in metrics.items()
           if np.asarray(v).size == 1})
    return state


if __name__ == '__main__':
    main()
