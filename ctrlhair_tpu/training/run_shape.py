# Runnable shape branch (mask VAE-GAN) training driver.
#
# Parity target: `python shape_branch/train.py -c 054` (ref: shape_branch/
# train.py:36-129): warp-pool triplet batches (or synthetic fallback),
# fused jitted D/G/Dz step, tensorboard, checkpoint/resume.
#
# Usage: python -m ctrlhair_tpu.training.run_shape --data-root ... --steps N

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument('--data-root', default='dataset_info_ctrlhair')
    parser.add_argument('--out-dir', default='model_trained/shape/ctrlhair_tpu')
    parser.add_argument('--steps', type=int, default=None)
    parser.add_argument('--batch-size', type=int, default=None)
    parser.add_argument('--dp', type=int, default=1)
    parser.add_argument('--seed', type=int, default=0)
    parser.add_argument('--synthetic', action='store_true')
    args = parser.parse_args(argv)

    from ctrlhair_tpu.config import ShapeConfig
    from ctrlhair_tpu.parallel import mesh as pmesh
    from ctrlhair_tpu.training.loop import run_training
    from ctrlhair_tpu.training.shape_trainer import (
        ShapeTrainer, synthetic_batch)

    cfg = ShapeConfig()
    total_steps = args.steps or cfg.total_step
    batch_size = args.batch_size or cfg.total_batch_size
    trainer = ShapeTrainer(cfg)
    state = trainer.init_state(jax.random.PRNGKey(args.seed))

    dataset = None
    if not args.synthetic and os.path.isdir(args.data_root):
        try:
            from ctrlhair_tpu.data.shape_dataset import ShapeDataset
            dataset = ShapeDataset(cfg, args.data_root)
            if not dataset.pool_files:
                dataset = None
        except Exception as exc:
            print(f'[run_shape] dataset unavailable ({exc}); synthetic')

    host_rng = np.random.default_rng(args.seed)

    def batch_fn(step):
        if dataset is not None:
            batch = dataset.training_batch(batch_size)
            if batch is not None:
                return {k: jnp.asarray(v) for k, v in batch.items()}
        return synthetic_batch(jax.random.PRNGKey(
            int(host_rng.integers(2 ** 31))), cfg, batch_size)

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
            state, trainer.train_step, batch_fn, total_steps,
            rng=jax.random.PRNGKey(args.seed + 1),
            log_dir=os.path.join(args.out_dir, 'summaries'),
            ckpt_dir=os.path.join(args.out_dir, 'checkpoints'),
            model_save_step=10000, sample_step=10000, max_keep=1,
            tag='shape')
    print('[run_shape] done:',
          {k: float(np.asarray(v)) for k, v in metrics.items()
           if np.asarray(v).size == 1})
    return state


if __name__ == '__main__':
    main()
