# Runnable supervised-predictor training driver (curliness / colour).
#
# Parity target: `python color_texture_branch/predictor/predictor_train.py
# -c p002|p004` (ref: predictor_train.py:36-146): labelled code batches,
# held-out test metrics to tensorboard, checkpoint/resume.
#
# Usage: python -m ctrlhair_tpu.training.run_predictor --which rgb|curliness

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument('--which', choices=['rgb', 'curliness'],
                        default='rgb')
    parser.add_argument('--data-root', default='dataset_info_ctrlhair')
    parser.add_argument('--out-dir', default=None)
    parser.add_argument('--steps', type=int, default=None)
    parser.add_argument('--seed', type=int, default=0)
    parser.add_argument('--synthetic', action='store_true')
    args = parser.parse_args(argv)

    from ctrlhair_tpu.config import (ColorTextureConfig,
                                     curliness_predictor_config,
                                     rgb_predictor_config)
    from ctrlhair_tpu.training.loop import run_training
    from ctrlhair_tpu.training.predictor_trainer import PredictorTrainer

    cfg = (rgb_predictor_config() if args.which == 'rgb'
           else curliness_predictor_config())
    out_dir = args.out_dir or (
        'model_trained/color_encoder/ctrlhair_tpu' if args.which == 'rgb'
        else 'model_trained/curliness_classifier/ctrlhair_tpu')
    total_steps = args.steps or cfg.total_step
    trainer = PredictorTrainer(cfg)
    state = trainer.init_state(jax.random.PRNGKey(args.seed))

    dataset = None
    if not args.synthetic and os.path.isdir(args.data_root):
        try:
            from ctrlhair_tpu.data.color_texture_dataset import (
                ColorTextureDataset)
            dataset = ColorTextureDataset(ColorTextureConfig(),
                                          args.data_root)
            if not dataset.train_keys:
                dataset = None
        except Exception as exc:
            print(f'[run_predictor] dataset unavailable ({exc}); synthetic')

    rng = np.random.default_rng(args.seed)

    def batch_fn(step):
        n = cfg.total_batch_size
        if dataset is not None:
            if args.which == 'curliness':
                b = dataset.curliness_batch(n)
                if b is not None:
                    return {k: jnp.asarray(v) for k, v in b.items()}
            else:
                b = dataset.training_batch(n)
                return {k: jnp.asarray(b[k])
                        for k in ('code', 'rgb_mean', 'pca_std')}
        # synthetic fallback
        code = rng.standard_normal((n, cfg.style_dim)).astype(np.float32)
        batch = {'code': jnp.asarray(code)}
        if args.which == 'curliness':
            batch['curliness_label'] = jnp.asarray(
                np.where(code[:, :1].sum(1, keepdims=True) > 0, 1.0, -1.0))
        else:
            batch['rgb_mean'] = jnp.asarray(code[:, :3] * 40 + 128)
            batch['pca_std'] = jnp.asarray(
                np.abs(code[:, 3:4]) * 30 + 20)
        return batch

    state, metrics = run_training(
        state, trainer.train_step, batch_fn, total_steps,
        rng=jax.random.PRNGKey(args.seed + 1),
        log_dir=os.path.join(out_dir, 'logs'),
        ckpt_dir=os.path.join(out_dir, 'checkpoints'),
        model_save_step=1000, sample_step=10 ** 9, tag=args.which)
    print('[run_predictor] done:',
          {k: float(np.asarray(v)) for k, v in metrics.items()
           if np.asarray(v).size == 1})
    return state


if __name__ == '__main__':
    main()
