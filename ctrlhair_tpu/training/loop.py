# Generic training-loop scaffolding: metrics logging, checkpoint cadence,
# resume, optional data-parallel placement.
#
# Replaces the reference's per-trainer loops (ref: color_texture_branch/
# train.py:115-160, shape_branch/train.py, predictor_train.py) — tqdm +
# tensorboardX scalars every log_step, samples every sample_step, checkpoints
# every model_save_step with resume from the manifest.

from __future__ import annotations

import os
import time
from typing import Any, Callable, Dict, Optional

import jax
import numpy as np

from ctrlhair_tpu.utils.checkpoint import load_checkpoint, save_checkpoint


class MetricsWriter:
    """tensorboardX scalar writer with graceful fallback to stdout."""

    def __init__(self, log_dir: Optional[str]):
        self.writer = None
        if log_dir:
            try:
                from tensorboardX import SummaryWriter
                os.makedirs(log_dir, exist_ok=True)
                self.writer = SummaryWriter(log_dir)
            except Exception:
                self.writer = None

    def scalars(self, tag: str, metrics: Dict[str, Any], step: int) -> None:
        for key, val in metrics.items():
            try:
                v = float(np.asarray(val))
            except Exception:
                continue
            if self.writer is not None:
                self.writer.add_scalar(f'{tag}/{key}', v, step)

    def close(self):
        if self.writer is not None:
            self.writer.close()


def run_training(state, train_step: Callable, batch_fn: Callable,
                 total_steps: int, *, rng: jax.Array,
                 step_args: Callable | None = None,
                 log_dir: Optional[str] = None,
                 ckpt_dir: Optional[str] = None,
                 log_step: int = 10, model_save_step: int = 20000,
                 sample_step: int = 25000, max_keep: int = 2,
                 sample_fn: Optional[Callable] = None,
                 tag: str = 'train', verbose: bool = True):
    """Run `train_step(state, batch, *extra, rng)` for total_steps.

    - batch_fn(step) -> batch pytree (host-side sampling)
    - step_args() -> extra positional args threaded into train_step (e.g.
      frozen predictor params)
    - resume: if ckpt_dir holds a checkpoint, state is restored and the loop
      continues at step+1 (ref: train.py:67-88)
    """
    writer = MetricsWriter(log_dir)
    start = 0
    if ckpt_dir:
        restored = load_checkpoint(ckpt_dir, state)
        if restored is not None:
            state, start = restored
            start += 1
            if verbose:
                print(f'[loop] resumed from step {start - 1}')

    extra = tuple(step_args()) if step_args else ()
    t0 = time.time()
    metrics = {}
    for step in range(start, total_steps):
        rng, sub = jax.random.split(rng)
        batch = batch_fn(step)
        state, metrics = train_step(state, batch, *extra, sub)
        if step % log_step == 0:
            writer.scalars(tag, metrics, step)
            if verbose and step % (log_step * 100) == 0:
                rate = (step - start + 1) / max(time.time() - t0, 1e-9)
                keys = [k for k in ('g_total', 'd_total', 'total')
                        if k in metrics]
                vals = ' '.join(
                    f'{k}={float(np.asarray(metrics[k])):.4f}' for k in keys)
                print(f'[loop:{tag}] step {step}/{total_steps} '
                      f'{vals} ({rate:.1f} it/s)')
        if ckpt_dir and step > 0 and step % model_save_step == 0:
            save_checkpoint(ckpt_dir, state, step, max_keep=max_keep)
        if sample_fn and step > 0 and step % sample_step == 0:
            sample_fn(state, step)
    if ckpt_dir:
        save_checkpoint(ckpt_dir, state, total_steps - 1, max_keep=max_keep)
    writer.close()
    return state, metrics
