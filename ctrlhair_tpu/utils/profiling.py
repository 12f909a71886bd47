# Timing / tracing harness.
#
# Supersedes the reference's wall-clock context manager
# (ref: my_pylib/timer.py:5-40): device-aware timing (block_until_ready so
# async dispatch doesn't lie), percentile stats, and one-call jax.profiler
# trace capture for xprof/tensorboard.

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np


class Timer:
    """Context manager: `with Timer('render') as t: ...` prints seconds."""

    def __init__(self, msg: str = '', verbose: bool = True,
                 sync: bool = True):
        self.msg = msg
        self.verbose = verbose
        self.sync = sync
        self.elapsed = 0.0

    def __enter__(self):
        self.start = time.perf_counter()
        return self

    def __exit__(self, *exc):
        if self.sync:
            try:
                # drain the device queue: a trivial program enqueued now
                # completes only after all previously dispatched work on the
                # (FIFO) device stream — effects_barrier alone would skip
                # pending PURE computations and report dispatch time
                jax.block_until_ready(
                    jax.jit(lambda: jnp.zeros(()))())
            except Exception:
                pass
        self.elapsed = time.perf_counter() - self.start
        if self.verbose:
            print(f'[timer] {self.msg}: {self.elapsed:.4f}s')
        return False


def benchmark(fn: Callable, *args, iters: int = 20, warmup: int = 3,
              **kwargs) -> Dict[str, float]:
    """Steady-state timing of a jitted callable (blocks on outputs)."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args, **kwargs))
    times: List[float] = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args, **kwargs))
        times.append(time.perf_counter() - t0)
    arr = np.asarray(times)
    return {'mean_s': float(arr.mean()), 'p50_s': float(np.median(arr)),
            'p90_s': float(np.percentile(arr, 90)),
            'min_s': float(arr.min()), 'iters': iters}


@contextlib.contextmanager
def trace(log_dir: str = '/tmp/ctrlhair_trace'):
    """Capture an xprof trace around a block: view with tensorboard."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
