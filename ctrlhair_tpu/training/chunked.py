# Chunked training: many optimizer steps per device dispatch.
#
# This environment's TPU sits behind a SERIAL relay that charges ~0.2 s of
# wall clock per dispatched program regardless of device time, so a
# per-step host loop caps every trainer at ~5 steps/s wall while the chip
# itself sustains hundreds (r4 measured: shape 242 enqueued steps/s vs 4.4
# wall).  Rolling K steps into one jitted lax.scan program makes wall time
# device-limited again: one dispatch + one host sync per K steps.
#
# The reference has no analog (torch eager dispatches per op and its GPUs
# are local, ref: color_texture_branch/train.py:115-158); this is the
# XLA-era equivalent of a fused training loop.  RNG parity is preserved
# exactly: the scan body derives the SAME per-step keys
# (PRNGKey(batch_seed + step), PRNGKey(step_seed + step)) the host loop
# used, so a chunked run and a per-step run produce bit-identical streams
# (tests/test_training.py::test_chunked_loop_matches_per_step).

from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class ChunkRunner:
    """Wraps a per-step train function into a K-steps-per-dispatch scan.

    step_fn(state, batch, rng) -> (state, metrics): one optimizer step,
        pure (the usual jitted train_step works as-is — nested jit inlines
        under the scan trace).
    make_batch(key) -> batch pytree: DEVICE-side batch construction (gather
        from device-resident pools + RNG); must be traceable.
    batch_seed / step_seed: the host loop's key offsets, preserved so
        resuming mid-run or switching chunk sizes never changes the data
        or noise any given step sees.
    """

    def __init__(self, step_fn: Callable, make_batch: Callable, *,
                 batch_seed: int = 0, step_seed: int = 0):
        def chunk(state, step0, nsteps: int, *extra):
            def body(st, i):
                step = step0 + i
                batch = make_batch(jax.random.PRNGKey(batch_seed + step))
                st2, m = step_fn(st, batch,
                                 jax.random.PRNGKey(step_seed + step),
                                 *extra)
                return st2, m
            return jax.lax.scan(body, state, jnp.arange(nsteps))

        # static nsteps: one executable per distinct chunk size (the run
        # loop uses one size + possibly one remainder).  `extra` carries
        # frozen side inputs (e.g. predictor params) as ARGUMENTS — closed
        # over they would be embedded as HLO constants, the program-bloat
        # class that took the ct rec compile to ~40 min (commit a8acd7a).
        self._chunk = jax.jit(chunk, static_argnums=(2,),
                              donate_argnums=(0,))

    def run(self, state, start: int, stop: int, *, chunk_size: int = 256,
            record_every: int = 250, extra_args: Tuple = (),
            on_chunk: Optional[Callable[[int, Any, List[Dict]], None]]
            = None) -> Tuple[Any, List[Dict[str, float]], int]:
        """Run steps [start, stop); returns (state, rows, finite_trips).

        Rows are recorded at the same cadence as the per-step loops
        (every `record_every` steps + the final step); finite-guard trips
        are counted over EVERY step (the per-chunk metric sync makes the
        per-step loops' device-side accumulator unnecessary).  `on_chunk(
        step, state, rows)` fires after each dispatch completes —
        checkpointing hook; `step` is the NEXT step to run.  If `on_chunk`
        returns truthy the loop stops early (deadline handling) — the
        returned state resumes exactly (see the resume test).
        """
        rows: List[Dict[str, float]] = []
        finite_trips = 0
        step = start
        while step < stop:
            n = min(chunk_size, stop - step)
            state, ms = self._chunk(state, jnp.asarray(step, jnp.int32), n,
                                    *extra_args)
            ms = jax.device_get(ms)   # one host sync per chunk
            if 'finite' in ms:
                finite_trips += int(n - np.sum(ms['finite']))
            for i in range(n):
                s = step + i
                if s % record_every == 0 or s == stop - 1:
                    rows.append({'step': s, **{k: float(v[i])
                                               for k, v in ms.items()}})
            step += n
            if on_chunk is not None and on_chunk(step, state, rows):
                break
        return state, rows, finite_trips
