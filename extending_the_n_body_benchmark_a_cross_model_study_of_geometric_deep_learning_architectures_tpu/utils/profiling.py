"""Profiling: jax.profiler traces + steady-state timing helpers.

The reference's observability is wall-clock-only (tqdm ms/step with
``torch.cuda.synchronize``, SURVEY.md §5.1).  Here steps/s is first-class in
the metric stream (``train/steps_per_sec``), and full XLA traces come from
:func:`trace` — open the output dir with TensorBoard/XProf or Perfetto.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace for the enclosed block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def time_fn(
    fn: Callable,
    *args,
    warmup: int = 1,
    iters: int = 5,
) -> dict:
    """Steady-state timing of a jitted callable (blocks on outputs)."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)
    return {
        "mean_s": sum(times) / len(times),
        "min_s": min(times),
        "max_s": max(times),
        "iters": iters,
    }
