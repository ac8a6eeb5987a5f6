"""Profiling / cost accounting.

The reference's observability was ad-hoc wall-clock prints and a
commented-out thop FLOPs profile (SelfC_model.py:20-22,225-229). Here:

  * ``count_params`` — parameter count of a pytree.
  * ``cost_analysis`` — XLA-compiled FLOPs / bytes for a jitted call
    (the thop equivalent, from the compiler's own cost model).
  * ``StepTimer`` — EMA step timer for the train loop.
  * ``trace`` — context manager around ``jax.profiler`` for device traces
    viewable in TensorBoard/XProf.
"""

from __future__ import annotations

import contextlib
import time

import jax
import numpy as np


def count_params(params) -> int:
    return int(sum(np.prod(p.shape) for p in jax.tree.leaves(params)))


def cost_analysis(fn, *args, **kwargs):
    """Returns {'flops': ..., 'bytes accessed': ...} for fn(*args)."""
    lowered = jax.jit(fn).lower(*args, **kwargs)
    compiled = lowered.compile()
    costs = compiled.cost_analysis()
    if isinstance(costs, list):  # older jax returns a list per-computation
        costs = costs[0]
    return dict(costs) if costs else {}


class StepTimer:
    def __init__(self, ema: float = 0.9):
        self.ema = ema
        self.avg = None
        self._t0 = None

    def tic(self):
        self._t0 = time.perf_counter()

    def toc(self) -> float:
        dt = time.perf_counter() - self._t0
        self.avg = dt if self.avg is None else (
            self.ema * self.avg + (1 - self.ema) * dt
        )
        return dt


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
