"""Tracing, step timing, and metrics logging.

The reference has no profiling story (SURVEY.md §5: tqdm + logging only).
Here:

- ``trace(logdir)``: context manager around ``jax.profiler`` producing
  TensorBoard-loadable traces of device execution.
- ``StepTimer``: wall-clock step timing with EMA + examples/sec, designed
  for async dispatch (call ``tick`` AFTER forcing the result you log).
- ``MetricsLogger``: append-only jsonl metrics stream (step, name, value,
  wall time) — greppable, plottable, and diffable in CI; plus an optional
  TensorBoard writer when tensorboardX/tf is importable.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Dict, Optional


@contextlib.contextmanager
def trace(logdir: str):
    import jax

    os.makedirs(logdir, exist_ok=True)
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    def __init__(self, ema: float = 0.98):
        self.ema = ema
        self.avg_s: Optional[float] = None
        self._last = time.perf_counter()

    def tick(self, n_examples: int = 0) -> Dict[str, float]:
        now = time.perf_counter()
        dt = now - self._last
        self._last = now
        self.avg_s = dt if self.avg_s is None else self.ema * self.avg_s + (1 - self.ema) * dt
        out = {"step_time_s": dt, "step_time_ema_s": self.avg_s}
        if n_examples:
            out["examples_per_s"] = n_examples / dt
        return out


class MetricsLogger:
    def __init__(self, output_dir: str, filename: str = "metrics.jsonl",
                 tensorboard: bool = False):
        os.makedirs(output_dir, exist_ok=True)
        self.path = os.path.join(output_dir, filename)
        self._f = open(self.path, "a")
        self._tb = None
        if tensorboard:
            try:
                from tensorboardX import SummaryWriter  # optional

                self._tb = SummaryWriter(output_dir)
            except ImportError:
                pass

    def log(self, step: int, **metrics: float):
        record = {"step": step, "time": time.time(), **metrics}
        self._f.write(json.dumps(record) + "\n")
        self._f.flush()
        if self._tb is not None:
            for name, value in metrics.items():
                self._tb.add_scalar(name, value, step)

    def close(self):
        self._f.close()
        if self._tb is not None:
            self._tb.close()
