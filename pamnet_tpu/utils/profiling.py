"""Tracing / profiling / observability helpers.

The reference has no profiling at all (SURVEY.md section 5: epoch-level
prints only).  This module provides:

* :func:`trace` — context manager around ``jax.profiler`` emitting a
  TensorBoard-loadable device trace,
* :class:`StepTimer` — steady-state step timing + molecules/sec,
* :func:`enable_nan_checks` — jax debug-nans mode (the TPU-side analog of
  the reference's host NaN assert, utils/featurizer.py:258-259).
"""

from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def trace(log_dir: str):
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def enable_nan_checks(enable: bool = True) -> None:
    import jax

    jax.config.update("jax_debug_nans", enable)


class StepTimer:
    """Wall-clock step statistics with warmup skipping."""

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self._times: list[float] = []
        self._last: float | None = None
        self._steps = 0

    def tick(self) -> None:
        now = time.perf_counter()
        self._steps += 1
        if self._last is not None and self._steps > self.warmup:
            self._times.append(now - self._last)
        self._last = now

    @property
    def mean_step_seconds(self) -> float:
        return sum(self._times) / len(self._times) if self._times else float("nan")

    def throughput(self, items_per_step: int) -> float:
        s = self.mean_step_seconds
        return items_per_step / s if s == s and s > 0 else float("nan")

    def summary(self, items_per_step: int) -> str:
        return (
            f"{self.mean_step_seconds * 1e3:.2f} ms/step, "
            f"{self.throughput(items_per_step):.0f} items/s"
        )


class CSVLogger:
    """Append-only CSV metrics log (one header, one row per call)."""

    def __init__(self, path: str, fields: list[str]):
        import os

        self.path = path
        self.fields = fields
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        if not os.path.exists(path):
            with open(path, "w") as f:
                f.write(",".join(fields) + "\n")

    def log(self, **kwargs) -> None:
        with open(self.path, "a") as f:
            f.write(",".join(str(kwargs.get(k, "")) for k in self.fields) + "\n")
