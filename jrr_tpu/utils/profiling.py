"""Tracing / profiling hooks.

The reference has no profiling beyond tqdm bars (SURVEY §5). Here:
- `trace(dir)`: context manager around `jax.profiler` for TensorBoard traces;
- `annotate(name)`: TraceAnnotation for named regions inside a step;
- `StepTimer`: wall-clock rates with `block_until_ready` fencing — steps/sec
  (and frames/sec) per chip is the north-star metric;
- `log_compile_time`: one-off helper that separates trace/lower/compile/run
  costs (compile-time variance matters on remote-compile backends).
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Throughput measurement with device fencing.

    >>> timer = StepTimer(frames_per_step=256)
    >>> for _ in range(n):
    ...     out = step(...)
    ...     timer.tick(out)
    >>> timer.rates()  # {'steps_per_sec': ..., 'frames_per_sec': ...}
    """

    def __init__(self, frames_per_step: int = 1, warmup: int = 1):
        self.frames_per_step = frames_per_step
        self.warmup = warmup
        self._count = 0
        self._t0: Optional[float] = None

    def tick(self, device_out=None) -> None:
        if device_out is not None:
            jax.block_until_ready(device_out)
        self._count += 1
        if self._count == self.warmup:
            self._t0 = time.perf_counter()

    def rates(self) -> Dict[str, float]:
        timed = self._count - self.warmup
        if self._t0 is None or timed <= 0:
            return {"steps_per_sec": 0.0, "frames_per_sec": 0.0}
        dt = time.perf_counter() - self._t0
        return {
            "steps_per_sec": timed / dt,
            "frames_per_sec": timed * self.frames_per_step / dt,
            "seconds_per_step": dt / timed,
        }


def log_compile_time(fn, *args) -> Dict[str, float]:
    """Split trace/lower, compile, and first-run costs of a jitted callable."""
    jitted = jax.jit(fn) if not hasattr(fn, "lower") else fn
    t0 = time.perf_counter()
    lowered = jitted.lower(*args)
    t_lower = time.perf_counter() - t0
    t0 = time.perf_counter()
    compiled = lowered.compile()
    t_compile = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = compiled(*args)
    jax.block_until_ready(out)
    t_run = time.perf_counter() - t0
    return {"lower_s": t_lower, "compile_s": t_compile, "first_run_s": t_run}
