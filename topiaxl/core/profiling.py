"""Tracing / profiling / observability.

The reference's only instrumentation is nvcc -lineinfo, wall-clock
prints around cuda.synchronize, and tqdm (SURVEY.md §5). TPU-native
equivalents: jax.profiler traces (Perfetto/XProf-compatible), a
block_until_ready timing harness, and a steps/sec meter for the
north-star DiT metric.
"""

from __future__ import annotations

import contextlib
import json
import time
from typing import Callable, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace viewable in XProf/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def timeit(fn: Callable, *args, iters: int = 10, warmup: int = 2,
           **kwargs) -> dict:
    """Wall-clock a jitted callable with proper device sync."""
    for _ in range(warmup):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    return {"mean_s": dt, "per_sec": 1.0 / dt, "iters": iters}


class StepMeter:
    """steps/sec + ETA meter for training/sampling loops."""

    def __init__(self, window: int = 50):
        self.window = window
        self._times: list[float] = []
        self._count = 0

    def tick(self, n: int = 1) -> None:
        self._count += n
        self._times.append(time.perf_counter())
        if len(self._times) > self.window:
            self._times = self._times[-self.window:]

    @property
    def steps_per_sec(self) -> float:
        if len(self._times) < 2:
            return 0.0
        span = self._times[-1] - self._times[0]
        return (len(self._times) - 1) / max(span, 1e-9)

    def eta(self, remaining_steps: int) -> float:
        sps = self.steps_per_sec
        return remaining_steps / sps if sps > 0 else float("inf")


class MetricLogger:
    """JSONL metric log + stdout lines (replaces the reference's bare
    prints; config knobs log_every_n_steps etc. drive the cadence)."""

    def __init__(self, path: Optional[str] = None, print_every: int = 1):
        self.path = path
        self.print_every = print_every
        self._fh = open(path, "a") if path else None

    def log(self, step: int, metrics: dict) -> None:
        vals = {k: float(v) for k, v in metrics.items()}
        rec = {"step": int(step), **vals}
        if self._fh:
            self._fh.write(json.dumps(rec) + "\n")
            self._fh.flush()
        if step % self.print_every == 0:
            msg = " ".join(f"{k}={v:.5g}" for k, v in vals.items())
            print(f"[step {step}] {msg}", flush=True)

    def close(self) -> None:
        if self._fh:
            self._fh.close()
