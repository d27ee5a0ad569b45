"""Profiling and observability utilities.

The reference's only instrumentation is ``time.time()`` bracketing and
console prints (SURVEY.md §5 "Tracing"). Here: a ``jax.profiler`` trace
context for TensorBoard-compatible device profiles, and a step-rate meter
whose chain-steps/sec is the framework's north-star denominator.
"""

from __future__ import annotations

import contextlib
import json
import time
from dataclasses import dataclass, field
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def device_trace(logdir: str) -> Iterator[None]:
    """Capture a jax.profiler trace (XLA ops, HBM, fusion view) under
    ``logdir`` — view with TensorBoard or xprof."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@dataclass
class StepMeter:
    """Incremental chain-steps/sec counter for block-wise sampling loops."""

    chains: int
    t_start: float = field(default_factory=time.perf_counter)
    steps: int = 0
    _marks: list = field(default_factory=list)

    def add(self, n_steps: int) -> None:
        self.steps += n_steps
        self._marks.append((time.perf_counter(), self.steps))

    @property
    def elapsed(self) -> float:
        return time.perf_counter() - self.t_start

    @property
    def chain_steps_per_sec(self) -> float:
        return self.steps * self.chains / max(self.elapsed, 1e-9)

    def rate_recent(self, window: int = 5) -> float:
        """Rate over the last ``window`` marks (excludes compile warmup)."""
        if len(self._marks) < 2:
            return self.chain_steps_per_sec
        t0, s0 = self._marks[max(0, len(self._marks) - window - 1)]
        t1, s1 = self._marks[-1]
        return (s1 - s0) * self.chains / max(t1 - t0, 1e-9)

    def report(self) -> str:
        return json.dumps(
            {
                "steps": self.steps,
                "chains": self.chains,
                "elapsed_s": round(self.elapsed, 3),
                "chain_steps_per_sec": round(self.chain_steps_per_sec, 1),
                "recent_chain_steps_per_sec": round(self.rate_recent(), 1),
            }
        )
