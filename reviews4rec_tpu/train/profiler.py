"""Profiling / observability.

The reference's only instrumentation is wall-clock epoch timing
(main.py:105,120) and tqdm bars. Here:
- `trace(logdir)`: context manager around `jax.profiler.trace` for
  XPlane/TensorBoard traces of jitted steps;
- `annotate(name)`: TraceAnnotation wrapper so named regions (train
  step, eval, materialize) show up in the trace;
- `Throughput`: running examples/s + step-time stats, reported in the
  epoch banner (the BASELINE.md north-star counter).
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(logdir: Optional[str]) -> Iterator[None]:
    if not logdir:
        yield
        return
    with jax.profiler.trace(logdir):
        yield


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)


@dataclass
class Throughput:
    examples: float = 0.0
    steps: int = 0
    _t0: float = field(default_factory=time.perf_counter)

    def add(self, n: float) -> None:
        self.examples += n
        self.steps += 1

    @property
    def elapsed(self) -> float:
        return time.perf_counter() - self._t0

    @property
    def examples_per_s(self) -> float:
        return self.examples / max(self.elapsed, 1e-9)

    @property
    def ms_per_step(self) -> float:
        return 1e3 * self.elapsed / max(self.steps, 1)

    def metrics(self) -> dict:
        return {
            "examples_per_s": round(self.examples_per_s, 1),
            "ms_per_step": round(self.ms_per_step, 2),
        }
