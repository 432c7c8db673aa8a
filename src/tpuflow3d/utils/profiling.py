"""Tracing / profiling utilities.

The reference times ops with CUDA events and prints wall-clock per phase
(SURVEY.md §7 "Tracing / profiling"). TPU-native equivalents: wall timings
around ``jax.block_until_ready`` for steady-state measurement, an optional
``jax.profiler`` trace context for XLA-level analysis, and a phase-timer
that reports voxels/s (the north-star metric, BASELINE.json:2).
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field

import jax


@dataclass
class PhaseTimer:
    """Accumulates wall time per named phase; everything host-visible."""
    times: dict[str, float] = field(default_factory=dict)
    counts: dict[str, int] = field(default_factory=dict)

    @contextlib.contextmanager
    def phase(self, name: str, sync=None):
        t0 = time.perf_counter()
        yield
        if sync is not None:
            jax.block_until_ready(sync)
        dt = time.perf_counter() - t0
        self.times[name] = self.times.get(name, 0.0) + dt
        self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> dict[str, dict]:
        return {k: {"seconds": v, "calls": self.counts[k]}
                for k, v in self.times.items()}

    @staticmethod
    def maybe(timer: "PhaseTimer | None"):
        """`phase(name)` context factory that degrades to a no-op when
        ``timer`` is None — the shared form of the optional-timer pattern
        used by every driver (pipeline/sharding/piecewise)."""
        if timer is None:
            return lambda name: contextlib.nullcontext()
        return timer.phase


def time_fn(fn, *args, warmup: int = 1, iters: int = 3) -> float:
    """Steady-state seconds per call (compile excluded via warmup)."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


@contextlib.contextmanager
def xla_trace(logdir: str | None):
    """jax.profiler trace context (no-op when logdir is None)."""
    if logdir is None:
        yield
        return
    with jax.profiler.trace(logdir):
        yield
