"""Profiling & step-timing utilities (SURVEY.md §5: the reference has only
wall-clock Time/step logging; here we add jax.profiler traces + annotations).

Usage:
    with trace_if("/tmp/trace", enabled=args.profile):
        for batch in loader:
            with step_annotation(step):
                state, m = train_step(state, batch)

    timer = StepTimer(warmup=2)
    ...
    timer.tick(sync_value)   # pass any host-fetched scalar to sync honestly
"""
from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace_if(log_dir: str, enabled: bool = True) -> Iterator[None]:
    """jax.profiler trace (Perfetto/TensorBoard-compatible) when enabled."""
    if not enabled:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def step_annotation(step: int):
    """Named trace span for one training step."""
    return jax.profiler.StepTraceAnnotation("train_step", step_num=step)


class StepTimer:
    """Throughput meter that syncs via host value fetches (the only honest
    synchronization on tunneled backends — see .claude/skills/verify)."""

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self._n = 0
        self._t0: Optional[float] = None

    def tick(self, sync_scalar=None) -> None:
        if sync_scalar is not None:
            float(sync_scalar)
        self._n += 1
        if self._n == self.warmup:
            self._t0 = time.perf_counter()

    @property
    def steps_timed(self) -> int:
        return max(0, self._n - self.warmup)

    def rate(self, per_step_items: int = 1) -> float:
        """items/sec over the post-warmup window."""
        if self._t0 is None or self.steps_timed == 0:
            return float("nan")
        return per_step_items * self.steps_timed / (time.perf_counter()
                                                    - self._t0)
