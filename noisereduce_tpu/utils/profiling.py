"""Profiling helpers (the reference has no tracing/profiling at all —
SURVEY.md §5; its only instrumentation is a tqdm bar).

``trace(dir)`` wraps ``jax.profiler`` for TensorBoard-viewable device
traces; ``rtf(fn, audio_seconds)`` measures an honest real-time factor by
synchronizing on a small in-graph reduction (remote-execution tunnels can
return early from ``block_until_ready``).
"""
from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax
import jax.numpy as jnp

__all__ = ["trace", "measure_rtf"]


@contextlib.contextmanager
def trace(log_dir: str):
    """Context manager: capture a jax.profiler device trace into log_dir."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def measure_rtf(
    fn: Callable, args: tuple, audio_seconds: float, iters: int = 5
) -> float:
    """Real-time factor of ``fn(*args)`` (audio-seconds processed per second).

    ``fn`` is jitted with an appended scalar checksum so timing waits for
    true completion even through remote-execution tunnels.
    """
    timed = jax.jit(lambda *a: jnp.sum(fn(*a)))
    float(timed(*args))  # compile + warm
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        float(timed(*args))
        best = min(best, time.perf_counter() - t0)
    return audio_seconds / best
