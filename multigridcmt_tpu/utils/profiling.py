"""Tracing/profiling hooks (SURVEY.md §5 "Tracing / profiling").

Thin wrappers over jax.profiler so benchmark loops produce TensorBoard/
Perfetto traces, plus named scopes so each multigrid level shows up as its
own row in the trace viewer.
"""
from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace around a block:

    >>> with trace("/tmp/mg-trace"):
    ...     solver.solve().x.block_until_ready()
    """
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def level_scope(level: int):
    """Named scope for one multigrid level (visible in traces)."""
    return jax.named_scope(f"mg_level_{level}")


class Timer:
    """Wall-clock timer with an explicit device fence.

    Forces completion through a scalar fetch — `block_until_ready` alone is
    not a reliable fence through remote-dispatch runtimes (measured on the
    axon tunnel; see bench.py's min-of-reps methodology).
    """

    def __init__(self):
        self.t0 = None
        self.elapsed = None

    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self.t0
        return False

    @staticmethod
    def fence(x: jax.Array) -> float:
        import jax.numpy as jnp

        return float(jnp.sum(x))
