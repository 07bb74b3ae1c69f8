"""Profiling / tracing helpers (greenfield vs the reference, SURVEY.md S5).

Thin wrappers over ``jax.profiler`` plus an honest wall-clock timer for the
remote-execution environments where ``block_until_ready`` completes before
the device work does: the only reliable completion signal is fetching a
scalar to host.
"""
from __future__ import annotations

import contextlib
import time

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def sync(x) -> float:
    """Force completion of everything producing ``x``; returns a checksum.

    ``jax.block_until_ready`` is not a reliable completion barrier under
    remote-execution relays (it can return before the device executes);
    fetching a scalar to host is.
    """
    return float(jnp.asarray(x).ravel()[0])


def timeit(fn, *args, iters: int = 3):
    """min/median wall-clock of ``fn(*args)`` with host-fetch completion.

    Inputs should be materialised (pass them through :func:`sync`) before
    calling. Returns ``(min_seconds, all_seconds)``.
    """
    for a in args:
        sync(a)
    out = fn(*args)
    sync(out)  # warm / compile
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        sync(out)
        times.append(time.perf_counter() - t0)
    return min(times), times
