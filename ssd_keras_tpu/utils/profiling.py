"""Profiling and benchmarking utilities.

The reference has no tracing/profiling subsystem (SURVEY.md §5.1) beyond the
README's FPS methodology (batch-1 vs batch-8 timing). This module provides:

* :func:`trace` — a jax.profiler trace context writing TensorBoard-viewable
  device traces,
* :func:`benchmark_fps` — the FPS measurement harness, robust to runtimes
  where ``block_until_ready`` does not actually block (this environment's TPU
  tunnel): successive calls are data-chained on device through a scalar
  checksum, so one final ``device_get`` waits for the whole timed window,
* :func:`device_sync` — best-effort full synchronization.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp

__all__ = ["trace", "benchmark_fps", "device_sync", "time_in_jit"]


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace"):
    """Capture a device trace (open with TensorBoard's profile plugin)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def device_sync(x=None):
    """Force completion of all queued work by a host read-back."""
    if x is None:
        x = jnp.zeros(())
    jax.device_get(x)


def time_in_jit(fn, *args, reps=(50, 250), repeats=3):
    """ms per call of ``fn(*args)`` via an in-jit fori_loop with the output
    folded into the first argument (defeats LICM and per-call dispatch).

    A single synchronous program execution through a remote-attached TPU
    tunnel costs ~30 ms of launch round-trip regardless of compute. Timing
    ONE loop therefore overstates short stages by ~30/reps ms; measuring at
    two iteration counts and taking the slope ``(T(r2) - T(r1)) / (r2 - r1)``
    cancels the fixed launch cost exactly. This is the chip's own per-call
    time — what a directly-attached host would see (examples/
    profile_breakdown.py uses the same calibration; docs/benchmarks/
    profile.md documents the methodology).
    """

    def timed_loop(r):
        @jax.jit
        def loop(*a):
            def body(_, carry):
                first, rest = carry[0], carry[1:]
                out = fn(first, *rest)
                leaf = jax.tree_util.tree_leaves(out)[0]
                s = jnp.sum(leaf).astype(first.dtype) * 0
                return (first + s, *rest)

            return jax.lax.fori_loop(0, r, body, a)[0]

        out = loop(*args)  # compile
        jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        best = None
        for _ in range(repeats):
            t0 = time.perf_counter()
            out = loop(*args)
            jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        return best

    r1, r2 = reps
    return (timed_loop(r2) - timed_loop(r1)) / (r2 - r1) * 1000.0


def benchmark_fps(
    forward: Callable,
    example_batch,
    n_iters: int = 30,
    n_repeats: int = 3,
    warmup: int = 2,
    batch_size: Optional[int] = None,
) -> dict:
    """Measure throughput of ``forward(batch)`` in images/sec.

    ``forward`` must accept the batch and return an array (or pytree whose
    first leaf is an array). Calls are chained: iteration i's input is
    ``batch + checksum_{i-1} * 0`` so the device must execute them in order
    and a single trailing ``device_get`` bounds the timed window even when
    ``block_until_ready`` is a no-op.
    """
    batch = jnp.asarray(example_batch)
    if batch_size is None:
        batch_size = int(batch.shape[0])

    @jax.jit
    def chained(batch, checksum):
        out = forward(batch + checksum.astype(batch.dtype))
        leaf = jax.tree_util.tree_leaves(out)[0]
        return jnp.sum(leaf).astype(jnp.float32) * 0.0

    checksum = jnp.float32(0.0)
    for _ in range(warmup):
        checksum = chained(batch, checksum)
    jax.device_get(checksum)

    times = []
    for _ in range(n_repeats):
        checksum = jnp.float32(0.0)
        start = time.perf_counter()
        for _ in range(n_iters):
            checksum = chained(batch, checksum)
        jax.device_get(checksum)
        times.append(time.perf_counter() - start)

    best = min(times)
    return {
        "fps": batch_size * n_iters / best,
        "ms_per_batch": best / n_iters * 1000.0,
        "batch_size": batch_size,
        "n_iters": n_iters,
        "times_s": times,
    }
