"""Tracing / profiling utilities — the observability subsystem the reference
lacks (SURVEY.md §5: 'Tracing/profiling: absent'), done the TPU way.

* :func:`trace` — context manager around ``jax.profiler`` producing a
  TensorBoard-loadable trace directory (device + host timelines, XLA ops).
* :func:`benchmark` — ``block_until_ready`` wall-clock timing with warmup,
  returning per-iteration stats; the building block of bench.py.
* :func:`xla_dump` — enable XLA HLO dumps for a code region (compile-time
  inspection of fusions/layouts).
* :func:`annotate` — named host-side region that shows up in traces.
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Callable, Iterable

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace into ``log_dir`` (view with TensorBoard)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named trace region: ``with annotate('data-load'): ...``"""
    return jax.profiler.TraceAnnotation(name)


def benchmark(fn: Callable, *args, warmup: int = 2, iters: int = 10):
    """Time ``fn(*args)`` with block_until_ready; returns dict of seconds."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)
    times.sort()
    return {
        "mean": sum(times) / len(times),
        "median": times[len(times) // 2],
        "min": times[0],
        "max": times[-1],
        "iters": iters,
    }


@contextlib.contextmanager
def xla_dump(dump_dir: str):
    """Enable XLA HLO dumps for compilations inside the region. Must run
    before the target function's first compilation to have any effect."""
    old = os.environ.get("XLA_FLAGS", "")
    os.environ["XLA_FLAGS"] = f"{old} --xla_dump_to={dump_dir}".strip()
    try:
        yield dump_dir
    finally:
        os.environ["XLA_FLAGS"] = old


def device_memory_stats() -> dict:
    """Per-device HBM usage (bytes) where the backend exposes it."""
    stats = {}
    for d in jax.local_devices():
        try:
            s = d.memory_stats()
            stats[str(d)] = {
                "bytes_in_use": s.get("bytes_in_use"),
                "peak_bytes_in_use": s.get("peak_bytes_in_use"),
                "bytes_limit": s.get("bytes_limit"),
            }
        except Exception:
            stats[str(d)] = None
    return stats
