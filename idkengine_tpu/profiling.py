"""Profiling/tracing hooks.

Role of the reference's GL debug groups + TimerQuery
(ref: BBG/Source/Computing.cs:11-16 named passes, Objects/TimerQuery.cs):
named trace annotations via jax.profiler plus a lightweight host-side pass
timer that works through the async dispatch (forces a sync at scope exit).
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax

from .log import get_logger

log = get_logger(__name__)

_timings: dict[str, list] = defaultdict(list)


@contextlib.contextmanager
def pass_scope(name: str, sync_value=None):
    """Named pass scope: shows up in jax.profiler traces; if sync_value is
    given, block on it at exit and record wall time (TimerQuery role)."""
    with jax.profiler.TraceAnnotation(name):
        t0 = time.perf_counter()
        yield
        if sync_value is not None:
            jax.block_until_ready(sync_value)
        _timings[name].append((time.perf_counter() - t0) * 1e3)


def start_trace(log_dir: str = "/tmp/idk_trace"):
    """Begin a jax.profiler trace (view with TensorBoard/xprof)."""
    jax.profiler.start_trace(log_dir)


def stop_trace():
    jax.profiler.stop_trace()


def report() -> dict[str, float]:
    """Mean ms per named pass since the last reset."""
    return {k: sum(v) / max(len(v), 1) for k, v in _timings.items()}


def reset():
    _timings.clear()


def log_report():
    for name, ms in sorted(report().items()):
        log.info("pass %-28s %.2f ms", name, ms)
