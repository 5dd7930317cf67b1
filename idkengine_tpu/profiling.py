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


# ---------------------------------------------------------------------------
# Device-event capture (role of the reference's per-pass TimerQuery tables)
# ---------------------------------------------------------------------------

def capture_device_profile(fn, trace_dir: str = "/tmp/idk_devprof"):
    """Run fn() under a jax.profiler trace and return {bucket: ms} of device
    kernel time. Pallas tracers carry call-site tags in their kernel names
    (ops/packet_trace.py `name=`): pt_closest_*_pri -> primary,
    *_bnc -> bounce closest, pt_any_*_nee/_env -> NEE shadow rays. XLA ops
    bucket by HLO opcode (sort/fusion/...). Used by `bench.py` to publish
    the per-pass breakdown next to the headline number."""
    import collections
    import glob
    import gzip
    import json as _json
    import shutil

    shutil.rmtree(trace_dir, ignore_errors=True)
    with jax.profiler.trace(trace_dir):
        out = fn()
        jax.block_until_ready(out)
    paths = sorted(glob.glob(trace_dir + "/plugins/profile/*/*.trace.json.gz"))
    if not paths:
        return {}
    with gzip.open(paths[-1]) as f:
        tr = _json.load(f)
    meta = {e.get("pid"): str(e.get("args", {}).get("name", ""))
            for e in tr["traceEvents"]
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    dev = [p for p, n in meta.items()
           if "TPU" in n or "Chip" in n or "/device:" in n]

    def bucket(name: str) -> str:
        n = name.lower()
        if n.startswith("jit_"):
            # module-level jit events SPAN their child kernels/fusions —
            # counting them double-books every pass as glue (the round-4
            # frame-event dump showed jit__render_sample = the whole frame
            # being bucketed into xla_glue)
            return "_parent"
        if "pt_closest" in n:
            if "_pri" in n:
                return "primary"
            if "_bnc" in n:
                return "bounce_closest"
            return "trace_other"
        if "pt_any" in n:
            if "_nee" in n or "_env" in n:
                return "nee"
            return "trace_other"
        if "scatter_max" in n or "voxel" in n:
            return "voxelize"
        if n.startswith("sort") or ".sort" in n or "sort." in n:
            return "sorts"
        if "dynamic-update-slice" in n or ("copy" in n and "fusion" not in n):
            return "copies"
        return "xla_glue"

    by = collections.defaultdict(float)
    for e in tr["traceEvents"]:
        if e.get("ph") == "X" and e.get("pid") in dev:
            by[bucket(str(e.get("name", "")))] += e.get("dur", 0) / 1000.0
    by.pop("_parent", None)
    by["total_device"] = sum(v for k, v in by.items())
    shutil.rmtree(trace_dir, ignore_errors=True)
    return {k: round(v, 1) for k, v in sorted(by.items(), key=lambda kv: -kv[1])}
