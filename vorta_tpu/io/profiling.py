"""First-class profiling helpers (reference has none — SURVEY §5).

Wraps jax.profiler tracing and parses the perfetto trace into per-op device
durations, which is how the round-1 kernel bottlenecks (VPU-bound STA blocks,
per-cell overheads) were found.
"""

from __future__ import annotations

import glob
import gzip
import json
import tempfile
from contextlib import contextmanager
from typing import Dict, List, Tuple

import jax


@contextmanager
def device_trace(trace_dir: str = None):
    """Context manager capturing a device trace; yields the trace dir."""
    trace_dir = trace_dir or tempfile.mkdtemp(prefix="vorta_trace_")
    with jax.profiler.trace(trace_dir):
        yield trace_dir


def op_durations(trace_dir: str, top: int = 25) -> List[Tuple[str, float, int]]:
    """Aggregate (name, total_ms, count) from the newest trace, largest first."""
    files = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    if not files:
        return []
    events = json.loads(gzip.open(sorted(files)[-1]).read())["traceEvents"]
    agg: Dict[str, List[float]] = {}
    for e in events:
        if e.get("ph") == "X" and "dur" in e:
            name = e.get("name", "")
            cur = agg.setdefault(name, [0.0, 0])
            cur[0] += e["dur"] / 1e3
            cur[1] += 1
    rows = sorted(((k, v[0], v[1]) for k, v in agg.items()), key=lambda r: -r[1])
    return rows[:top]


def profile_call(fn, *args, top: int = 25, warmup: bool = True):
    """Run fn under a trace (after an optional warmup) and return durations."""
    if warmup:
        jax.block_until_ready(fn(*args))
    with device_trace() as d:
        jax.block_until_ready(fn(*args))
    return op_durations(d, top=top)
