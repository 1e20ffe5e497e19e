"""Tracing & profiling.

The reference's observability is ad-hoc SystemTime spans and commented-out
println instrumentation (SURVEY.md §5.1 — reference
version1/build_implementation.rs:112-126, new_map_3.rs:335-362, and unwired
pprof dev-deps). Here it is first-class:

  * `span(name)` — host-side wall-clock spans, nestable, collected into a
    global registry (`span_report()`).
  * `profile(dir)` — wraps execution in `jax.profiler.trace`, producing
    XPlane/TensorBoard traces of the actual device timeline.
  * `QueryHandle.analyze()` (runtime/executor.py) gives per-operator rows +
    wall time — the EXPLAIN ANALYZE the reference never implemented
    (its operators don't carry a MetricsSet, SURVEY.md §5.5).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, List, Tuple

_SPANS: Dict[str, List[float]] = defaultdict(list)


@contextlib.contextmanager
def span(name: str):
    t0 = time.perf_counter()
    try:
        yield
    finally:
        _SPANS[name].append(time.perf_counter() - t0)


def span_report(reset: bool = False) -> List[Tuple[str, int, float, float]]:
    """-> [(name, count, total_s, mean_s)] sorted by total desc."""
    out = [(n, len(ts), sum(ts), sum(ts) / len(ts))
           for n, ts in _SPANS.items()]
    out.sort(key=lambda r: -r[2])
    if reset:
        _SPANS.clear()
    return out


@contextlib.contextmanager
def profile(log_dir: str):
    """Device-timeline profile (XPlane) viewable in TensorBoard/xprof."""
    import jax
    with jax.profiler.trace(log_dir):
        yield
