"""Shared microbenchmark harness (criterion-equivalent).

Scenario parameters mirror the reference benches so numbers are
apples-to-apples by construction:
  * Size512   — 512 batches x 8192 rows (reference benches/build_speed.rs:38)
  * Size256   — 10,000 x 1024-row base cycling 256 id-blocks; dims 256x1024
                (reference benches/my_benchmark.rs:151-216)
  * exp-dist  — exponential skewed keys y=(16^x-1)/15
                (reference src/api_utils.rs:15-23)
"""

from __future__ import annotations

import json
import time

import numpy as np


def make_exponential_int_array(rng, n: int, max_value: int) -> np.ndarray:
    """Reference src/api_utils.rs:15-23: y = max * (16^x - 1) / 15, x~U[0,1]."""
    x = rng.random(n)
    return (max_value * (16.0 ** x - 1) / 15.0).astype(np.int64).clip(0, max_value - 1)


def timeit_block(fn, warmup: int = 2, iters: int = 10):
    """-> (best_s, mean_s). fn must SYNCHRONIZE by fetching a value to host
    (float()/int()/np.asarray) — on relay-backed devices block_until_ready
    can return before compute finishes."""
    for _ in range(warmup):
        fn()
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return min(times), sum(times) / len(times)


def report(name: str, rows: int, best_s: float, mean_s: float, extra=None):
    out = {"bench": name, "rows": rows,
           "best_ms": round(best_s * 1e3, 3),
           "mean_ms": round(mean_s * 1e3, 3),
           "rows_per_s": round(rows / best_s, 1)}
    if extra:
        out.update(extra)
    print(json.dumps(out), flush=True)
    return out
