"""Headline benchmark: single-chip hash-join throughput (build + probe).

Scenario mirrors the reference's BuildSpeed/LookupSpeed `Size512` (512
batches x 8192 rows = 4,194,304 rows, uniform int keys — reference
benches/build_speed.rs:38,131-160, benches/lookup_speed.rs:122-141), fused
here into one end-to-end join step because on TPU build and probe are one
compiled program.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline compares against a vectorized numpy hash join measured once on
this machine's CPU and cached in BASELINE_MEASURED.json (the Rust reference
cannot run here — no cargo in the image — so an equivalent-methodology CPU
measurement stands in for it; BASELINE.md documents the gap).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

N_ROWS = 512 * 8192          # reference Size512
KEY_RANGE = N_ROWS           # ~1 match per probe row
OUT_CAP = N_ROWS + N_ROWS // 2   # ~1 match/row + <=cap/4 bucket collisions
ITERS = 20
BASELINE_PATH = os.path.join(os.path.dirname(__file__), "BASELINE_MEASURED.json")


def _make_inputs(rng):
    bk = rng.integers(0, KEY_RANGE, N_ROWS).astype(np.int32)
    bv = rng.random(N_ROWS).astype(np.float32)
    pk = rng.integers(0, KEY_RANGE, N_ROWS).astype(np.int32)
    pv = rng.random(N_ROWS).astype(np.float32)
    return bk, bv, pk, pv


def cpu_baseline_rows_per_s() -> float:
    """Vectorized numpy hash join (sort + searchsorted), same scenario."""
    rng = np.random.default_rng(0)
    bk, bv, pk, pv = _make_inputs(rng)
    t0 = time.perf_counter()
    order = np.argsort(bk, kind="stable")          # build
    sk = bk[order]
    lo = np.searchsorted(sk, pk, side="left")      # probe
    hi = np.searchsorted(sk, pk, side="right")
    count = hi - lo
    total = int(count.sum())
    probe_idx = np.repeat(np.arange(N_ROWS), count)
    offs = np.arange(total) - np.repeat(np.cumsum(count) - count, count)
    build_idx = order[np.repeat(lo, count) + offs]
    s = float(bv[build_idx].sum() + pv[probe_idx].sum())
    dt = time.perf_counter() - t0
    assert np.isfinite(s)
    return 2 * N_ROWS / dt


def tpu_rows_per_s() -> float:
    import jax
    import jax.numpy as jnp

    from datafusion_parallelism_tpu.ops.join import JoinType, hash_join
    from datafusion_parallelism_tpu.utils.columnar import HostTable

    rng = np.random.default_rng(0)
    bk, bv, pk, pv = _make_inputs(rng)
    build = HostTable.from_numpy({"b_key": bk, "b_val": bv}).to_device()
    probe = HostTable.from_numpy({"p_key": pk, "p_val": pv}).to_device()

    @jax.jit
    def step(build, probe):
        out, total = hash_join(build, probe, ["b_key"], ["p_key"],
                               JoinType.INNER, OUT_CAP)
        v, valid = out.column("b_val")
        return jnp.sum(jnp.where(valid & out.row_mask(), v, 0.0)), total

    s, total = step(build, probe)             # warm-up + compile
    assert int(total) <= OUT_CAP, f"out_cap overflow: {int(total)}"
    # scalar fetch per iteration: the only true synchronization on
    # relay-backed devices (block_until_ready can return before compute)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        s, total = step(build, probe)
        float(s)
    dt = time.perf_counter() - t0
    return ITERS * 2 * N_ROWS / dt


def _roofline_fields(line):
    """Attach measured/roofline ratios for the flagship join (<=1.3x target)
    from the committed interleaved-min artifact (benches/roofline.py ->
    results/roofline.json)."""
    roof_path = os.path.join(os.path.dirname(__file__), "results",
                             "roofline.json")
    if os.path.exists(roof_path):
        with open(roof_path) as f:
            ops = {o["op"]: o["ratio"] for o in json.load(f)["operators"]}
        if "inner_join_13col" in ops:
            line["roofline_ratio"] = round(ops["inner_join_13col"], 3)
        if ops:
            line["roofline_ratio_max"] = round(max(ops.values()), 3)
    return line


def _measure_guarded():
    """Run the TPU measurement in a subprocess under a hard timeout, with
    bounded retries.

    The observed failure mode of the relay-backed TPU is a HANG in backend
    init (not an exception), so an in-process try/except cannot bound it;
    a child process + timeout can. Three attempts with backoff; returns
    (value, None) or (None, error_string)."""
    attempts, backoff = 3, 30.0
    last_err = "unknown"
    for i in range(attempts):
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--_child"],
                capture_output=True, text=True, timeout=900)
            for ln in reversed(proc.stdout.strip().splitlines()):
                try:
                    d = json.loads(ln)
                except ValueError:
                    continue
                if "value" in d:
                    return d["value"], None
            last_err = ("rc=%d stderr_tail=%r"
                        % (proc.returncode, proc.stderr[-400:]))
        except subprocess.TimeoutExpired:
            last_err = "timeout after 900s (backend init hang or relay down)"
        if i + 1 < attempts:
            time.sleep(backoff)
            backoff *= 2
    return None, last_err


def main():
    if "--_child" in sys.argv:
        print(json.dumps({"value": tpu_rows_per_s()}))
        return 0
    if os.path.exists(BASELINE_PATH):
        with open(BASELINE_PATH) as f:
            baseline = json.load(f)["cpu_join_rows_per_s"]
    else:
        baseline = cpu_baseline_rows_per_s()
        with open(BASELINE_PATH, "w") as f:
            json.dump({"cpu_join_rows_per_s": baseline,
                       "scenario": "Size512 uniform-int inner join, "
                                   "numpy sort+searchsorted on host CPU"},
                      f, indent=2)
    value, err = _measure_guarded()
    if value is not None:
        line = {
            "metric": "hash_join_build_probe_throughput_size512",
            "value": round(value, 1),
            "unit": "rows/s",
            "vs_baseline": round(value / baseline, 3),
        }
    else:
        # Never leave the driver with nothing parseable: report the failure
        # plus the last committed evidence (roofline ratios below).
        line = {
            "metric": "hash_join_build_probe_throughput_size512",
            "value": None,
            "unit": "rows/s",
            "vs_baseline": None,
            "error": err,
            "last_committed_rows_per_s": 19831792.4,  # BENCH_r03.json
        }
    print(json.dumps(_roofline_fields(line)))
    return 0


if __name__ == "__main__":
    sys.exit(main())
