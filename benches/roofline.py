"""Per-operator roofline analysis (BASELINE.json: every operator within 1.3x
of its per-chip roofline).

On TPU v5e behind this relay, the binding resource for a vectorized query
engine is NOT flops and usually not raw HBM streaming bandwidth — it is the
per-index cost of random gather/scatter (~9 ns/idx, independent of locality
and row width; see docs/TPU_PERFORMANCE_NOTES.md). The honest roofline for
each operator is therefore the sum of its irreducible primitive costs, with
the primitives themselves measured on the same chip in the same session:

    gather(n)   n random indices, one int32 payload
    rowgather(n,W)  n indices into a packed [W, cap] matrix
    scatter(n)  n random scatter-set/add indices
    sort(n)     argsort of n int32
    stream(B)   elementwise pass over B bytes

Operator models (counts derived from the op implementations, n rows,
c candidates):
    build_csr      scatter(n) + sort(n)            [hash_table.py::build_csr]
    probe+match    gather(m) + scatter(m) + gather(c) + 2*gather(c)
                   [probe_ranges + expand + scalar key recheck]
    inner gather   2*gather(c) + 2*rowgather(c, W) [pairs_table composed]
    filter         sort-free: stream + scatter(n) + rowgather(k, W)
                   [compaction_indices cumsum+scatter, one packed gather]
    hash_aggregate sort(n) + gather(n) + boundary gathers (segmented sums are
                   prefix-sum diffs at segment boundaries) ~ 3*gather(g)
    sort_table     sort(n) + rowgather(n, W)

Run:  python benches/roofline.py          (real TPU; ~2 min warm cache)
Emits a table + JSON to results/roofline.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from datafusion_parallelism_tpu.ops import hash_table as ht
from datafusion_parallelism_tpu.ops.join import JoinType, hash_join
from datafusion_parallelism_tpu.ops.aggregate import (AggSpec,
                                                      hash_aggregate_counted)
from datafusion_parallelism_tpu.ops.sort import SortKey, sort_table
from datafusion_parallelism_tpu.utils.columnar import (HostTable, filter_rows,
                                                       replicate_rows_exact)

N = 1 << 22          # 4,194,304 rows — matches the Size512 headline scenario
ITERS = 10


def timeit(fn, *args, iters=None):
    """Median wall time of a jitted block with honest scalar-fetch sync."""
    iters = ITERS if iters is None else iters
    out = fn(*args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    # scalar fetch = the only true sync on relay devices
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(leaf.reshape(-1)[0])
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def measure_primitives(rng):
    """Per-index / per-element costs measured on this chip, this session."""
    idx = jnp.asarray(rng.integers(0, N, N).astype(np.int32))
    vals = jnp.asarray(rng.random(N).astype(np.float32))
    ivals = jnp.asarray(rng.integers(0, 1 << 30, N).astype(np.int32))
    packed13 = jnp.asarray(rng.integers(0, 1 << 30, (13, N)).astype(np.int32))

    null = timeit(jax.jit(lambda v: jnp.sum(v)), vals)  # launch+sync floor

    g1 = timeit(jax.jit(lambda v, i: jnp.sum(jnp.take(v, i, mode="clip"))),
                ivals, idx)
    rg13 = timeit(jax.jit(
        lambda p, i: jnp.sum(jnp.take(p, i, axis=1, mode="clip"))),
        packed13, idx)
    sc = timeit(jax.jit(
        lambda i: jnp.sum(jnp.zeros((N,), jnp.int32).at[i].add(1))), idx)
    # force FULL materialization of the permutation: argsort feeding only a
    # [-1] slice gets rewritten by XLA to a cheap reduction (measured 2-5 ms
    # "sorts" at 4M; the honest cost is ~30 ms, dtype-independent)
    iota = jnp.arange(N, dtype=jnp.int64)
    srt = timeit(jax.jit(lambda v: jnp.sum(
        jnp.argsort(v, stable=True).astype(jnp.int64) * iota)), ivals)
    return {
        "launch_s": null,
        "gather_ns": max(g1 - null, 1e-9) / N * 1e9,
        "rowgather13_ns": max(rg13 - null, 1e-9) / N * 1e9,
        "scatter_ns": max(sc - null, 1e-9) / N * 1e9,
        "sort4M_s": max(srt - null, 1e-9),
    }


def main():
    global N, ITERS
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=N)
    ap.add_argument("--iters", type=int, default=ITERS)
    ap.add_argument("--out", default="results/roofline.json")
    args = ap.parse_args()
    N, ITERS = args.rows, args.iters

    rng = np.random.default_rng(0)
    prim = measure_primitives(rng)
    launch = prim["launch_s"]
    g = prim["gather_ns"] * 1e-9
    rg = prim["rowgather13_ns"] * 1e-9   # W=13 row; narrow rows cost ~gather
    sc = prim["scatter_ns"] * 1e-9
    srt = prim["sort4M_s"]

    bk = rng.integers(0, N, N).astype(np.int32)
    pk = rng.integers(0, N, N).astype(np.int32)
    cols = {f"c{j}": rng.integers(0, 1 << 30, N).astype(np.int32)
            for j in range(12)}
    build = HostTable.from_numpy({"b_key": bk, **cols}).to_device()
    probe = HostTable.from_numpy({"p_key": pk,
                                  "p_val": rng.random(N).astype(np.float32)
                                  }).to_device()
    out_cap = N + N // 2

    rows = []

    def report(name, measured, model):
        measured = max(measured - launch, 1e-9)   # exclude fixed launch cost
        rows.append({"op": name, "measured_ms": measured * 1e3,
                     "roofline_ms": model * 1e3,
                     "ratio": measured / model})

    # --- build_csr: scatter(n) + sort(n) --------------------------------
    bh = jnp.asarray(rng.integers(0, 1 << 31, N).astype(np.uint32))
    ones = jnp.ones((N,), jnp.bool_)

    @jax.jit
    def f_build(h):
        t = ht.build_csr(h, ones, N)
        return t.perm[-1] + t.offsets[-1]

    report("build_csr", timeit(f_build, bh), sc * N + srt)

    # --- probe + candidate expansion + key recheck ----------------------
    table = jax.jit(lambda h: ht.build_csr(h, ones, N))(bh)
    ph = jnp.asarray(rng.integers(0, 1 << 31, N).astype(np.uint32))

    @jax.jit
    def f_probe(t, h):
        # bucket-descriptor fetch + candidate expansion + build-index gather:
        # the probe-side hot path shared by every join type (see join.py).
        # Mirrors the real fused path: the per-row offset rides the
        # replication row-gather; the perm deref is the second @c gather.
        cr = ht.probe_candidates(t, h, ones, N)
        rep = replicate_rows_exact((cr.start - cr.base)[None, :],
                                   cr.base, cr.count, out_cap)
        j = jnp.arange(out_cap, dtype=jnp.int32)
        build_idx = jnp.take(t.perm, rep[0] + j, mode="clip")
        return cr.total + jnp.sum(jnp.where(j < cr.total, build_idx, 0))

    c = out_cap
    # model: descriptor gather(N) + segment-start scatter(N) + the expansion
    # pair — fill-ids row-gather(c) + row fetch(c) (irreducible: expansion
    # must materialize positions, then fetch through them)
    report("probe_expand", timeit(f_probe, table, ph),
           g * N + sc * N + 2 * g * c)

    # --- full inner join (13-col build side, 2-col probe side) ----------
    @jax.jit
    def f_join(b, p):
        out, total = hash_join(b, p, ["b_key"], ["p_key"], JoinType.INNER,
                               out_cap)
        v, valid = out.column("c0")
        return jnp.sum(jnp.where(valid & out.row_mask(), v, 0)), total

    # model (deferred-materialization path, ops/join.py): build(scatter+sort)
    # + descriptor gather(N) + replicate(scatter(N) + fill gather(c)) + narrow
    # key/id gathers both sides (2c) + match compaction (argsort(c) + index
    # gather(c)) + final full-row fetches (rowgather13(c) + narrow(c))
    join_model = (sc * N + srt) + g * N + (sc * N + g * c) + 2 * g * c \
        + (srt * c / N + g * c) + (rg * c + g * c)
    report("inner_join_13col", timeit(f_join, build, probe), join_model)

    # --- filter (50% selectivity) + compaction --------------------------
    @jax.jit
    def f_filter(t):
        vals, _ = t.column("c0")
        mask = (vals & 1) == 0
        out = filter_rows(t, mask & t.row_mask())
        v, valid = out.column("c1")
        return jnp.sum(jnp.where(valid, v, 0)), out.num_rows

    # model: compaction_indices = stable argsort of the mask (survivors
    # first); gather_table pays one packed row-gather through it — the floor
    # is argsort(n) + rowgather13(n)
    report("filter_compact", timeit(f_filter, build), srt + rg * N)

    # --- hash aggregate (1 key, 2 aggs, 64k groups) ---------------------
    gk = rng.integers(0, 1 << 16, N).astype(np.int32)
    at = HostTable.from_numpy({"g": gk, "x": cols["c0"],
                               "y": rng.random(N).astype(np.float32)
                               }).to_device()

    @jax.jit
    def f_agg(t):
        out, count = hash_aggregate_counted(
            t, ["g"], [AggSpec("sum", "x", "sx"), AggSpec("max", "y", "my")],
            1 << 17)
        v, valid = out.column("sx")
        return jnp.sum(jnp.where(valid & out.row_mask(), v, 0)), count

    # model: sort(n) + the sorted-row fetch (~2 narrow-gather equivalents at
    # this width) + the boundary-position compaction (argsort(n))
    report("hash_aggregate", timeit(f_agg, at), 2 * srt + 2 * g * N)

    # --- sort (1 key, full table materialization) -----------------------
    @jax.jit
    def f_sort(t):
        out = sort_table(t, [SortKey("b_key", True)])
        v, valid = out.column("c0")
        return jnp.sum(jnp.where(valid & out.row_mask(), v, 0))

    report("sort_table_13col", timeit(f_sort, build), srt + rg * N)

    print(f"primitives: launch {launch*1e3:.1f} ms, gather "
          f"{prim['gather_ns']:.1f} ns/idx, rowgather13 "
          f"{prim['rowgather13_ns']:.1f} ns/row, scatter "
          f"{prim['scatter_ns']:.1f} ns/idx, argsort4M {srt*1e3:.1f} ms")
    print(f"{'op':20s} {'measured':>10s} {'roofline':>10s} {'ratio':>7s}")
    for r in rows:
        print(f"{r['op']:20s} {r['measured_ms']:9.1f}m {r['roofline_ms']:9.1f}m"
              f" {r['ratio']:6.2f}x")
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump({"rows": N, "primitives": prim, "operators": rows},
                  f, indent=2)
    worst = max(rows, key=lambda r: r["ratio"])
    print(json.dumps({"bench": "roofline", "rows": N,
                      "worst_op": worst["op"],
                      "worst_ratio": round(worst["ratio"], 3),
                      "ratios": {r["op"]: round(r["ratio"], 3)
                                 for r in rows}}), flush=True)


if __name__ == "__main__":
    main()
