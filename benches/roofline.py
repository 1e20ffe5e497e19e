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


ROUNDS = 3


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


class Interleaved:
    """Drift-robust measurement: the device's throughput wanders 10-40%
    between programs and minutes (documented in CLAUDE.md; observed: the
    same W=14 gather measuring 92 / 122 / 166 ms across three sessions in
    one hour). Timing every item in ROUNDS interleaved passes inside ONE
    process and keeping each item's MINIMUM round-median makes primitives
    and operators comparable — both get their best window, so their RATIO
    is stable even when absolute throughput is not."""

    def __init__(self):
        self.items = []            # (name, fn, args)

    def add(self, name, fn, *args):
        self.items.append((name, fn, args))

    def run(self):
        best = {}
        for _ in range(ROUNDS):
            for name, fn, args in self.items:
                t = timeit(fn, *args)
                best[name] = min(best.get(name, t), t)
        return best


def register_primitives(il: "Interleaved", rng):
    """Per-index / per-element costs measured on this chip, this session.

    Width matters in steps, not linearly (measured on v5e): W=1 gathers
    cost ~6.7 ns/idx, W=2-4 narrow rows ~3.4-5.3, a cliff to ~14 at W=5-8,
    ~22 at W=13-15. int64 cells gather at ~15 ns/idx (emulated as split
    planes) — which is why the engine packs 64-bit values as int32 row
    PAIRS everywhere. The primitives below anchor the operator models:
      gather   W=1 int32 (per index)
      gather4  W=4 int32 rows (the narrow regime: replication fills,
               candidate key fetches, sorted-aggregate row fetches)
      gather2big  [2, 4N] int32 rows at N indices (the CSR bucket
               descriptor fetch — bigger tables gather slightly slower)
      rowgather13  W=13 packed rows (full-width materialization)
      scatter  narrow int32 scatter-add
      sort     stable int32 argsort (radix; int64 keys are 10x slower)
      cumsum   int64 prefix sum (the segmented-reduction stream pass)
    """
    idx = jnp.asarray(rng.integers(0, N, N).astype(np.int32))
    vals = jnp.asarray(rng.random(N).astype(np.float32))
    ivals = jnp.asarray(rng.integers(0, 1 << 30, N).astype(np.int32))
    packed13 = jnp.asarray(rng.integers(0, 1 << 30, (13, N)).astype(np.int32))
    packed4 = packed13[:4]
    big2 = jnp.asarray(rng.integers(0, 1 << 30, (2, 4 * N)).astype(np.int32))
    bigidx = jnp.asarray(rng.integers(0, 4 * N, N).astype(np.int32))

    il.add("launch", jax.jit(lambda v: jnp.sum(v)), vals)  # launch floor
    il.add("g1", jax.jit(lambda v, i: jnp.sum(jnp.take(v, i, mode="clip"))),
           ivals, idx)
    il.add("g4", jax.jit(
        lambda p, i: jnp.sum(jnp.take(p, i, axis=1, mode="clip"))),
        packed4, idx)
    il.add("g2b", jax.jit(
        lambda p, i: jnp.sum(jnp.take(p, i, axis=1, mode="clip"))),
        big2, bigidx)
    il.add("rg13", jax.jit(
        lambda p, i: jnp.sum(jnp.take(p, i, axis=1, mode="clip"))),
        packed13, idx)
    il.add("sc", jax.jit(
        lambda i: jnp.sum(jnp.zeros((N,), jnp.int32).at[i].add(1))), idx)
    # force FULL materialization of the permutation: argsort feeding only a
    # [-1] slice gets rewritten by XLA to a cheap reduction; sum(perm*iota)
    # needs every element. (int32 radix argsort is genuinely ~4 ms at 4M —
    # aggregate.py measured ~2 ms int32 vs 42 ms int64 independently.)
    iota = jnp.arange(N, dtype=jnp.int64)
    il.add("srt", jax.jit(lambda v: jnp.sum(
        jnp.argsort(v, stable=True).astype(jnp.int64) * iota)), ivals)
    # TWO-key stable sort with an index payload: the EXACT grouping sort
    # (aggregate.py sorts (zone, key word, iota) — a hash-only single-key
    # sort silently split colliding groups, so the extra operand is the
    # price of correctness and the model must carry it)
    iota32 = jnp.arange(N, dtype=jnp.int32)
    k2 = jnp.asarray(rng.integers(0, 3, N).astype(np.int32))

    def two_key(a, b):
        res = jax.lax.sort((a, b, iota32), dimension=0, is_stable=True,
                           num_keys=2)
        return jnp.sum(res[2].astype(jnp.int64) * iota)

    il.add("srt2", jax.jit(two_key), k2, ivals)
    v64 = jnp.asarray(rng.integers(0, 1000, N).astype(np.int64))
    il.add("cs", jax.jit(lambda v: jnp.sum(jnp.cumsum(v) * iota)), v64)


def finish_primitives(best) -> dict:
    null = best["launch"]
    return {
        "launch_s": null,
        "gather_ns": max(best["g1"] - null, 1e-9) / N * 1e9,
        "gather4_ns": max(best["g4"] - null, 1e-9) / N * 1e9,
        "gather2big_ns": max(best["g2b"] - null, 1e-9) / N * 1e9,
        "rowgather13_ns": max(best["rg13"] - null, 1e-9) / N * 1e9,
        "scatter_ns": max(best["sc"] - null, 1e-9) / N * 1e9,
        "sort4M_s": max(best["srt"] - null, 1e-9),
        "sort2key4M_s": max(best["srt2"] - null, 1e-9),
        "cumsum4M_s": max(best["cs"] - null, 1e-9),
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
    il = Interleaved()
    register_primitives(il, rng)

    bk = rng.integers(0, N, N).astype(np.int32)
    pk = rng.integers(0, N, N).astype(np.int32)
    cols = {f"c{j}": rng.integers(0, 1 << 30, N).astype(np.int32)
            for j in range(12)}
    build = HostTable.from_numpy({"b_key": bk, **cols}).to_device()
    probe = HostTable.from_numpy({"p_key": pk,
                                  "p_val": rng.random(N).astype(np.float32)
                                  }).to_device()
    out_cap = N + N // 2
    c = out_cap

    # --- build_csr -------------------------------------------------------
    bh = jnp.asarray(rng.integers(0, 1 << 31, N).astype(np.uint32))
    ones = jnp.ones((N,), jnp.bool_)

    @jax.jit
    def f_build(h):
        t = ht.build_csr(h, ones, N)
        return t.perm[-1] + t.offsets[-1]

    il.add("build_csr", f_build, bh)

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

    il.add("probe_expand", f_probe, table, ph)

    # --- full inner join (13-col build side, 2-col probe side) ----------
    @jax.jit
    def f_join(b, p):
        out, total = hash_join(b, p, ["b_key"], ["p_key"], JoinType.INNER,
                               out_cap)
        v, valid = out.column("c0")
        return jnp.sum(jnp.where(valid & out.row_mask(), v, 0)), total

    il.add("inner_join_13col", f_join, build, probe)

    # --- filter (50% selectivity) + compaction --------------------------
    @jax.jit
    def f_filter(t):
        vals, _ = t.column("c0")
        mask = (vals & 1) == 0
        out = filter_rows(t, mask & t.row_mask())
        v, valid = out.column("c1")
        return jnp.sum(jnp.where(valid, v, 0)), out.num_rows

    il.add("filter_compact", f_filter, build)

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

    il.add("hash_aggregate", f_agg, at)

    # --- sort (1 key, full table materialization) -----------------------
    @jax.jit
    def f_sort(t):
        out = sort_table(t, [SortKey("b_key", True)])
        v, valid = out.column("c0")
        return jnp.sum(jnp.where(valid & out.row_mask(), v, 0))

    il.add("sort_table_13col", f_sort, build)

    # ---- interleaved measurement, then models from the same-run
    # primitives (see Interleaved: min-of-rounds neutralizes the device's
    # 10-40% between-program throughput drift)
    best = il.run()
    prim = finish_primitives(best)
    launch = prim["launch_s"]
    g = prim["gather_ns"] * 1e-9
    g4 = prim["gather4_ns"] * 1e-9       # narrow multi-row regime (W<=4)
    g2b = prim["gather2big_ns"] * 1e-9   # bucket-descriptor fetch
    rg = prim["rowgather13_ns"] * 1e-9   # full-width packed rows
    sc = prim["scatter_ns"] * 1e-9
    srt = prim["sort4M_s"]
    srt2 = prim["sort2key4M_s"]          # exact grouping sort (2 keys)
    cs = prim["cumsum4M_s"]

    rows = []

    def report(name, model):
        measured = max(best[name] - launch, 1e-9)  # exclude fixed launch
        rows.append({"op": name, "measured_ms": measured * 1e3,
                     "roofline_ms": model * 1e3,
                     "ratio": measured / model})

    # build_csr: bucket-count scatter(n) + bucket-order sort(n)
    report("build_csr", sc * N + srt)
    # probe_expand: descriptor 2-row gather(N) + count cumsum + segment-
    # start scatter(N) + the expansion pair — fill-ids row-gather(c) + row
    # fetch(c) (irreducible: expansion must materialize positions, then
    # fetch through them)
    report("probe_expand", g2b * N + cs + sc * N + 2 * g * c)
    # inner join (deferred-materialization path, ops/join.py):
    # build(scatter+sort) + bucket-descriptor 2-row gather(N) + narrow
    # key+id permute into bucket order (W<=4 rows, N) + replicate
    # (scatter(N) + fill gather(c) carrying the probe keys) + candidate
    # key+id fetch at pos (narrow, c) + match compaction (argsort(c) +
    # compacted-id pair gather(c)) + final full-row fetches (build
    # rowgather13(c) + probe narrow(c))
    report("inner_join_13col",
           (sc * N + srt) + g2b * N + g4 * N
           + (sc * N + g4 * c) + g4 * c
           + (srt * c / N + g4 * c) + (rg * c + g4 * c))
    # filter: compaction_indices = stable argsort of the mask (survivors
    # first); one packed row-gather through it — argsort(n) + rowgather13(n)
    report("filter_compact", srt + rg * N)
    # aggregate: EXACT grouping sort (2-key lax.sort — value sort, not
    # hash; the hash-injective single-key sort silently split colliding
    # groups and was removed) + the sorted-row fetch (W=4 packed row:
    # 3 value slots + validity word) + boundary-position compaction
    # (argsort(n)) + the segmented-sum prefix passes (2 aggs + count)
    report("hash_aggregate", srt2 + srt + g4 * N + 3 * cs)
    # sort: one multi-key sort + full-width row materialization
    report("sort_table_13col", srt + rg * N)

    print(f"primitives: launch {launch*1e3:.1f} ms, gather "
          f"{prim['gather_ns']:.1f} ns/idx, gather4 "
          f"{prim['gather4_ns']:.1f}, gather2big "
          f"{prim['gather2big_ns']:.1f}, rowgather13 "
          f"{prim['rowgather13_ns']:.1f} ns/row, scatter "
          f"{prim['scatter_ns']:.1f} ns/idx, argsort4M {srt*1e3:.1f} ms, "
          f"cumsum4M {cs*1e3:.2f} ms")
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
