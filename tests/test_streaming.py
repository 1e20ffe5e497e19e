"""Morsel-streaming execution: streamed results must equal materialized ones.

The streamed path (runtime/streaming.py) chunks the biggest scan through the
plan with per-chunk partial aggregation; these tests force it on tiny data
(threshold 0, small chunks so every query crosses multiple chunk boundaries)
and compare against the default whole-table execution — the same
sorted-multiset equality contract the reference's test matrix uses
(reference src/lib.rs:756-792)."""

import os

import pytest

import datafusion_parallelism_tpu as dfp
from datafusion_parallelism_tpu.tpch.datagen import generate_tables
from datafusion_parallelism_tpu.tpch.queries import QUERIES

from oracle import assert_rows_equal


@pytest.fixture(scope="module")
def tables():
    return generate_tables(sf=0.01)


def _ctx(tables):
    ctx = dfp.SessionContext()
    for n, t in tables.items():
        ctx.register_table(n, t)
    return ctx


def _run_both(tables, sql, monkeypatch, chunk_rows=2048):
    ctx = _ctx(tables)
    monkeypatch.delenv("DFP_STREAM_THRESHOLD_BYTES", raising=False)
    plain = ctx.sql(sql).collect().to_pylist()

    monkeypatch.setenv("DFP_STREAM_THRESHOLD_BYTES", "0")
    monkeypatch.setenv("DFP_STREAM_CHUNK_ROWS", str(chunk_rows))
    handle = _ctx(tables).sql(sql)
    streamed = handle.collect().to_pylist()
    return plain, streamed, handle.metrics


# TPC-H queries whose plans are stream-eligible (top aggregate, lineitem
# probe-side row-linear): the core scan-agg and join-agg shapes.
@pytest.mark.parametrize("q", [1, 3, 5, 6, 10])
def test_tpch_streamed_matches(tables, q, monkeypatch):
    plain, streamed, m = _run_both(tables, QUERIES[q], monkeypatch)
    assert_rows_equal(streamed, plain)
    assert m.streamed_chunks > 1, "streaming did not engage / single chunk"


@pytest.mark.parametrize("q", [21])
def test_ineligible_falls_back(tables, q, monkeypatch):
    # Q21 scans lineitem three times (self-joins): chunking one scan leaves
    # the others whole, so the forced threshold must fall back to
    # materialized execution silently
    plain, streamed, m = _run_both(tables, QUERIES[q], monkeypatch)
    assert_rows_equal(streamed, plain)
    assert m.streamed_chunks == 0


@pytest.mark.parametrize("q", [12, 8, 9])
def test_side_swap_unlocks_streaming(tables, q, monkeypatch):
    # These plans put lineitem on a BUILD side (the filtered sibling is
    # smaller, so the cost-based choice builds lineitem); the side-swap rule
    # flips the symmetric joins at stream time so lineitem probes — the
    # statistics-steered build-side move of the reference (lib.rs:519-547)
    plain, streamed, m = _run_both(tables, QUERIES[q], monkeypatch)
    assert_rows_equal(streamed, plain)
    assert m.streamed_chunks > 1, f"Q{q} did not stream via side-swap"


def test_streamed_global_aggregate(monkeypatch):
    data = {"k": list(range(10000)), "v": [float(i % 97) for i in range(10000)]}
    ctx = dfp.SessionContext()
    ctx.register_pydict("t", data)
    monkeypatch.setenv("DFP_STREAM_THRESHOLD_BYTES", "0")
    monkeypatch.setenv("DFP_STREAM_CHUNK_ROWS", "1024")
    handle = ctx.sql("SELECT SUM(v) AS s, COUNT(*) AS c, MIN(v) AS lo, "
                     "MAX(v) AS hi, AVG(v) AS a FROM t WHERE k % 2 = 0")
    [row] = handle.collect().to_pylist()
    import numpy as np
    v = np.array(data["v"])[np.arange(10000) % 2 == 0]
    assert row["c"] == 5000
    assert abs(row["s"] - v.sum()) < 1e-6
    assert row["lo"] == v.min() and row["hi"] == v.max()
    assert abs(row["a"] - v.mean()) < 1e-9
    assert handle.metrics.streamed_chunks == 10000 // 1024 + 1


def _skewed_pydict_ctx():
    """custs (small, build) + orders (big, streamed probe): orders covers
    only half the customers so every build-emitting join type has deferred
    (unmatched-build) rows, and some orders reference missing customers so
    FULL has unmatched probe rows too."""
    import random
    rng = random.Random(7)
    n_orders = 20000
    custs = {"id": list(range(200)), "grp": [i % 7 for i in range(200)]}
    orders = {"oid": list(range(n_orders)),
              # only customers 0..99 appear; 5% dangling keys (>= 200)
              "cust": [rng.randrange(100) if rng.random() > 0.05
                       else 200 + rng.randrange(50) for _ in range(n_orders)],
              "v": [float(i % 13) for i in range(n_orders)]}
    ctx = dfp.SessionContext()
    ctx.register_pydict("custs", custs)
    ctx.register_pydict("orders", orders)
    return ctx


# Build-emitting join types stream via the cross-chunk visited mask + flush
# pass (reference full.rs:77-201's bitset outliving every probe batch).
_VISITED_SQL = {
    "left": ("SELECT c.grp AS g, COUNT(o.v) AS cnt, SUM(o.v) AS s "
             "FROM custs c LEFT JOIN orders o ON c.id = o.cust GROUP BY c.grp"),
    "full": ("SELECT COUNT(*) AS n, SUM(o.v) AS s, MIN(c.grp) AS mg "
             "FROM custs c FULL JOIN orders o ON c.id = o.cust"),
    "left_semi": ("SELECT c.grp AS g, COUNT(*) AS cnt FROM custs c WHERE "
                  "EXISTS (SELECT 1 FROM orders o WHERE o.cust = c.id) "
                  "GROUP BY c.grp"),
    "left_anti": ("SELECT c.grp AS g, COUNT(*) AS cnt FROM custs c WHERE "
                  "NOT EXISTS (SELECT 1 FROM orders o WHERE o.cust = c.id) "
                  "GROUP BY c.grp"),
}


@pytest.mark.parametrize("jt", sorted(_VISITED_SQL))
def test_streamed_visited_join_types(jt, monkeypatch):
    sql = _VISITED_SQL[jt]
    monkeypatch.delenv("DFP_STREAM_THRESHOLD_BYTES", raising=False)
    plain = _skewed_pydict_ctx().sql(sql).collect().to_pylist()
    monkeypatch.setenv("DFP_STREAM_THRESHOLD_BYTES", "0")
    monkeypatch.setenv("DFP_STREAM_CHUNK_ROWS", "2048")
    handle = _skewed_pydict_ctx().sql(sql)
    streamed = handle.collect().to_pylist()
    assert_rows_equal(streamed, plain)
    assert handle.metrics.streamed_chunks > 1, \
        f"{jt} did not stream (chunks={handle.metrics.streamed_chunks})"


def test_streamed_q13_double_aggregate(tables, monkeypatch):
    # Q13: LEFT join with residual filter under TWO stacked aggregates — the
    # merge point is the LOWEST aggregate; the outer one runs at finish
    plain, streamed, m = _run_both(tables, QUERIES[13], monkeypatch)
    assert_rows_equal(streamed, plain)
    assert m.streamed_chunks > 1


def test_streamed_join_overflow_retry(tables, monkeypatch):
    # tiny chunk + capacity store disabled: the join inside the chunk
    # program must overflow, grow, and retry the CURRENT chunk only
    monkeypatch.setenv("DFP_NO_CAP_STORE", "1")
    plain, streamed, m = _run_both(tables, QUERIES[3], monkeypatch,
                                   chunk_rows=1024)
    assert_rows_equal(streamed, plain)
    assert m.streamed_chunks > 1
