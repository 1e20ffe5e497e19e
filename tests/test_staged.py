"""Staged execution: large multi-join plans run join subtrees in separate
launches with materialized boundaries (executor._run_staged). Forced on here
via DFP_STAGE_THRESHOLD_BYTES=0 and checked for (a) result equality with the
single-program path, (b) compiled-stage caching across run() calls, and
(c) per-stage overflow retries settling."""

import os

import pytest

from datafusion_parallelism_tpu import SessionConfig, SessionContext
from datafusion_parallelism_tpu.models.physical import find_joins

from oracle import assert_rows_equal

SQL = ("SELECT a_val, b_val, c_val FROM ta "
       "JOIN tb ON a_id = b_id JOIN tc ON b_id = c_id "
       "WHERE c_val > 6")

AGG_SQL = ("SELECT a_id, SUM(b_val) AS s, COUNT(*) AS n FROM ta "
           "JOIN tb ON a_id = b_id JOIN tc ON b_id = c_id "
           "GROUP BY a_id ORDER BY a_id")


def make_ctx():
    ctx = SessionContext(SessionConfig())
    n = 64
    ctx.register_pydict("ta", {
        "a_id": [i % 16 for i in range(n)],
        "a_val": list(range(n)),
    })
    ctx.register_pydict("tb", {
        "b_id": [i % 12 for i in range(n)],
        "b_val": [i * 2 for i in range(n)],
    })
    ctx.register_pydict("tc", {
        "c_id": [i % 8 for i in range(32)],
        "c_val": [i * 3 for i in range(32)],
    })
    return ctx


@pytest.fixture
def force_staged(monkeypatch):
    monkeypatch.setenv("DFP_STAGE_THRESHOLD_BYTES", "0")


def run_both(sql):
    single = make_ctx().sql(sql).collect().to_pylist()
    os.environ["DFP_STAGE_THRESHOLD_BYTES"] = "0"
    try:
        handle = make_ctx().sql(sql)
        staged = handle.collect().to_pylist()
    finally:
        del os.environ["DFP_STAGE_THRESHOLD_BYTES"]
    return single, staged, handle


def test_staged_matches_single_program():
    single, staged, handle = run_both(SQL)
    assert len(find_joins(handle.plan)) == 2  # actually a multi-join plan
    assert_rows_equal(staged, single)


def test_staged_aggregate_pipeline():
    single, staged, _ = run_both(AGG_SQL)
    assert staged == single  # ORDER BY: exact order must match too


def test_staged_compile_cache_across_runs(force_staged):
    handle = make_ctx().sql(SQL)
    first = handle.collect().to_pylist()
    compiles_after_first = handle.metrics.compile_count
    second = handle.collect().to_pylist()
    assert second == first
    # repeat run: every stage must hit the compiled-stage cache
    assert handle.metrics.compile_count == compiles_after_first


def test_staged_overflow_retry_settles(force_staged):
    handle = make_ctx().sql(SQL)
    rows = handle.collect().to_pylist()
    assert rows  # produced output
    # capacities settled: a second run does not retry further
    retries = handle.metrics.retries
    handle.collect()
    assert handle.metrics.retries == retries
