"""TPC-H end-to-end correctness: engine vs the independent Python oracle.

The analog of the reference's answer-check CSVs (tpc/src/main.rs:368-377),
run over the generated dataset at a small scale factor. The slowest queries
(many-join plans: compile-bound on the CPU test backend) only run when
RUN_SLOW_TPCH=1.
"""

import os

import pytest

import datafusion_parallelism_tpu as dfp
from datafusion_parallelism_tpu.tpch import generate_tables, QUERIES
from datafusion_parallelism_tpu.tpch.oracle import oracle_query

from oracle import assert_rows_equal

SLOW = {2, 7, 8, 9, 21}
RUN_SLOW = os.environ.get("RUN_SLOW_TPCH") == "1"


@pytest.fixture(scope="module")
def dataset():
    tables = generate_tables(sf=0.002)
    ctx = dfp.SessionContext()
    for n, t in tables.items():
        ctx.register_table(n, t)
    return ctx, tables


@pytest.mark.parametrize("q", sorted(QUERIES))
def test_tpch_query(dataset, q):
    if q in SLOW and not RUN_SLOW:
        pytest.skip("slow TPC-H query; set RUN_SLOW_TPCH=1")
    ctx, tables = dataset
    actual = ctx.sql(QUERIES[q]).collect().to_pylist()
    expected = oracle_query(q, tables)
    assert_rows_equal(actual, expected)
