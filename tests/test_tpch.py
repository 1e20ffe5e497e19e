"""TPC-H end-to-end correctness: engine vs the independent Python oracle.

The analog of the reference's answer-check CSVs (tpc/src/main.rs:368-377),
run over the generated dataset at a small scale factor. All 22 queries run
in default CI — the hardest shapes (Q2/7/8/9/21, many-join plans) are
compile-bound on the CPU backend but amortize through the persistent
compile cache.
"""

import pytest

import datafusion_parallelism_tpu as dfp
from datafusion_parallelism_tpu.tpch import generate_tables, QUERIES
from datafusion_parallelism_tpu.tpch.oracle import oracle_query

from oracle import assert_rows_equal


@pytest.fixture(scope="module")
def dataset():
    tables = generate_tables(sf=0.002)
    ctx = dfp.SessionContext()
    for n, t in tables.items():
        ctx.register_table(n, t)
    return ctx, tables


@pytest.mark.parametrize("q", sorted(QUERIES))
def test_tpch_query(dataset, q):
    ctx, tables = dataset
    actual = ctx.sql(QUERIES[q]).collect().to_pylist()
    expected = oracle_query(q, tables)
    assert_rows_equal(actual, expected)
