"""Grace-partitioned out-of-core execution (runtime/grace.py).

Key-hash partitioning must reproduce whole-table results for the plan
shapes row-range streaming cannot decompose: self-joins of the big table
(Q2/Q17/Q18/Q21) and two-huge-table joins (Q7). Forced on tiny data via a
low row threshold (3000 rows: lineitem/orders/partsupp partition, the
dimension tables stay resident — the same relative structure as SF100) and
small partitions so every query crosses many partition boundaries; results
compared against the independent Python oracle — the reference's
sorted-multiset equality contract (src/lib.rs:756-792)."""

import pytest

import datafusion_parallelism_tpu as dfp
from datafusion_parallelism_tpu.tpch.datagen import generate_tables
from datafusion_parallelism_tpu.tpch.oracle import oracle_query
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


def _force_grace(monkeypatch, chunk_rows=2048):
    monkeypatch.setenv("DFP_STREAM_ROW_THRESHOLD", "3000")
    monkeypatch.setenv("DFP_STREAM_CHUNK_ROWS", str(chunk_rows))
    # scaled analog of the SF100 default (96M): partsupp (8k rows at
    # sf 0.01) may demote to residency, lineitem/orders may not
    monkeypatch.setenv("DFP_GRACE_RESIDENT_CEILING", "20000")
    monkeypatch.setenv("DFP_FORCE_GRACE", "1")


# Q17/Q18/Q21 self-join lineitem, Q2 self-joins partsupp, Q7 joins the two
# biggest tables — none is row-range streamable (plan_stream rejects all 5).
# Q8/Q9/Q12 stream only via the side-swap; under FORCE_GRACE they partition
# (Q9 through the partsupp demotion). Q20's huge-group subquery uses the
# mask merge.
@pytest.mark.parametrize("q", [17, 18, 21, 2, 7, 8, 9, 12, 20])
def test_grace_tpch_matches_oracle(tables, q, monkeypatch):
    _force_grace(monkeypatch)
    ctx = _ctx(tables)
    h = ctx.sql(QUERIES[q])
    got = h.collect().to_pylist()
    assert_rows_equal(got, oracle_query(q, tables))
    assert h.metrics.streamed_chunks > 1, \
        f"Q{q} did not run grace-partitioned (chunks=" \
        f"{h.metrics.streamed_chunks})"


def test_grace_eligibility(tables, monkeypatch):
    from datafusion_parallelism_tpu.runtime.grace import plan_grace

    monkeypatch.setenv("DFP_GRACE_RESIDENT_CEILING", "20000")
    ctx = _ctx(tables)
    expect = {
        17: ({"lineitem": "l_partkey"}, "agg"),
        18: ({"lineitem": "l_orderkey", "orders": "o_orderkey"}, "agg"),
        21: ({"lineitem": "l_orderkey", "orders": "o_orderkey"}, "agg"),
        2: ({"partsupp": "ps_partkey"}, "union"),
        7: ({"lineitem": "l_orderkey", "orders": "o_orderkey"}, "agg"),
        8: ({"lineitem": "l_orderkey", "orders": "o_orderkey"}, "agg"),
        # Q9: partsupp (under the demotion ceiling) goes resident so that
        # lineitem/orders can agree on the orderkey partitioning
        9: ({"lineitem": "l_orderkey", "orders": "o_orderkey"}, "agg"),
        12: ({"lineitem": "l_orderkey", "orders": "o_orderkey"}, "agg"),
        # Q20: semi-selection of resident suppliers -> visited-mask merge
        20: (None, "mask"),
    }
    for q, (cols, kind) in expect.items():
        h = _ctx(tables).sql(QUERIES[q])
        gp, reason = plan_grace(h.plan, ctx.catalog, 3000)
        assert gp is not None, f"Q{q} grace-ineligible: {reason}"
        if cols is not None:
            got = {s.table_name: c for s, c in gp.parts.values()}
            assert got == cols, f"Q{q}: {got} != {cols}"
        assert gp.kind == kind, f"Q{q}: kind {gp.kind} != {kind}"


def test_grace_self_join_semi_with_rows(monkeypatch):
    """Q18's shape with data dense enough that the semi join and both
    aggregates produce NONZERO rows through several partitions (the TPC-H
    instance at sf 0.01 yields an empty result — a weak check on its own)."""
    n = 20000
    t = {"k": [i % 500 for i in range(n)],           # 500 join keys
         "c": [i % 7 for i in range(n)],
         "v": [float(i % 11) for i in range(n)]}
    expected = {}
    # oracle: per-key sums, keys over threshold, then group c sums over rows
    ksum = {}
    for i in range(n):
        ksum[t["k"][i]] = ksum.get(t["k"][i], 0.0) + t["v"][i]
    hot = {k for k, s in ksum.items() if s > 200.0}
    assert 0 < len(hot) < 500
    for i in range(n):
        if t["k"][i] in hot:
            expected[t["c"][i]] = expected.get(t["c"][i], 0.0) + t["v"][i]
    exp_rows = [{"c": c, "s": s} for c, s in expected.items()]

    monkeypatch.setenv("DFP_STREAM_ROW_THRESHOLD", "1000")
    monkeypatch.setenv("DFP_STREAM_CHUNK_ROWS", "2048")
    ctx = dfp.SessionContext()
    ctx.register_pydict("t", t)
    h = ctx.sql("SELECT c, SUM(v) AS s FROM t WHERE k IN "
                "(SELECT k FROM t GROUP BY k HAVING SUM(v) > 200.0) "
                "GROUP BY c")
    got = h.collect().to_pylist()
    assert_rows_equal(got, exp_rows)
    assert h.metrics.streamed_chunks > 1


def test_grace_rejects_unkeyed_self_join(tables, monkeypatch):
    """A self-join NOT keyed by a common column cannot partition; the
    executor must silently fall back to resident execution and still be
    correct."""
    _force_grace(monkeypatch)
    sql = ("SELECT COUNT(*) AS n FROM lineitem l1, lineitem l2 "
           "WHERE l1.l_orderkey = l2.l_partkey AND l1.l_linenumber = 7 "
           "AND l2.l_linenumber = 7 AND l1.l_quantity > 49")
    h = _ctx(tables).sql(sql)
    from datafusion_parallelism_tpu.runtime.grace import plan_grace
    gp, reason = plan_grace(h.plan, _ctx(tables).catalog, 3000)
    # l1 partitions by l_orderkey, l2 by l_partkey -> two partitionings of
    # the same table
    assert gp is None and "partition" in reason
    got = h.collect().to_pylist()
    monkeypatch.delenv("DFP_STREAM_ROW_THRESHOLD")
    plain = _ctx(tables).sql(sql).collect().to_pylist()
    assert_rows_equal(got, plain)
