"""Optimizer rules + observability surfaces."""

import datafusion_parallelism_tpu as dfp
from datafusion_parallelism_tpu import SessionConfig
from datafusion_parallelism_tpu.models.physical import (PFilter, PHashJoin,
                                                        PProject, PScan)
from datafusion_parallelism_tpu.utils.catalog import Statistics


def _ctx():
    ctx = dfp.SessionContext()
    ctx.register_pydict("wide", {
        "k": [1, 2, 3, 4], "a": [1, 2, 3, 4], "b": [5, 6, 7, 8],
        "c": [9, 10, 11, 12], "d": [13, 14, 15, 16],
    }, statistics=Statistics(row_count=4))
    ctx.register_pydict("dim", {"k2": [1, 2], "v": [10, 20]},
                        statistics=Statistics(row_count=2))
    return ctx


def test_prune_columns_narrows_scan():
    h = _ctx().sql("SELECT a FROM wide JOIN dim ON k = k2")
    # the scan of `wide` must be wrapped in a projection keeping only k, a
    for node in h.plan.walk():
        if isinstance(node, PScan) and node.table_name == "wide":
            raise AssertionError("scan not pruned:\n" + h.plan.tree())
        if isinstance(node, PProject) and isinstance(node.child, PScan) \
                and node.child.table_name == "wide":
            assert sorted(n.split(".")[-1] for n in node.schema.names) == ["a", "k"]
            break
    else:
        raise AssertionError("no pruning projection above wide")
    assert h.collect().to_pylist() == [{"a": 1}, {"a": 2}]


def test_coalesce_filters_single_node():
    h = _ctx().sql("SELECT a FROM wide WHERE a > 0 AND b > 0 AND c > 0")
    filters = [n for n in h.plan.walk() if isinstance(n, PFilter)]
    assert len(filters) == 1, h.plan.tree()
    assert len(h.collect().to_pylist()) == 4


def test_dist_mode_annotation():
    cfg = SessionConfig(target_partitions=1, broadcast_threshold=10)
    ctx = dfp.SessionContext(cfg)
    ctx.register_pydict("fact", {"k": list(range(100)), "m": list(range(100))},
                        statistics=Statistics(row_count=100_000))
    ctx.register_pydict("tiny", {"k2": [1, 2], "v": [1, 2]},
                        statistics=Statistics(row_count=2))
    h = ctx.sql("SELECT m FROM fact JOIN tiny ON k = k2")
    join = [n for n in h.plan.walk() if isinstance(n, PHashJoin)][0]
    assert join.dist_mode == "broadcast"


def test_analyze_and_tracing():
    from datafusion_parallelism_tpu.utils.tracing import span, span_report
    ctx = _ctx()
    h = ctx.sql("SELECT a FROM wide WHERE a > 1")
    with span("analyze"):
        out = h.analyze()
    assert "Filter" in out and "rows=3" in out
    rep = span_report(reset=True)
    assert rep and rep[0][0] == "analyze"


def test_metrics_populated():
    ctx = _ctx()
    h = ctx.sql("SELECT a FROM wide JOIN dim ON k = k2")
    h.collect()
    assert h.metrics.compile_count >= 1
    assert h.metrics.join_caps


def test_join_order_avoids_many_to_many_edge():
    """Cardinality-driven ordering (planner._order_joins): with a low-ndv
    edge (category, 3 distinct) and selective PK edges available, the
    many-to-many category join must come last — the old smallest-input
    heuristic joined dim x dim on category first (TPC-H Q5's supplier x
    customer nationkey blowup: 33.5M intermediate rows at SF1)."""
    import numpy as np

    from datafusion_parallelism_tpu import SessionContext
    from datafusion_parallelism_tpu.models.physical import PHashJoin

    rng = np.random.default_rng(0)
    # dims large enough that dim_a x dim_b on category (3 ndv) would produce
    # 400*600/3 = 80k rows, far above either PK-join path
    n_fact, n_a, n_b = 4000, 400, 600
    ctx = SessionContext()
    ctx.register_pydict("fact", {
        "f_a": rng.integers(0, n_a, n_fact).astype(int).tolist(),
        "f_b": rng.integers(0, n_b, n_fact).astype(int).tolist(),
        "f_v": rng.random(n_fact).tolist(),
    })
    ctx.register_pydict("dim_a", {
        "a_id": list(range(n_a)),
        "a_cat": [i % 3 for i in range(n_a)],
    })
    ctx.register_pydict("dim_b", {
        "b_id": list(range(n_b)),
        "b_cat": [i % 3 for i in range(n_b)],
    })
    h = ctx.sql(
        "SELECT SUM(f_v) AS s FROM fact, dim_a, dim_b "
        "WHERE f_a = a_id AND f_b = b_id AND a_cat = b_cat")
    # bottom-most join must NOT be the dim_a x dim_b category edge
    joins = [n for n in h.plan.walk() if isinstance(n, PHashJoin)]
    deepest = joins[-1]
    keys = set(deepest.build_keys + deepest.probe_keys)
    assert not {"dim_a.a_cat", "dim_b.b_cat"} <= keys, (
        f"many-to-many category join placed first: {deepest.describe()}")
    # and the result matches the oracle
    rows = h.collect().to_pylist()
    a_cat = {i: i % 3 for i in range(n_a)}
    b_cat = {i: i % 3 for i in range(n_b)}
    t = ctx.catalog.get("fact").host.to_pylist()
    expected = sum(r["f_v"] for r in t if a_cat[r["f_a"]] == b_cat[r["f_b"]])
    assert abs(rows[0]["s"] - expected) < 1e-6
