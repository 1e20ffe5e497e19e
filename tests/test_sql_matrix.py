"""End-to-end SQL correctness matrix — the analog of reference
src/lib.rs:36-754 multi_tests!: every scenario runs under every join strategy
(our JoinReplacement axis), results are sorted before comparison, and
plan-shape assertions verify the optimizer actually chose the intended join
type (reference get_join_type, lib.rs:728-753) including the fake-statistics
steering trick (lib.rs:519-547)."""

import pytest

from datafusion_parallelism_tpu import SessionContext, SessionConfig
from datafusion_parallelism_tpu.models.physical import find_joins
from datafusion_parallelism_tpu.ops.hash_table import JoinStrategy
from datafusion_parallelism_tpu.ops.join import JoinType
from datafusion_parallelism_tpu.utils.catalog import Statistics

from oracle import assert_rows_equal, oracle_join

# all three user-selectable strategies run the full SQL matrix (the
# reference's per-version e2e matrix, lib.rs:36-45); OA was previously only
# covered at the raw hash_join level
STRATEGIES = [JoinStrategy.CSR, JoinStrategy.SORT, JoinStrategy.OA]


def make_ctx(strategy):
    ctx = SessionContext(SessionConfig(join_strategy=strategy))
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
    ctx.register_pydict("tn", {
        "n_id": [None if i % 5 == 0 else i % 16 for i in range(48)],
        "n_val": list(range(48)),
    })
    return ctx


def rows_of(ctx, name):
    return ctx.catalog.get(name).host.to_pylist()


@pytest.mark.parametrize("strategy", STRATEGIES)
def test_inner_join_no_filter(strategy):
    ctx = make_ctx(strategy)
    h = ctx.sql("SELECT a_val, b_val, c_val FROM ta "
                "JOIN tb ON a_id = b_id JOIN tc ON b_id = c_id")
    got = h.collect().to_pylist()
    ab = oracle_join(rows_of(ctx, "ta"), rows_of(ctx, "tb"),
                     ["a_id"], ["b_id"], "inner")
    abc = oracle_join(ab, rows_of(ctx, "tc"), ["b_id"], ["c_id"], "inner")
    expected = [{k: r[k] for k in ("a_val", "b_val", "c_val")} for r in abc]
    assert_rows_equal(got, expected)


@pytest.mark.parametrize("strategy", STRATEGIES)
def test_inner_join_with_nulls(strategy):
    ctx = make_ctx(strategy)
    h = ctx.sql("SELECT a_val, n_val FROM ta JOIN tn ON a_id = n_id")
    got = h.collect().to_pylist()
    e = oracle_join(rows_of(ctx, "ta"), rows_of(ctx, "tn"),
                    ["a_id"], ["n_id"], "inner")
    assert_rows_equal(got, [{k: r[k] for k in ("a_val", "n_val")} for r in e])


@pytest.mark.parametrize("strategy", STRATEGIES)
def test_inner_join_without_matches(strategy):
    ctx = make_ctx(strategy)
    ctx.register_pydict("tz", {"z_id": [100, 101], "z_val": [1, 2]})
    h = ctx.sql("SELECT a_val, z_val FROM ta JOIN tz ON a_id = z_id")
    assert h.collect().to_pylist() == []


@pytest.mark.parametrize("strategy", STRATEGIES)
def test_left_join(strategy):
    ctx = make_ctx(strategy)
    h = ctx.sql("SELECT a_val, c_val FROM ta LEFT JOIN tc ON a_id = c_id")
    got = h.collect().to_pylist()
    # SQL LEFT = preserve ta; engine LEFT refers to the build side, so use the
    # oracle with build=ta preserved
    e = oracle_join(rows_of(ctx, "ta"), rows_of(ctx, "tc"),
                    ["a_id"], ["c_id"], "left")
    assert_rows_equal(got, [{k: r.get(k) for k in ("a_val", "c_val")} for r in e])


@pytest.mark.parametrize("strategy", STRATEGIES)
def test_left_semi_join_via_exists(strategy):
    ctx = make_ctx(strategy)
    h = ctx.sql("SELECT a_val FROM ta WHERE EXISTS "
                "(SELECT * FROM tc WHERE tc.c_id = ta.a_id)")
    got = h.collect().to_pylist()
    e = oracle_join(rows_of(ctx, "ta"), rows_of(ctx, "tc"),
                    ["a_id"], ["c_id"], "left_semi")
    assert_rows_equal(got, [{"a_val": r["a_val"]} for r in e])
    jt = find_joins(h.plan)[0].join_type
    assert jt in (JoinType.LEFT_SEMI, JoinType.RIGHT_SEMI)


@pytest.mark.parametrize("strategy", STRATEGIES)
def test_left_anti_join_via_not_exists(strategy):
    ctx = make_ctx(strategy)
    h = ctx.sql("SELECT a_val FROM ta WHERE NOT EXISTS "
                "(SELECT * FROM tc WHERE tc.c_id = ta.a_id)")
    got = h.collect().to_pylist()
    e = oracle_join(rows_of(ctx, "ta"), rows_of(ctx, "tc"),
                    ["a_id"], ["c_id"], "left_anti")
    assert_rows_equal(got, [{"a_val": r["a_val"]} for r in e])


@pytest.mark.parametrize("strategy", STRATEGIES)
def test_exists_with_inner_filter(strategy):
    ctx = make_ctx(strategy)
    h = ctx.sql("SELECT a_val FROM ta WHERE EXISTS "
                "(SELECT * FROM tc WHERE tc.c_id = ta.a_id AND tc.c_val > 30)")
    got = h.collect().to_pylist()
    tc = [r for r in rows_of(ctx, "tc") if r["c_val"] > 30]
    e = oracle_join(rows_of(ctx, "ta"), tc, ["a_id"], ["c_id"], "left_semi")
    assert_rows_equal(got, [{"a_val": r["a_val"]} for r in e])


@pytest.mark.parametrize("strategy", STRATEGIES)
def test_right_join(strategy):
    ctx = make_ctx(strategy)
    h = ctx.sql("SELECT a_val, n_val FROM tn RIGHT JOIN ta ON n_id = a_id")
    got = h.collect().to_pylist()
    e = oracle_join(rows_of(ctx, "tn"), rows_of(ctx, "ta"),
                    ["n_id"], ["a_id"], "right")
    assert_rows_equal(got, [{k: r.get(k) for k in ("a_val", "n_val")} for r in e])


@pytest.mark.parametrize("strategy", STRATEGIES)
def test_full_join(strategy):
    ctx = make_ctx(strategy)
    ctx.register_pydict("tz", {"z_id": [0, 1, 2, 100], "z_val": [5, 6, 7, 8]})
    h = ctx.sql("SELECT c_val, z_val FROM tc FULL OUTER JOIN tz ON c_id = z_id")
    got = h.collect().to_pylist()
    e = oracle_join(rows_of(ctx, "tc"), rows_of(ctx, "tz"),
                    ["c_id"], ["z_id"], "full")
    assert_rows_equal(got, [{k: r.get(k) for k in ("c_val", "z_val")} for r in e])


@pytest.mark.parametrize("strategy", STRATEGIES)
def test_full_join_with_filter(strategy):
    # residual non-equi predicate on a FULL join (reference lib.rs:636-726)
    ctx = make_ctx(strategy)
    ctx.register_pydict("tz", {"z_id": [0, 1, 2, 100], "z_val": [5, 6, 7, 8]})
    h = ctx.sql("SELECT c_val, z_val FROM tc FULL OUTER JOIN tz "
                "ON c_id = z_id AND c_val < z_val")
    got = h.collect().to_pylist()
    e = oracle_join(rows_of(ctx, "tc"), rows_of(ctx, "tz"),
                    ["c_id"], ["z_id"], "full",
                    residual=lambda r: r["c_val"] < r["z_val"])
    assert_rows_equal(got, [{k: r.get(k) for k in ("c_val", "z_val")} for r in e])


def test_statistics_steer_build_side():
    # the reference's fake-statistics trick (lib.rs:519-547): registering the
    # outer table with huge fake row counts must flip the anti join so the
    # small inner side builds (RIGHT_ANTI instead of LEFT_ANTI)
    ctx = SessionContext()
    ctx.register_pydict("big", {"id": [1, 2, 3, 4], "v": [1, 2, 3, 4]},
                        statistics=Statistics(row_count=1_000_000))
    ctx.register_pydict("small", {"id": [1, 2], "w": [10, 20]},
                        statistics=Statistics(row_count=2))
    h = ctx.sql("SELECT v FROM big WHERE NOT EXISTS "
                "(SELECT * FROM small WHERE small.id = big.id)")
    jt = find_joins(h.plan)[0].join_type
    assert jt is JoinType.RIGHT_ANTI, h.explain()
    assert_rows_equal(h.collect().to_pylist(), [{"v": 3}, {"v": 4}])

    ctx2 = SessionContext()
    ctx2.register_pydict("big", {"id": [1, 2, 3, 4], "v": [1, 2, 3, 4]},
                         statistics=Statistics(row_count=2))
    ctx2.register_pydict("small", {"id": [1, 2], "w": [10, 20]},
                         statistics=Statistics(row_count=1_000_000))
    h2 = ctx2.sql("SELECT v FROM big WHERE NOT EXISTS "
                  "(SELECT * FROM small WHERE small.id = big.id)")
    assert find_joins(h2.plan)[0].join_type is JoinType.LEFT_ANTI, h2.explain()
    assert_rows_equal(h2.collect().to_pylist(), [{"v": 3}, {"v": 4}])


def test_in_subquery():
    ctx = SessionContext()
    ctx.register_pydict("t", {"x": [1, 2, 3, 4, 5]})
    ctx.register_pydict("u", {"y": [2, 4, 9]})
    h = ctx.sql("SELECT x FROM t WHERE x IN (SELECT y FROM u)")
    assert_rows_equal(h.collect().to_pylist(), [{"x": 2}, {"x": 4}])
    h2 = ctx.sql("SELECT x FROM t WHERE x NOT IN (SELECT y FROM u)")
    assert_rows_equal(h2.collect().to_pylist(),
                      [{"x": 1}, {"x": 3}, {"x": 5}])


def test_scalar_subquery():
    ctx = SessionContext()
    ctx.register_pydict("t", {"x": [1, 2, 3, 4, 5]})
    ctx.register_pydict("u", {"y": [3, 4]})
    h = ctx.sql("SELECT x FROM t WHERE x > (SELECT min(y) FROM u)")
    assert_rows_equal(h.collect().to_pylist(), [{"x": 4}, {"x": 5}])


def test_group_by_having_order():
    ctx = SessionContext()
    ctx.register_pydict("t", {"k": [1, 1, 2, 2, 2, 3], "v": [10, 20, 1, 2, 3, 9]})
    h = ctx.sql("SELECT k, sum(v) AS s, count(*) AS c FROM t "
                "GROUP BY k HAVING count(*) > 1 ORDER BY s DESC")
    rows = h.collect().to_pylist()
    assert rows == [{"k": 1, "s": 30, "c": 2}, {"k": 2, "s": 6, "c": 3}]


def test_overflow_retry_grows_capacity():
    # joint output far larger than inputs: many-to-many hot key
    ctx = SessionContext()
    n = 300
    ctx.register_pydict("l", {"k": [7] * n, "a": list(range(n))})
    ctx.register_pydict("r", {"k": [7] * n, "b": list(range(n))})
    h = ctx.sql("SELECT count(*) AS c FROM l JOIN r ON l.k = r.k")
    rows = h.collect().to_pylist()
    assert rows == [{"c": n * n}]
    assert h.metrics.retries >= 1  # initial cap must have overflowed


def test_distinct():
    ctx = SessionContext()
    ctx.register_pydict("t", {"x": [1, 2, 2, 3, 3, 3]})
    h = ctx.sql("SELECT DISTINCT x FROM t ORDER BY x")
    assert h.collect().to_pylist() == [{"x": 1}, {"x": 2}, {"x": 3}]


def test_four_way_star_join():
    # the reference's headline shape: one fact table joined to dim tables
    # (benches/my_benchmark.rs nested 4-way join)
    ctx = SessionContext()
    n = 128
    ctx.register_pydict("fact", {
        "d1": [i % 8 for i in range(n)],
        "d2": [i % 4 for i in range(n)],
        "d3": [i % 2 for i in range(n)],
        "m": list(range(n)),
    }, statistics=Statistics(row_count=n))
    ctx.register_pydict("dim1", {"k1": list(range(8)), "v1": [i * 10 for i in range(8)]},
                        statistics=Statistics(row_count=8))
    ctx.register_pydict("dim2", {"k2": list(range(4)), "v2": [i * 100 for i in range(4)]},
                        statistics=Statistics(row_count=4))
    ctx.register_pydict("dim3", {"k3": list(range(2)), "v3": [i * 1000 for i in range(2)]},
                        statistics=Statistics(row_count=2))
    h = ctx.sql("SELECT sum(m + v1 + v2 + v3) AS s FROM fact, dim1, dim2, dim3 "
                "WHERE d1 = k1 AND d2 = k2 AND d3 = k3")
    expected = sum(i + (i % 8) * 10 + (i % 4) * 100 + (i % 2) * 1000
                   for i in range(n))
    assert h.collect().to_pylist() == [{"s": expected}]


@pytest.mark.parametrize("strategy", STRATEGIES)
def test_aggregate_over_semi_join_fused(strategy):
    # aggregate directly over EXISTS (semi join): exercises the expanded
    # (late-materialized) join path — the join returns its input side +
    # match mask and the aggregate fuses the mask as a row filter
    ctx = make_ctx(strategy)
    h = ctx.sql("SELECT a_id, SUM(a_val) AS s, COUNT(*) AS c FROM ta "
                "WHERE EXISTS (SELECT * FROM tc WHERE tc.c_id = ta.a_id) "
                "GROUP BY a_id ORDER BY a_id")
    got = h.collect().to_pylist()
    sem = oracle_join(rows_of(ctx, "ta"), rows_of(ctx, "tc"),
                      ["a_id"], ["c_id"], "left_semi")
    exp = {}
    for r in sem:
        s, c = exp.get(r["a_id"], (0, 0))
        exp[r["a_id"]] = (s + r["a_val"], c + 1)
    expected = [{"a_id": k, "s": v[0], "c": v[1]} for k, v in sorted(exp.items())]
    assert got == expected


@pytest.mark.parametrize("strategy", STRATEGIES)
def test_global_aggregate_over_anti_join_fused(strategy):
    ctx = make_ctx(strategy)
    h = ctx.sql("SELECT SUM(a_val) AS s FROM ta WHERE NOT EXISTS "
                "(SELECT * FROM tc WHERE tc.c_id = ta.a_id)")
    got = h.collect().to_pylist()
    anti = oracle_join(rows_of(ctx, "ta"), rows_of(ctx, "tc"),
                       ["a_id"], ["c_id"], "left_anti")
    expected = sum(r["a_val"] for r in anti)
    assert got == [{"s": expected if anti else None}]


@pytest.mark.parametrize("strategy", STRATEGIES)
def test_aggregate_over_semi_join_with_extra_filter(strategy):
    # filter ON TOP of the semi join under the aggregate: both the
    # predicate and the join's match mask must fuse into one row filter
    ctx = make_ctx(strategy)
    h = ctx.sql("SELECT COUNT(*) AS c FROM ta WHERE a_val > 20 AND EXISTS "
                "(SELECT * FROM tc WHERE tc.c_id = ta.a_id)")
    got = h.collect().to_pylist()
    sem = oracle_join(rows_of(ctx, "ta"), rows_of(ctx, "tc"),
                      ["a_id"], ["c_id"], "left_semi")
    expected = sum(1 for r in sem if r["a_val"] > 20)
    assert got == [{"c": expected}]
