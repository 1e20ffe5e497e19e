"""Distributed SQL execution (target_partitions > 1) vs single-chip results.

Multi-chip version of the reference's end-to-end matrix: the same SQL must
return the same row multiset whether it runs on one device or sharded over
the virtual 8-device mesh.
"""

import numpy as np
import pytest

import datafusion_parallelism_tpu as dfp
from datafusion_parallelism_tpu import SessionConfig

from oracle import assert_rows_equal

N_DEV = 8


def _make_ctx(partitions):
    rng = np.random.default_rng(5)
    n_ord, n_cust = 400, 60
    cfg = SessionConfig(target_partitions=partitions)
    ctx = dfp.SessionContext(cfg)
    ctx.register_pydict("orders", {
        "o_id": list(range(n_ord)),
        "o_cust": [int(x) for x in rng.integers(0, 80, n_ord)],
        "amount": [round(float(x), 2) for x in rng.random(n_ord) * 100],
    })
    ctx.register_pydict("custs", {
        "c_id": list(range(n_cust)),
        "c_name": [f"c{i:03d}" for i in range(n_cust)],
        "c_grp": [int(x) for x in rng.integers(0, 5, n_cust)],
    })
    return ctx


QUERIES = [
    "SELECT c.c_grp, COUNT(*) AS n, SUM(o.amount) AS total, AVG(o.amount) AS av "
    "FROM custs c JOIN orders o ON c.c_id = o.o_cust "
    "GROUP BY c.c_grp ORDER BY total DESC",
    "SELECT c.c_name, o.amount FROM custs c LEFT JOIN orders o "
    "ON c.c_id = o.o_cust WHERE c.c_grp = 2 ORDER BY c.c_name, amount LIMIT 25",
    "SELECT o.o_id FROM orders o WHERE NOT EXISTS "
    "(SELECT * FROM custs c WHERE c.c_id = o.o_cust)",
    "SELECT DISTINCT c_grp FROM custs ORDER BY c_grp",
    "SELECT COUNT(*) AS n, SUM(amount) AS s, MIN(amount) AS mn, "
    "MAX(amount) AS mx, AVG(amount) AS av FROM orders WHERE amount > 50",
]


@pytest.mark.parametrize("q", range(len(QUERIES)))
def test_distributed_matches_single(q):
    single = _make_ctx(1).sql(QUERIES[q]).collect().to_pylist()
    dist = _make_ctx(N_DEV).sql(QUERIES[q]).collect().to_pylist()
    assert_rows_equal(dist, single)


def test_distributed_broadcast_mode_picked():
    ctx = _make_ctx(N_DEV)  # custs is tiny -> under broadcast_threshold
    h = ctx.sql(QUERIES[0])
    from datafusion_parallelism_tpu.models.physical import PHashJoin
    modes = [n.dist_mode for n in h.plan.walk() if isinstance(n, PHashJoin)]
    assert "broadcast" in modes


def test_distributed_skew_salted_sql():
    """Skewed probe keys through the SQL surface with salting enabled."""
    rng = np.random.default_rng(11)
    n = 600
    x = rng.random(n)
    skewed = ((30 * (16.0 ** x - 1) / 15.0)).astype(int).tolist()
    for salting in (False, True):
        cfg = SessionConfig(target_partitions=N_DEV, skew_salting=salting,
                            broadcast_threshold=0)
        ctx = dfp.SessionContext(cfg)
        ctx.register_pydict("probe", {"k": skewed, "v": list(range(n))})
        ctx.register_pydict("build", {"k2": list(range(32)),
                                      "w": [i * 10 for i in range(32)]})
        got = ctx.sql("SELECT SUM(b.w * p.v) AS s, COUNT(*) AS n FROM build b "
                      "JOIN probe p ON b.k2 = p.k").collect().to_pylist()
        expect = sum(k2 * 10 * v for v, k2 in enumerate(skewed) if k2 < 32)
        assert got[0]["n"] == sum(1 for k in skewed if k < 32)
        assert got[0]["s"] == expect
