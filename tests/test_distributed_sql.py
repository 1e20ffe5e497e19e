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
