"""Streaming x distribution COMPOSED: morsel-streamed execution over the
virtual 8-device mesh must equal single-chip materialized execution.

Per chunk the host packs/uploads shard slices while devices shuffle the
previous chunk to each frozen build's key range, probe, and fold partial
aggregates into per-device accumulators (runtime/distributed_streaming.py)
— the BASELINE config-#5 shape (out-of-core scale on N devices with
shuffle/compute overlap). Build-emitting joins stream with per-device
visited masks + flush passes."""

import os

import pytest

import datafusion_parallelism_tpu as dfp
from datafusion_parallelism_tpu import SessionConfig
from datafusion_parallelism_tpu.tpch.datagen import generate_tables
from datafusion_parallelism_tpu.tpch.queries import QUERIES

from oracle import assert_rows_equal

N_DEV = 8


@pytest.fixture(scope="module")
def tables():
    return generate_tables(sf=0.01)


def _ctx(tables, partitions):
    ctx = dfp.SessionContext(SessionConfig(target_partitions=partitions))
    for n, t in tables.items():
        ctx.register_table(n, t)
    return ctx


def _run_both(tables, sql, monkeypatch, chunk_rows=2048):
    monkeypatch.setenv("DFP_STREAM_THRESHOLD_BYTES", str(1 << 60))
    plain = _ctx(tables, 1).sql(sql).collect().to_pylist()
    monkeypatch.setenv("DFP_STREAM_THRESHOLD_BYTES", "0")
    monkeypatch.setenv("DFP_STREAM_CHUNK_ROWS", str(chunk_rows))
    handle = _ctx(tables, N_DEV).sql(sql)
    streamed = handle.collect().to_pylist()
    return plain, streamed, handle.metrics


# scan-agg, join-agg, 5-join chain, LEFT + double aggregate (Q13)
@pytest.mark.parametrize("q", [1, 3, 5, 13])
def test_tpch_streamed_distributed(tables, q, monkeypatch):
    plain, streamed, m = _run_both(tables, QUERIES[q], monkeypatch)
    assert_rows_equal(streamed, plain)
    assert m.streamed_chunks > 1, "distributed streaming did not engage"
    assert m.comm_bytes > 0, "no collective volume recorded"


def test_streamed_distributed_timeline_overlap(tables, monkeypatch):
    """The per-chunk timeline must show DOUBLE BUFFERING: chunk i+1's host
    pack/upload window starts before chunk i is validated (i.e. while its
    device compute is still in flight)."""
    _, _, m = _run_both(tables, QUERIES[3], monkeypatch)
    tl = m.stream_timeline
    packs = {e["chunk"]: e for e in tl if e["event"] == "pack_upload"}
    validated = {e["chunk"]: e for e in tl if e["event"] == "validated"}
    overlapped = sum(
        1 for c, e in packs.items()
        if c - 1 in validated and e["t0"] < validated[c - 1]["t"])
    assert overlapped > 0, "no pack/compute overlap observed in timeline"


def test_streamed_distributed_visited_semi_anti(monkeypatch):
    import random
    rng = random.Random(3)
    n = 20000
    custs = {"id": list(range(300)), "grp": [i % 5 for i in range(300)]}
    orders = {"oid": list(range(n)),
              "cust": [rng.randrange(150) if rng.random() > 0.04
                       else 300 + rng.randrange(40) for _ in range(n)],
              "v": [float(i % 11) for i in range(n)]}

    def mk(p):
        ctx = dfp.SessionContext(SessionConfig(target_partitions=p))
        ctx.register_pydict("custs", custs)
        ctx.register_pydict("orders", orders)
        return ctx

    for sql in [
        "SELECT c.grp AS g, COUNT(o.v) AS cnt, SUM(o.v) AS s FROM custs c "
        "LEFT JOIN orders o ON c.id = o.cust GROUP BY c.grp",
        "SELECT c.grp AS g, COUNT(*) AS cnt FROM custs c WHERE NOT EXISTS "
        "(SELECT 1 FROM orders o WHERE o.cust = c.id) GROUP BY c.grp",
        # FULL: per-chunk RIGHT emission (pairs + the chunk's own unmatched
        # probe rows) + deferred unmatched build rows from the flush
        "SELECT COUNT(*) AS n, SUM(o.v) AS s, MIN(c.grp) AS mg FROM custs c "
        "FULL JOIN orders o ON c.id = o.cust",
    ]:
        monkeypatch.setenv("DFP_STREAM_THRESHOLD_BYTES", str(1 << 60))
        plain = mk(1).sql(sql).collect().to_pylist()
        monkeypatch.setenv("DFP_STREAM_THRESHOLD_BYTES", "0")
        monkeypatch.setenv("DFP_STREAM_CHUNK_ROWS", "2048")
        handle = mk(N_DEV).sql(sql)
        streamed = handle.collect().to_pylist()
        assert_rows_equal(streamed, plain)
        assert handle.metrics.streamed_chunks > 1
