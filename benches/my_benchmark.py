"""End-to-end 4-way nested join benchmark — the reference's headline
criterion bench (reference benches/my_benchmark.rs:122-216, `Size256`):

  * base table: 10,000 batches x 1024 rows = 10,240,000 rows with id1..id4,
    each cycling 256 unique 1024-id blocks, id_k shifted by k so the columns
    differ; plus a constant string column.
  * four dim tables of 256 x 1024 = 262,144 rows (above the reference's
    broadcast-join threshold), id shifted by the table number, plus a random
    32-char string column (pruned by the projection, as in the reference).
  * query: the same right-deep nested 4-join selecting the four id columns
    (every base row matches exactly once per dim table -> 10.24M output rows).

    python benches/my_benchmark.py [--base-batches 10000] [--iterations 5]
"""

import argparse
import os
import string
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from benches.bench_lib import report

BATCHES = 256
BATCH_SIZE = 1024

SQL = """
SELECT result.id1, result.id2, result.id3, result.id4
  FROM small_table_4
  JOIN (
    SELECT result.id1, result.id2, result.id3, result.id4
    FROM small_table_3
    JOIN (
      SELECT result.id1, result.id2, result.id3, result.id4
      FROM small_table_2
      JOIN (
        SELECT base_table.id1, base_table.id2, base_table.id3, base_table.id4
        FROM small_table_1
        JOIN base_table
        ON base_table.id1 = small_table_1.id
      ) AS result
      ON result.id2 = small_table_2.id
    ) AS result
    ON result.id3 = small_table_3.id
  ) AS result
  ON result.id4 = small_table_4.id
"""


def make_tables(base_batches: int, rng):
    # base: batch i holds ids (i%256)*1024 .. +1024, column k shifted by k
    # (reference make_int_array_with_shift, api_utils.rs)
    i = np.arange(base_batches, dtype=np.int64) % BATCHES
    starts = np.repeat(i * BATCH_SIZE, BATCH_SIZE)
    offs = np.tile(np.arange(BATCH_SIZE, dtype=np.int64), base_batches)
    base_ids = (starts + offs).astype(np.int32)
    base = {f"id{k}": base_ids + k for k in range(1, 5)}
    base["note"] = ["hello"] * len(base_ids)

    dim_ids = np.arange(BATCHES * BATCH_SIZE, dtype=np.int32)
    letters = np.array(list(string.ascii_lowercase))
    dims = {}
    for k in range(1, 5):
        rand_str = ["".join(c) for c in
                    letters[rng.integers(0, 26, (len(dim_ids), 32))]]
        dims[f"small_table_{k}"] = {"id": dim_ids + k, "payload": rand_str}
    return base, dims


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--base-batches", type=int, default=10_000)
    ap.add_argument("--iterations", type=int, default=5)
    args = ap.parse_args()

    from datafusion_parallelism_tpu import SessionContext

    rng = np.random.default_rng(0)
    base, dims = make_tables(args.base_batches, rng)
    ctx = SessionContext()
    ctx.register_pydict("base_table", base)
    for name, data in dims.items():
        ctx.register_pydict(name, data)

    handle = ctx.sql(SQL)
    n_base = args.base_batches * BATCH_SIZE

    def once():
        out = handle.run()
        return int(out.num_rows)  # host fetch = true synchronization

    rows = once()  # settle capacities + compile
    assert rows == n_base, f"expected {n_base} output rows, got {rows}"
    times = []
    for _ in range(args.iterations):
        t0 = time.perf_counter()
        once()
        times.append(time.perf_counter() - t0)
    report("my_benchmark/Size256/4way_nested_join", n_base,
           min(times), sum(times) / len(times),
           extra={"compiles": handle.metrics.compile_count,
                  "retries": handle.metrics.retries})


if __name__ == "__main__":
    main()
