"""Hash-join BUILD-phase microbenchmark (reference benches/build_speed.rs:
Size512 = 512 batches x 8192 rows, build only, NoopConsumer analog).

    python benches/build_speed.py [--strategy csr|sort] [--rows N]
"""

import argparse
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from benches.bench_lib import report, timeit_block


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=512 * 8192)
    ap.add_argument("--strategy", default="csr",
                    choices=["csr", "sort", "oa"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from datafusion_parallelism_tpu.ops.hash_table import (JoinStrategy,
                                                           build_join_table)
    from datafusion_parallelism_tpu.ops.hashing import hash_rows

    n = args.rows
    rng = np.random.default_rng(0)
    keys = jnp.asarray(rng.integers(0, n, n).astype(np.int32))
    valid = jnp.ones((n,), jnp.bool_)
    strat = JoinStrategy(args.strategy)

    @jax.jit
    def build(keys):
        h = hash_rows([(keys, valid)])
        table = build_join_table(h, valid, n, strat)
        return table.perm[0] + table.offsets[0]

    best, mean = timeit_block(lambda: int(build(keys)))
    report(f"build_speed/{args.strategy}/Size512", n, best, mean)


if __name__ == "__main__":
    main()
