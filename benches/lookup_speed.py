"""Hash-join PROBE-phase microbenchmark over a pre-built table (reference
benches/lookup_speed.rs Size512).

    python benches/lookup_speed.py [--strategy csr|sort]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from benches.bench_lib import report, timeit_block


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=512 * 8192)
    ap.add_argument("--strategy", default="csr", choices=["csr", "sort"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from datafusion_parallelism_tpu.ops.hash_table import (JoinStrategy,
                                                           build_join_table,
                                                           probe_candidates)
    from datafusion_parallelism_tpu.ops.hashing import hash_rows

    n = args.rows
    out_cap = 2 * n
    rng = np.random.default_rng(0)
    bkeys = jnp.asarray(rng.integers(0, n, n).astype(np.int32))
    pkeys = jnp.asarray(rng.integers(0, n, n).astype(np.int32))
    valid = jnp.ones((n,), jnp.bool_)
    strat = JoinStrategy(args.strategy)

    import functools

    @jax.jit
    def build(bkeys):
        h = hash_rows([(bkeys, valid)])
        return build_join_table(h, valid, n, strat)

    table = jax.block_until_ready(build(bkeys))

    @jax.jit
    def probe(table, pkeys):
        ph = hash_rows([(pkeys, valid)])
        c = probe_candidates(table, ph, valid, n, out_cap)
        return c.total + jnp.sum(jnp.where(c.valid, c.build_idx, 0))

    best, mean = timeit_block(lambda: int(probe(table, pkeys)))
    report(f"lookup_speed/{args.strategy}/Size512", n, best, mean)


if __name__ == "__main__":
    main()
