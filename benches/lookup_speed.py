"""Hash-join PROBE-phase microbenchmark over a pre-built table (reference
benches/lookup_speed.rs Size512).

Measures the full probe-lookup path: bucket-descriptor fetch
(probe_candidates), candidate expansion (replicate_rows_exact), and the
build-index gather — the vectorized analog of the reference's per-row
chain walk (src/shared/shared.rs:29-47).

    python benches/lookup_speed.py [--strategy csr|sort] [--rows N]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from benches.bench_lib import report_stats, timeit_stats


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=512 * 8192)
    ap.add_argument("--strategy", default="csr",
                    choices=["csr", "sort", "oa"])
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from datafusion_parallelism_tpu.ops.hash_table import (JoinStrategy,
                                                           build_join_table,
                                                           probe_candidates)
    from datafusion_parallelism_tpu.ops.hashing import hash_rows
    from datafusion_parallelism_tpu.utils.columnar import replicate_rows_exact

    n = args.rows
    out_cap = 2 * n
    rng = np.random.default_rng(0)
    bkeys = jnp.asarray(rng.integers(0, n, n).astype(np.int32))
    pkeys = jnp.asarray(rng.integers(0, n, n).astype(np.int32))
    valid = jnp.ones((n,), jnp.bool_)
    strat = JoinStrategy(args.strategy)

    @jax.jit
    def build(bkeys):
        h = hash_rows([(bkeys, valid)])
        return build_join_table(h, valid, n, strat)

    table = jax.block_until_ready(build(bkeys))

    @jax.jit
    def probe(table, pkeys):
        ph = hash_rows([(pkeys, valid)])
        cr = probe_candidates(table, ph, valid, n)
        # expand the per-row ranges into flat candidate slots and fetch the
        # matching build indices — the join's probe-side hot path
        sidecar = jnp.stack([jnp.arange(n, dtype=jnp.int32),
                             cr.start - cr.base], axis=0)
        rep = replicate_rows_exact(sidecar, cr.base, cr.count, out_cap)
        j = jnp.arange(out_cap, dtype=jnp.int32)
        pos = rep[1] + j
        build_idx = jnp.take(table.perm, pos, mode="clip")
        cand = j < cr.total
        return cr.total + jnp.sum(jnp.where(cand, build_idx, 0))

    stats = timeit_stats(lambda: int(probe(table, pkeys)), iters=args.iters)
    report_stats(f"lookup_speed/{args.strategy}/Size512", n, stats)


if __name__ == "__main__":
    main()
