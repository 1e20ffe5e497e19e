"""Skewed-key join benchmark (reference benches/exponential_distribution.rs):
build keys drawn from the exponential distribution y=(16^x-1)/15, probing a
uniform side — the scenario work stealing addresses on CPU and salted
repartitioning addresses here.

Single-chip run measures the vectorized join under skew; --mesh N runs the
distributed join on an N-device mesh with and without salting.

    python benches/exponential_distribution.py [--mesh 8] [--scenario all_equal|larger_probe]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from benches.bench_lib import make_exponential_int_array, report, timeit_block


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1 << 20)
    ap.add_argument("--scenario", default="all_equal",
                    choices=["all_equal", "larger_probe"])
    ap.add_argument("--mesh", type=int, default=0,
                    help="N>0: distributed join over an N-device mesh")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    n_build = args.rows
    n_probe = args.rows * (4 if args.scenario == "larger_probe" else 1)
    rng = np.random.default_rng(0)
    bk = make_exponential_int_array(rng, n_build, n_build).astype(np.int32)
    pk = rng.integers(0, n_build, n_probe).astype(np.int32)
    bv = rng.random(n_build).astype(np.float32)
    pv = rng.random(n_probe).astype(np.float32)

    from datafusion_parallelism_tpu.utils.columnar import HostTable
    build = HostTable.from_numpy({"b_key": bk, "b_val": bv})
    probe = HostTable.from_numpy({"p_key": pk, "p_val": pv})

    if args.mesh:
        from datafusion_parallelism_tpu.ops.join import JoinType
        from datafusion_parallelism_tpu.parallel import (DistJoinConfig,
                                                         distributed_hash_join,
                                                         make_mesh)
        mesh = make_mesh(args.mesh)
        for mode in ("partitioned", "skew_salted"):
            cfg = DistJoinConfig(mode=mode, join_type=JoinType.INNER,
                                 out_cap=8 * n_probe)
            # first call sizes capacities + compiles
            _, cfg = distributed_hash_join(mesh, build, probe,
                                           ["b_key"], ["p_key"], cfg)
            best, mean = timeit_block(
                lambda: distributed_hash_join(mesh, build, probe,
                                              ["b_key"], ["p_key"], cfg),
                warmup=1, iters=5)
            report(f"exp_dist/{args.scenario}/{mode}/mesh{args.mesh}",
                   n_build + n_probe, best, mean)
        return

    from datafusion_parallelism_tpu.ops.join import JoinType, hash_join
    bt, pt = build.to_device(), probe.to_device()
    out_cap = 8 * n_probe

    @jax.jit
    def step(bt, pt):
        out, total = hash_join(bt, pt, ["b_key"], ["p_key"],
                               JoinType.INNER, out_cap)
        v, valid = out.column("b_val")
        return jnp.sum(jnp.where(valid & out.row_mask(), v, 0.0)), total

    s, total = step(bt, pt)
    assert int(total) <= out_cap, f"grow out_cap: {int(total)}"
    best, mean = timeit_block(lambda: float(step(bt, pt)[0]))
    report(f"exp_dist/{args.scenario}/single", n_build + n_probe, best, mean,
           {"matches": int(total)})


if __name__ == "__main__":
    main()
