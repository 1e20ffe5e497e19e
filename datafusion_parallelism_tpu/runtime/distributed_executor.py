"""Distributed query executor: the whole physical plan as ONE SPMD program.

Where the single-chip executor traces the plan into one XLA program
(runtime/executor.py), this wraps the same plan in `shard_map` over the
partition mesh — the analog of the reference running one plan across N
tokio partition streams (reference src/operator/parallel_hash_join.rs:140-152),
with collectives standing in for its shared-memory rendezvous:

  * scans read per-device row shards (hash/contiguous partitioned tables);
  * every hash join shuffles both children by key hash over ICI, then runs
    the single-chip vectorized join on its key range (all 8 types correct:
    each key lives on exactly one device);
  * aggregates run two-phase: local partial -> shuffle partials by group-key
    hash -> merge -> finish (AVG decomposes into SUM+COUNT);
  * ORDER BY all-gathers the (post-aggregate, small) result and sorts on
    every device, keeping rows only on device 0 so the host-side gather
    yields them exactly once.

Send capacities are safe by construction in this version (a shard never
sends more rows than its own capacity), trading memory for zero
overflow-retries; join output capacities reuse the grow-and-recompile loop.
"""

from __future__ import annotations

import time
from functools import partial as fpartial
from typing import Dict

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

from ..models.physical import (ExecContext, PAggregate, PFilter, PHashJoin,
                               PLimit, PProject, PScan, PSort, PhysicalPlan,
                               find_joins)
from ..ops.aggregate import (decompose_for_partial, finish_partial,
                             hash_aggregate)
from ..ops.filter import filter_table
from ..ops.join import hash_join
from ..ops.project import project_table
from ..ops.sort import limit_table, sort_table
from ..parallel.distributed import _all_gather_table
from ..parallel.mesh import PARTITION_AXIS, make_mesh
from ..parallel.shuffle import (gather_shards, local_table, partition_table,
                                shuffle_by_hash, unlocal_table)
from ..utils.columnar import DeviceTable, HostTable, round_capacity
from .executor import ExecutorMetrics, QueryHandle


def execute_dist(node: PhysicalPlan, tables: Dict[str, DeviceTable],
                 ctx: ExecContext, axis: str) -> DeviceTable:
    """Per-device execution of a plan node (call inside shard_map)."""
    if isinstance(node, PScan):
        return tables[node.label]
    if isinstance(node, PFilter):
        out, _ = filter_table(execute_dist(node.child, tables, ctx, axis),
                              node.predicate)
        return out
    if isinstance(node, PProject):
        return project_table(execute_dist(node.child, tables, ctx, axis),
                             node.exprs, node.out_fields)
    if isinstance(node, PHashJoin):
        b = execute_dist(node.build, tables, ctx, axis)
        p = execute_dist(node.probe, tables, ctx, axis)
        P_ = lax.psum(1, axis)

        def send_cap(tag, t):
            # adaptive per-destination send block: ~4x the balanced share;
            # dropped-row counts grow it on retry (capped at shard capacity,
            # which can never drop rows)
            key = (node.join_id, tag)
            cap = ctx.join_caps.get(key)
            if cap is None:
                cap = min(t.capacity, max(1024, 4 * (t.capacity // max(P_, 1))))
                ctx.join_caps[key] = cap
            return cap

        bdrop = pdrop = jnp.int32(0)
        if node.dist_mode == "broadcast":
            b2, p2 = _all_gather_table(b, axis), p
        elif node.dist_mode == "skew_salted":
            from ..parallel.shuffle import replicating_shuffle
            from ..parallel.skew import (build_replication_mask,
                                         heavy_buckets, key_histogram,
                                         salted_route)
            hist = key_histogram(p, node.probe_keys, axis)
            heavy = heavy_buckets(hist)
            rep = build_replication_mask(b, node.build_keys, heavy)
            # replicated rows can land everywhere: keep the safe capacity
            b2, _ = replicating_shuffle(b, node.build_keys, b.capacity, rep,
                                        axis)
            dest, _ = salted_route(p, node.probe_keys, heavy, axis)
            p2, pdrop = shuffle_by_hash(p, node.probe_keys,
                                        send_cap("ps", p), axis,
                                        dest_override=dest)
        else:
            b2, bdrop = shuffle_by_hash(b, node.build_keys,
                                        send_cap("bs", b), axis)
            p2, pdrop = shuffle_by_hash(p, node.probe_keys,
                                        send_cap("ps", p), axis)
        ctx.join_totals[(node.join_id, "bs")] = bdrop
        ctx.join_totals[(node.join_id, "ps")] = pdrop
        cap = ctx.join_caps.get(node.join_id)
        if cap is None:
            cap = max(256, 2 * max(b2.capacity, p2.capacity))
            ctx.join_caps[node.join_id] = cap
        residual_fn = None
        if node.residual is not None:
            res = node.residual
            residual_fn = lambda pair_tbl: res.eval(pair_tbl)[:2]
        out, total = hash_join(b2, p2, node.build_keys, node.probe_keys,
                               node.join_type, cap, strategy=node.strategy,
                               residual=residual_fn)
        ctx.join_totals[node.join_id] = lax.pmax(total, axis)
        return out
    if isinstance(node, PAggregate):
        child = execute_dist(node.child, tables, ctx, axis)
        if not node.aggs and node.group_keys:
            # pure dedup (DISTINCT / count-distinct stage 1): co-partition
            # then local dedup — keys live on exactly one device
            shuffled, _ = shuffle_by_hash(child, node.group_keys,
                                          child.capacity, axis)
            return hash_aggregate(shuffled, node.group_keys, [])
        partial_specs, merge_specs, finishers = decompose_for_partial(node.aggs)
        partial = hash_aggregate(child, node.group_keys, partial_specs)
        if node.group_keys:
            shuffled, _ = shuffle_by_hash(partial, node.group_keys,
                                          partial.capacity, axis)
            merged = hash_aggregate(shuffled, node.group_keys, merge_specs)
        else:
            gathered = _all_gather_table(partial, axis)
            merged = hash_aggregate(gathered, [], merge_specs)
            # every device holds the same global row: keep it once
            me = lax.axis_index(axis)
            merged = DeviceTable(merged.schema, merged.columns,
                                 jnp.where(me == 0, merged.num_rows, 0))
        return finish_partial(merged, node.group_keys, node.aggs, finishers,
                              child.schema)
    if isinstance(node, PSort):
        child = execute_dist(node.child, tables, ctx, axis)
        full = _all_gather_table(child, axis)
        out = sort_table(full, node.keys)
        me = lax.axis_index(axis)
        return DeviceTable(out.schema, out.columns,
                           jnp.where(me == 0, out.num_rows, 0))
    if isinstance(node, PLimit):
        return limit_table(execute_dist(node.child, tables, ctx, axis), node.n)
    raise NotImplementedError(type(node))


class DistributedQueryHandle(QueryHandle):
    """QueryHandle that executes over a device mesh. Same public surface:
    run() -> DeviceTable-equivalent HostTable via collect()."""

    def __init__(self, plan, catalog, scalar_subqueries=(), config=None,
                 mesh=None):
        super().__init__(plan, catalog, scalar_subqueries, config)
        self.mesh = mesh or make_mesh(config.target_partitions)
        self.axis = self.mesh.axis_names[0]

    def run(self):
        raise NotImplementedError("distributed handle returns host tables; "
                                  "use collect()")

    def collect(self) -> HostTable:
        # cached like QueryHandle.run (re-tracing per collect is seconds)
        if self._sub_handles is None:
            self._sub_handles = [
                QueryHandle(sub.plan, self.catalog, sub.scalar_subqueries,
                            self.config)
                for _, sub in self.scalar_subqueries]
        for (sv, _), handle in zip(self.scalar_subqueries,
                                   self._sub_handles):
            result = handle.run().to_host()
            rows = result.to_pylist()
            if len(rows) != 1:
                raise ValueError(f"scalar subquery returned {len(rows)} rows")
            sv.holder[0] = rows[0][result.schema.fields[0].name]

        Pn = self.mesh.devices.size
        sharded = {}   # label -> (cols, num_rows, schema)
        for node in self.plan.walk():
            if isinstance(node, PScan) and node.label not in sharded:
                host = self.catalog.get(node.table_name).host
                renamed = HostTable(
                    node.schema,
                    {f"{node.label}.{c}": v for c, v in host.columns.items()},
                    host.num_rows)
                cols, nrows, schema, _ = partition_table(renamed, Pn)
                sharded[node.label] = (cols, nrows, schema)

        labels = sorted(sharded)
        leaf_cols = [sharded[l][0] for l in labels]
        leaf_rows = [sharded[l][1] for l in labels]
        schemas = {l: sharded[l][2] for l in labels}
        joins = find_joins(self.plan)
        # per join: candidate total + build/probe shuffle dropped-row counts
        keys = []
        for j in joins:
            keys += [j.join_id, (j.join_id, "bs"), (j.join_id, "ps")]
        plan, axis = self.plan, self.axis

        # multi-process SPMD (true multi-host): every process holds the full
        # host tables and materializes only its mesh slice; outputs come
        # back via a cross-process allgather (parallel/multihost.py)
        multiproc = jax.process_count() > 1
        if multiproc:
            from ..parallel.multihost import allgather_tree, globalize_tree
            leaf_cols = globalize_tree(leaf_cols, self.mesh, axis)
            leaf_rows = globalize_tree(leaf_rows, self.mesh, axis)

        while True:
            caps = dict(self._caps)

            @fpartial(jax.shard_map, mesh=self.mesh,
                      in_specs=(P(axis), P(axis)),
                      out_specs=(P(axis), P(axis), P()))
            def step(leaf_cols, leaf_rows, _caps=caps):
                tables = {l: local_table(schemas[l], c, r)
                          for l, c, r in zip(labels, leaf_cols, leaf_rows)}
                ctx = ExecContext(_caps)
                out = execute_dist(plan, tables, ctx, axis)
                totals = jnp.stack(
                    [jnp.asarray(ctx.join_totals.get(k, 0), jnp.int32)
                     for k in keys]) if keys else jnp.zeros((0,), jnp.int32)
                ocols, onum = unlocal_table(out)
                return ocols, onum, totals

            t0 = time.time()
            compiled = jax.jit(step).lower(leaf_cols, leaf_rows).compile()
            self._caps.update(caps)
            self.metrics.compile_count += 1
            self.metrics.compile_time_s += time.time() - t0
            t0 = time.time()
            ocols, onum, totals = compiled(leaf_cols, leaf_rows)
            if multiproc:
                ocols = allgather_tree(ocols)
                onum = allgather_tree(onum)
            totals = [int(t) for t in totals]  # host fetch = true sync
            self.metrics.run_time_s += time.time() - t0

            overflow = False
            for k, total in zip(keys, totals):
                if isinstance(k, tuple):
                    if total > 0:  # dropped shuffle rows: double the block
                        self._caps[k] = 2 * self._caps[k]
                        overflow = True
                elif total > self._caps[k]:
                    self._caps[k] = round_capacity(total)
                    overflow = True
            self.metrics.join_caps = dict(self._caps)
            if not overflow:
                return gather_shards(plan.schema, ocols, onum)
            self.metrics.retries += 1
