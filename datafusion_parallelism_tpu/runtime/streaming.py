"""Morsel-streaming execution: chunk the biggest scan through the plan.

TPU-native restoration of the reference's streaming dataflow: its probe side
is *pipelined* — batches from the probe stream map through the join against a
frozen build side one at a time (reference
src/operator/probe_lookup_implementation/inner.rs:48-75) with bounded queues
upstream (reference src/operator/work_stealing_repartition_exec.rs:308-329).
Our single-program executor instead materializes every table in HBM, which
caps the scale factor at what HBM holds (~15.75 GB on v5e).

This module streams ONE designated scan (the largest — TPC-H lineitem)
through the compiled plan in fixed-size chunks: per chunk, upload → filter/
project/probe → PARTIAL aggregate; an on-device merge folds each chunk's
partials into an accumulator (the same decompose_for_partial machinery the
distributed two-phase aggregate uses). HBM holds the resident (non-streamed)
tables, one chunk, and the accumulator — out-of-core execution for
SF100-class inputs on a single chip.

Correctness requires the streamed scan to be ROW-LINEAR into the top
aggregate:
  * Filter / Project are row-wise;
  * a join is linear in its PROBE side exactly when emitted rows are a
    function of each probe row independently: INNER, RIGHT (pairs plus the
    chunk's own unmatched probe rows), RIGHT_SEMI, RIGHT_ANTI. Build-side
    emitting types (LEFT*/FULL) have visited semantics that span chunks and
    disqualify the plan;
  * the build side of every join on the path must not contain the streamed
    scan, and no second aggregate may sit between the scan and the top one.
The chunk program is compiled once (all chunks share shapes); join/filter
capacity overflows retry the CURRENT chunk only, aggregate-capacity overflow
restarts the stream with the grown capacity.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass
from typing import Dict, List, Optional


import jax
import jax.numpy as jnp

from ..models.physical import (ExecContext, PAggregate, PFilter, PHashJoin,
                               PLimit, PProject, PScan, PSort, PhysicalPlan)
from ..ops.aggregate import (agg_output_schema, decompose_for_partial,
                             finish_partial, hash_aggregate_counted)
from ..ops.join import JoinType, prepare_build
from ..ops.project import project_table
from ..ops.sort import limit_table, sort_table
from ..utils.columnar import (DeviceTable, PackedTable, Schema, concat_tables,
                              pack_host_slice, round_capacity, unpack_table)

_LINEAR_JOIN_TYPES = (JoinType.INNER, JoinType.RIGHT, JoinType.RIGHT_SEMI,
                      JoinType.RIGHT_ANTI)


@dataclass
class StreamPlan:
    agg: PAggregate              # the cross-chunk merge point
    head: List[PhysicalPlan]     # nodes above agg, outermost first
    scan: PScan                  # the streamed scan


def _contains(node: PhysicalPlan, scan: PScan) -> bool:
    return any(n is scan for n in node.walk())


def _linear_path(node: PhysicalPlan, scan: PScan) -> bool:
    """True iff `scan`'s rows flow to `node`'s output row-linearly."""
    if node is scan:
        return True
    if isinstance(node, (PFilter, PProject)):
        return _linear_path(node.child, scan)
    if isinstance(node, PHashJoin):
        if _contains(node.build, scan):
            return False             # stream side must be the probe side
        if node.join_type not in _LINEAR_JOIN_TYPES:
            return False
        return _linear_path(node.probe, scan)
    # PAggregate / PSort / PLimit between the scan and the merge point are
    # not row-linear
    return False


def plan_stream(plan: PhysicalPlan, catalog) -> Optional[StreamPlan]:
    node, head = plan, []
    while isinstance(node, (PProject, PSort, PLimit)):
        head.append(node)
        node = node.child
    if not isinstance(node, PAggregate):
        return None
    agg = node
    if any(a.func not in ("sum", "count", "count_star", "min", "max", "avg")
           for a in agg.aggs):
        return None    # not decomposable into partial + merge
    scans = [n for n in agg.walk() if isinstance(n, PScan)]
    if not scans:
        return None
    scan = max(scans, key=lambda s: catalog.get(s.table_name).host.num_rows)
    # the streamed TABLE must be scanned exactly once in the whole plan:
    # a second scan of it (self-join) would still have to be resident
    if sum(1 for n in plan.walk()
           if isinstance(n, PScan) and n.table_name == scan.table_name) != 1:
        return None
    if not _linear_path(agg.child, scan):
        return None
    return StreamPlan(agg, head, scan)


def stream_upload_bytes(catalog, sp: StreamPlan, live_cols) -> int:
    reg = catalog.get(sp.scan.table_name)
    cols = live_cols or set(reg.host.schema.names)
    return sum(v.nbytes + valid.nbytes
               for n, (v, valid) in reg.host.columns.items() if n in cols)


def _chunk_arrays(reg, live_cols, lo: int, chunk_rows: int, label: str):
    """Host-pack rows [lo, lo+chunk_rows) of the live columns into ONE
    [W, chunk_rows] matrix (+ f64 columns): a single relay transfer per
    chunk instead of one padded upload per column. Returns
    (schema, layout, packed, f64s, n)."""
    n = min(chunk_rows, reg.host.num_rows - lo)
    schema, layout, packed, f64s = pack_host_slice(
        reg.host, live_cols, lo, n, chunk_rows,
        rename_prefix=f"{label}.")
    return schema, layout, packed, f64s, n


def _run_head(out: DeviceTable, head: List[PhysicalPlan]) -> DeviceTable:
    for n in reversed(head):
        if isinstance(n, PProject):
            out = project_table(out, n.exprs, n.out_fields)
        elif isinstance(n, PSort):
            out = sort_table(out, n.keys)
        elif isinstance(n, PLimit):
            out = limit_table(out, n.n)
        else:  # pragma: no cover
            raise NotImplementedError(type(n))
    return out


def run_streamed(handle, sp: StreamPlan, resident: Dict[str, DeviceTable],
                 live_cols, adaptive) -> DeviceTable:
    """Drive the chunk loop. `handle` is the owning QueryHandle (capacities,
    metrics); `resident` is its _leaf_tables() WITHOUT the streamed label."""
    agg = sp.agg
    reg = handle.catalog.get(sp.scan.table_name)
    chunk_rows = int(os.environ.get("DFP_STREAM_CHUNK_ROWS", 1 << 22))
    chunk_rows = round_capacity(min(chunk_rows,
                                    max(1024, reg.host.num_rows)))
    n_chunks = -(-reg.host.num_rows // chunk_rows)

    partial_specs, merge_specs, finishers = decompose_for_partial(agg.aggs)
    partial_schema = agg_output_schema(agg.child.schema, agg.group_keys,
                                       partial_specs)

    # Joins on the stream path probe a FROZEN build side: their build
    # subtrees are stream-free (guaranteed by plan_stream), so the lookup
    # structures are built ONCE and passed into the chunk program as
    # arguments instead of being rebuilt per chunk — the reference's
    # build-once / probe-stream split (inner.rs:48-75).
    path_joins = [n for n in agg.child.walk()
                  if isinstance(n, PHashJoin) and _contains(n.probe, sp.scan)]
    prep_nodes = {id(m) for j in path_joins for m in j.build.walk()}
    prep_adaptive = [(k, n) for k, n in adaptive if id(n) in prep_nodes]
    # adaptive nodes inside the chunk program (stream path only);
    # the agg's own capacity doubles as the accumulator capacity
    sub_adaptive = [(k, n) for k, n in adaptive
                    if n is not agg and id(n) not in prep_nodes
                    and any(m is n for m in agg.child.walk())]

    # prepare program: execute every frozen build subtree, with the usual
    # overflow-retry loop around its adaptive nodes
    prepared = {}
    if path_joins:
        while True:
            caps = dict(handle._caps)

            def prep_fn(resident, _caps=caps):
                ctx = ExecContext(_caps)
                out = {}
                for j in path_joins:
                    b = j.build.execute(resident, ctx)
                    out[j.join_id] = prepare_build(b, j.build_keys,
                                                   j.strategy)
                totals = [ctx.join_totals.get(k, jnp.int32(0))
                          for k, _ in prep_adaptive]
                return out, totals

            t0 = time.time()
            compiled_prep = jax.jit(prep_fn).lower(resident).compile()
            handle._caps.update(caps)
            handle.metrics.compile_count += 1
            handle.metrics.compile_time_s += time.time() - t0
            t0 = time.time()
            prepared, totals = compiled_prep(resident)
            totals = [int(t) for t in totals]
            handle.metrics.run_time_s += time.time() - t0
            overflow = False
            for (k, _), total in zip(prep_adaptive, totals):
                cap = handle._caps.get(k, total)
                if total > cap:
                    handle._caps[k] = round_capacity(max(total, 1),
                                                     minimum=1024)
                    overflow = True
            if not overflow:
                break
            handle.metrics.retries += 1

    while True:   # aggregate-capacity (accumulator) restarts
        agg_cap = handle._caps.get(agg.node_id)
        if agg_cap is None:
            # clamp the planner's group estimate hard: cross-table composite
            # keys can be wildly overestimated (the single-chip path clamps
            # by child.capacity; here the analogs are the stream table's row
            # count and a 4M accumulator ceiling — the overflow restart
            # covers true undershoot, and the settled capacity persists)
            est = (round_capacity(int(2 * agg.est_groups))
                   if agg.est_groups > 0 else 1 << 16)
            agg_cap = max(128, min(est,
                                   round_capacity(max(1024,
                                                      reg.host.num_rows)),
                                   1 << 22))
            handle._caps[agg.node_id] = agg_cap

        chunk_schema, chunk_layout, _, _, _ = _chunk_arrays(
            reg, live_cols, 0, chunk_rows, sp.scan.label)

        def make_step():
            caps = dict(handle._caps)

            def step(resident, packed, f64s, chunk_n, acc_cols, acc_rows,
                     prepared, _caps=caps):
                ctx = ExecContext(_caps, prepared=prepared)
                tables = dict(resident)
                # reconstruct the chunk from its single packed upload
                # (unpack is elementwise bit ops — fused for free)
                tables[sp.scan.label] = unpack_table(
                    PackedTable(packed, f64s, chunk_layout), chunk_schema,
                    chunk_n)
                child, row_filter = agg.fused_child(tables, ctx)
                partial, _ = hash_aggregate_counted(
                    child, agg.group_keys, partial_specs, agg_cap, row_filter)
                acc = DeviceTable(partial_schema, acc_cols, acc_rows)
                merged, mtotal = hash_aggregate_counted(
                    concat_tables([acc, partial]), agg.group_keys,
                    merge_specs, agg_cap)
                totals = [ctx.join_totals.get(k, jnp.int32(0))
                          for k, _ in sub_adaptive]
                return merged.columns, merged.num_rows, mtotal, totals

            return caps, jax.jit(step)

        caps, step = make_step()
        compiled = None
        # global aggregates produce a single-row table; the accumulator must
        # match the merge output's capacity exactly
        acc_cap = agg_cap if agg.group_keys else 1
        if os.environ.get("DFP_STREAM_DEBUG"):
            print(f"[stream] agg_cap={agg_cap} acc_cap={acc_cap} "
                  f"chunk_rows={chunk_rows} n_chunks={n_chunks} "
                  f"caps={dict(handle._caps)}", flush=True)
        acc_cols = {f.name: (jnp.zeros((acc_cap,), f.dtype.device_dtype),
                             jnp.zeros((acc_cap,), jnp.bool_))
                    for f in partial_schema.fields}
        acc_rows = jnp.int32(0)
        restart = False
        handle.metrics.streamed_chunks = 0

        # Double-buffered chunk loop: chunk i's device compute overlaps the
        # HOST PACKING of chunk i+1 (dispatch is async; the blocking int()
        # validation of chunk i is deferred until after chunk i+1 is
        # packed). On overflow the pending chunk re-runs from its saved
        # input accumulator — nothing later has been dispatched yet.
        debug = bool(os.environ.get("DFP_STREAM_DEBUG"))
        pending = None   # (idx, acc_in, outs): dispatched, not yet validated
        mtotal = 0

        def validate(pending):
            """-> (ok, mtotal). Blocks on the pending chunk's scalars."""
            nonlocal restart, compiled, caps, step
            idx, _, (new_cols, new_rows, mt, tot) = pending
            t0 = time.time()
            mt = int(mt)
            tot = [int(x) for x in tot]
            handle.metrics.run_time_s += time.time() - t0
            if debug:
                print(f"[stream] chunk {idx} mtotal={mt} totals={tot}",
                      flush=True)
            overflow = False
            for (k, _), total in zip(sub_adaptive, tot):
                cap = handle._caps.get(k, total)
                if total > cap:
                    handle._caps[k] = round_capacity(max(total, 1),
                                                     minimum=1024)
                    overflow = True
            if overflow:
                # joins/filters are per-chunk stateless: recompile and
                # retry the pending chunk with the grown capacities
                handle.metrics.retries += 1
                caps, step = make_step()
                compiled = None
                return False, mt
            if mt > agg_cap:
                # accumulator overflow: every prior chunk's fold was
                # truncated — grow and restart the stream
                handle._caps[agg.node_id] = round_capacity(
                    max(mt, 2 * agg_cap), minimum=1024)
                handle.metrics.retries += 1
                restart = True
                return False, mt
            handle.metrics.streamed_chunks += 1
            return True, mt

        i = 0
        while i < n_chunks and not restart:
            t0 = time.time()
            _, _, packed, f64s, chunk_n = _chunk_arrays(
                reg, live_cols, i * chunk_rows, chunk_rows, sp.scan.label)
            chunk_n = jnp.int32(chunk_n)
            # start the async host->device transfer NOW, before blocking on
            # the pending chunk's scalars: the upload (the dominant per-chunk
            # cost on relay-backed devices) then overlaps chunk i-1's compute
            packed, f64s = jax.device_put((packed, f64s))
            if debug:
                print(f"[stream] chunk {i} packed in {time.time()-t0:.2f}s",
                      flush=True)
            if pending is not None:
                ok, mtotal = validate(pending)
                if not ok:
                    if restart:
                        break
                    # re-run the failed chunk from its input accumulator
                    i, (acc_cols, acc_rows) = pending[0], pending[1]
                    pending = None
                    continue
                acc_cols, acc_rows = pending[2][0], pending[2][1]
                pending = None
            if compiled is None:
                t0 = time.time()
                compiled = step.lower(resident, packed, f64s, chunk_n,
                                      acc_cols, acc_rows,
                                      prepared).compile()
                handle._caps.update(caps)
                handle.metrics.compile_count += 1
                handle.metrics.compile_time_s += time.time() - t0
            outs = compiled(resident, packed, f64s, chunk_n, acc_cols,
                            acc_rows, prepared)
            pending = (i, (acc_cols, acc_rows), outs)
            i += 1
        while pending is not None and not restart:
            ok, mtotal = validate(pending)
            if not ok:
                if restart:
                    break
                idx, (acc_cols, acc_rows) = pending[0], pending[1]
                pending = None
                t0 = time.time()
                _, _, packed, f64s, chunk_n = _chunk_arrays(
                    reg, live_cols, idx * chunk_rows, chunk_rows,
                    sp.scan.label)
                chunk_n = jnp.int32(chunk_n)
                compiled = step.lower(resident, packed, f64s, chunk_n,
                                      acc_cols, acc_rows, prepared).compile()
                handle._caps.update(caps)
                handle.metrics.compile_count += 1
                handle.metrics.compile_time_s += time.time() - t0
                outs = compiled(resident, packed, f64s, chunk_n, acc_cols,
                                acc_rows, prepared)
                pending = (idx, (acc_cols, acc_rows), outs)
                continue
            acc_cols, acc_rows = pending[2][0], pending[2][1]
            pending = None
        if restart:
            continue
        # persist the settled capacities (with the aggregate shrunk to its
        # true group count) so later processes compile the final shapes
        # directly — same contract as the materialized executor
        fit = round_capacity(max(mtotal, 1), minimum=1024)
        if agg_cap > 4 * fit:
            handle._caps[agg.node_id] = fit
        handle.metrics.join_caps = dict(handle._caps)
        handle._save_caps(adaptive)

        @jax.jit
        def finish(acc_cols, acc_rows):
            acc = DeviceTable(partial_schema, acc_cols, acc_rows)
            out = finish_partial(acc, agg.group_keys, agg.aggs, finishers,
                                 agg.child.schema)
            return _run_head(out, sp.head)

        return finish(acc_cols, acc_rows)
