"""Physical plan nodes (analog of reference L3 operators:
ParallelHashJoin src/operator/parallel_hash_join.rs, plus DataFusion's stock
Filter/Projection/Aggregate/Sort execs that the reference reuses).

Each node carries its output schema, computed at plan time, and an
`execute(tables) -> DeviceTable` that is jit-traceable; the executor traces
the whole query DAG into ONE XLA program — the TPU replacement for the
reference's tokio-stream pipeline (the OnceLock shared-executor trick in
parallel_hash_join.rs:140-152 exists so all partitions/joins make progress
concurrently; under XLA, whole-program compilation gives that for free).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp

from ..ops.aggregate import (AggSpec, agg_output_schema, hash_aggregate,
                             hash_aggregate_counted)
from ..ops.expressions import Expr
from ..ops.filter import filter_table
from ..ops.hash_table import JoinStrategy
from ..ops.join import JoinType, hash_join, join_output_schema
from ..ops.project import project_table
from ..utils.columnar import round_capacity
from ..ops.sort import SortKey, limit_table, sort_table
from ..utils.columnar import DeviceTable, Field, Schema


class PhysicalPlan:
    schema: Schema

    def children(self) -> List["PhysicalPlan"]:
        return []

    def execute(self, tables: Dict[str, DeviceTable],
                ctx: "ExecContext") -> DeviceTable:
        raise NotImplementedError

    def tree(self, indent: int = 0) -> str:
        s = "  " * indent + self.describe()
        for c in self.children():
            s += "\n" + c.tree(indent + 1)
        return s

    def describe(self) -> str:
        return self.__class__.__name__

    def walk(self):
        yield self
        for c in self.children():
            yield from c.walk()


class ExecContext:
    """Per-execution mutable state: adaptive output capacities (grown on
    overflow retry), the overflow totals reported by each node, and — under
    staged execution — materialized join results from earlier launches."""

    def __init__(self, join_caps: Dict[int, int], materialized=None,
                 prepared=None):
        self.join_caps = join_caps
        self.join_totals: Dict[int, jnp.ndarray] = {}
        self.materialized = materialized or {}
        # join_id -> PreparedBuild: frozen build sides hoisted out of the
        # per-chunk program by streaming execution
        self.prepared = prepared or {}
        # distributed-only: join_id -> [P] per-device candidate totals (the
        # work-balance proxy for scaling efficiency) and the set of sort
        # nodes that run shard-LOCAL (root ORDER BY merges at collection)
        self.join_balance: Dict[int, jnp.ndarray] = {}
        self.local_sort_ids = frozenset()
        # streaming-only: join_id -> incoming visited mask (or None for the
        # first chunk) for build-emitting joins whose probe side is streamed
        # in chunks; the join executes chunk-wise (pairs only; build-side
        # emission deferred) and records visited_out = incoming | this
        # chunk's matches. The cross-chunk ConcurrentBitSet analog
        # (reference full.rs:77-201).
        self.stream_visited: Dict[int, object] = {}
        self.visited_out: Dict[int, jnp.ndarray] = {}


@dataclass
class PScan(PhysicalPlan):
    table_name: str
    label: str
    schema: Schema

    def describe(self):
        return f"Scan({self.table_name} as {self.label})"

    def execute(self, tables, ctx):
        return tables[self.label]


@dataclass
class PFilter(PhysicalPlan):
    child: PhysicalPlan
    predicate: Expr
    # planner's output-row estimate (range/NDV selectivity over catalog
    # stats); 0 = unknown. Seeds the initial capacity — each avoided
    # overflow/shrink retry is a full recompile.
    est_rows: float = 0.0
    node_id: int = field(default_factory=lambda: _next_node_id())
    schema: Schema = None

    def __post_init__(self):
        self.schema = self.child.schema

    def children(self):
        return [self.child]

    def describe(self):
        return f"Filter({self.predicate})"

    def execute(self, tables, ctx):
        child = self.child.execute(tables, ctx)
        # adaptive output capacity, seeded by the planner's selectivity
        # estimate with 2x headroom (default: selectivity <= 1/4); grows on
        # overflow — selective filters shrink every downstream operator's
        # static working set
        cap = ctx.join_caps.get(self.node_id)
        if cap is None:
            if self.est_rows > 0:
                cap = min(child.capacity,
                          round_capacity(int(2 * self.est_rows),
                                         minimum=1024))
            else:
                cap = min(child.capacity, max(1024, child.capacity // 4))
            ctx.join_caps[self.node_id] = cap
        out, total = filter_table(child, self.predicate, cap)
        ctx.join_totals[self.node_id] = total
        return out


@dataclass
class PProject(PhysicalPlan):
    child: PhysicalPlan
    exprs: List[Tuple[Expr, str]]
    out_fields: List[Field]      # plan-time schema (dtype/dictionary info)
    schema: Schema = None

    def __post_init__(self):
        self.schema = Schema(self.out_fields)

    def children(self):
        return [self.child]

    def describe(self):
        return f"Project({', '.join(n for _, n in self.exprs)})"

    def execute(self, tables, ctx):
        return project_table(self.child.execute(tables, ctx), self.exprs,
                             self.out_fields)


_JOIN_ID = [0]


def _next_node_id() -> int:
    _JOIN_ID[0] += 1
    return _JOIN_ID[0]


@dataclass
class PHashJoin(PhysicalPlan):
    """The ParallelHashJoin analog. build == left child (reference keeps
    DataFusion's convention: left child is the build side)."""
    build: PhysicalPlan
    probe: PhysicalPlan
    build_keys: List[str]
    probe_keys: List[str]
    join_type: JoinType
    strategy: JoinStrategy = JoinStrategy.CSR
    residual: Optional[Expr] = None
    # distributed execution mode: partitioned | broadcast | skew_salted
    # (set by the optimizer from statistics; single-chip execution ignores it)
    dist_mode: str = "partitioned"
    # planner's output-cardinality estimate; seeds the initial capacity so
    # big scale factors don't pay an overflow-retry recompile per join
    est_rows: float = 0.0
    # probe-side hot-key share (catalog mcv_share_of), recorded by
    # ChooseDistModeRule (which runs LAST and mutates in place). When
    # salting is OFF, the distributed shuffle seeds its per-destination
    # send capacity from this instead of eating a dropped-row retry the
    # planner could have predicted from the same statistic.
    probe_mcv_share: float = 0.0
    join_id: int = field(default_factory=lambda: _JOIN_ID.__setitem__(0, _JOIN_ID[0] + 1) or _JOIN_ID[0])
    schema: Schema = None

    def __post_init__(self):
        self.schema = join_output_schema(self.build.schema, self.probe.schema,
                                         self.join_type)

    def children(self):
        return [self.build, self.probe]

    def describe(self):
        r = f" filter={self.residual}" if self.residual is not None else ""
        return (f"HashJoin[{self.join_type.value}/{self.strategy.value}] "
                f"on {list(zip(self.build_keys, self.probe_keys))}{r}")

    # join types whose execution can be returned late-materialized as
    # (uncompacted table, mask) — see ops/join.py hash_join `expanded`
    EXPANDABLE = (JoinType.INNER, JoinType.LEFT_SEMI, JoinType.LEFT_ANTI,
                  JoinType.RIGHT_SEMI, JoinType.RIGHT_ANTI)

    def _inputs_and_cap(self, tables, ctx):
        """Chain fusion: an input that is itself an expandable join executes
        late-materialized — (uncompacted table, mask) — and the mask rides
        into hash_join as build_valid/probe_valid, erasing the child's
        compaction (capacity is identical either way, so every downstream
        cost is unchanged)."""
        prepared = ctx.prepared.get(self.join_id)
        b_valid = None
        if prepared is not None:
            b = prepared.build
        else:
            b, b_valid = _execute_maybe_expanded(self.build, tables, ctx)
        p, p_valid = _execute_maybe_expanded(self.probe, tables, ctx)
        cap = ctx.join_caps.get(self.join_id)
        if cap is None:
            import os
            # HBM ceiling on SEED capacities (learned/grown caps may exceed
            # it): estimates can cascade arbitrarily high (SF10 Q18: an
            # unknowable HAVING selectivity made the semi-join estimate 1000x
            # over, seeding a 67M-row join capacity that OOMed on first
            # launch). An undershoot costs ONE grow-retry; an overshoot
            # kills the query — so the seed is bounded and the retry loop
            # owns the genuinely-huge cases.
            ceiling = int(os.environ.get("DFP_MAX_JOIN_SEED_CAP", 1 << 25))
            if self.est_rows > 0:
                # planner cardinality estimate with 1.3x headroom (the
                # estimate is MATCHES + bucket false hits; the capacity
                # bounds CANDIDATES), clamped: a wild overestimate must not
                # out-allocate the inputs by more than 4x (HBM), a wild
                # underestimate still gets the retry
                cap = min(round_capacity(int(1.3 * self.est_rows),
                                         minimum=1024),
                          4 * max(256, b.capacity, p.capacity), ceiling)
            else:
                # ~1 match per probe row is the common FK-join shape;
                # overflow retry grows it, shrink-on-overshoot trims it —
                # and the FIRST run must fit in HBM (SF1 Q5 OOMs at 2x)
                cap = min(max(256, b.capacity, p.capacity), ceiling)
            ctx.join_caps[self.join_id] = cap
        residual_fn = None
        if self.residual is not None:
            res = self.residual
            residual_fn = lambda pair_tbl: res.eval(pair_tbl)[:2]
        return b, p, cap, residual_fn, prepared, b_valid, p_valid

    # streamed-probe rewrites: per-chunk emission of a build-emitting join
    # is its probe-linear part (pairs; plus the chunk's own unmatched probe
    # rows for FULL); the build-side emission is deferred to the stream's
    # flush pass via the folded visited mask
    _STREAM_CHUNK_TYPE = {JoinType.LEFT: JoinType.INNER,
                          JoinType.FULL: JoinType.RIGHT}

    def execute(self, tables, ctx):
        if self.join_id in ctx.materialized:   # staged execution boundary
            return ctx.materialized[self.join_id]
        if self.join_id in ctx.stream_visited:
            return self._execute_stream_chunk(tables, ctx)
        (b, p, cap, residual_fn, prepared,
         b_valid, p_valid) = self._inputs_and_cap(tables, ctx)
        out, total = hash_join(b, p, self.build_keys, self.probe_keys,
                               self.join_type, cap, strategy=self.strategy,
                               residual=residual_fn, prepared=prepared,
                               build_valid=b_valid, probe_valid=p_valid)
        ctx.join_totals[self.join_id] = total
        return out

    def _execute_stream_chunk(self, tables, ctx):
        """One probe chunk of a build-emitting join under morsel streaming:
        emit the chunk's probe-linear rows now, fold this chunk's build-row
        matches into the cross-chunk visited mask (ctx.visited_out). The
        deferred build-side rows (unmatched for LEFT/FULL/LEFT_ANTI, matched
        for LEFT_SEMI) are emitted once by runtime/streaming.py's flush pass
        after the last chunk — the reference's last-stream finalizer
        (full.rs:181-201) with the barrier replaced by the end of the chunk
        loop."""
        from ..utils.columnar import null_columns_like
        (b, p, cap, residual_fn, prepared,
         b_valid, p_valid) = self._inputs_and_cap(tables, ctx)
        chunk_type = self._STREAM_CHUNK_TYPE.get(self.join_type)
        if chunk_type is not None:            # LEFT / FULL: pairs this chunk
            out, total, vis = hash_join(
                b, p, self.build_keys, self.probe_keys, chunk_type, cap,
                strategy=self.strategy, residual=residual_fn,
                prepared=prepared, build_valid=b_valid, probe_valid=p_valid,
                return_visited=True)
            # output schemas line up: INNER's == LEFT's, RIGHT's == FULL's
            # (both emit build+probe columns)
        else:                                 # LEFT_SEMI / LEFT_ANTI
            # per-chunk emission is EMPTY (the output is build rows, all
            # deferred); only the visited fold runs. expanded=True keeps
            # this gather-free.
            _, _, total, vis = hash_join(
                b, p, self.build_keys, self.probe_keys, self.join_type, cap,
                strategy=self.strategy, residual=residual_fn,
                prepared=prepared, expanded=True, build_valid=b_valid,
                probe_valid=p_valid, return_visited=True)
            out = DeviceTable(self.schema,
                              null_columns_like(self.schema, 128),
                              jnp.int32(0))
        incoming = ctx.stream_visited[self.join_id]
        ctx.visited_out[self.join_id] = (vis if incoming is None
                                         else incoming | vis)
        ctx.join_totals[self.join_id] = total
        return out

    def execute_expanded(self, tables, ctx):
        """Late-materialized execution for aggregate fusion: (table, mask) —
        the caller fuses the mask as an aggregate row filter instead of
        compacting (ops/join.py hash_join `expanded`). INNER returns the
        uncompacted pair table + match; semi/anti return the surviving
        input side + its flag. Capacity bookkeeping matches execute()."""
        (b, p, cap, residual_fn, prepared,
         b_valid, p_valid) = self._inputs_and_cap(tables, ctx)
        out, match, total = hash_join(b, p, self.build_keys, self.probe_keys,
                                      self.join_type, cap,
                                      strategy=self.strategy,
                                      residual=residual_fn,
                                      prepared=prepared, expanded=True,
                                      build_valid=b_valid,
                                      probe_valid=p_valid)
        ctx.join_totals[self.join_id] = total
        return out, match


def _expandable_join(n, ctx) -> bool:
    """Can `n` execute late-materialized (execute_expanded) here? Joins
    already materialized at a staged boundary must be consumed as-is.
    DFP_NO_LATE_MAT=1 disables join late materialization entirely (perf
    A/B valve; filter-into-aggregate fusion is unaffected)."""
    import os
    if os.environ.get("DFP_NO_LATE_MAT"):
        return False
    return (isinstance(n, PHashJoin)
            and n.join_type in PHashJoin.EXPANDABLE
            and n.join_id not in ctx.materialized
            # streamed-probe joins must take execute()'s chunk-wise branch
            # (visited fold + deferred emission), not late materialization
            and n.join_id not in ctx.stream_visited)


def _execute_maybe_expanded(node, tables, ctx):
    """(table, mask|None): execute `node` late-materialized if it is an
    expandable join OR a filter, looking through any PProject chain
    (projections are elementwise and row-aligned, so they commute with the
    mask).

    Filter fusion into joins: a filter feeding a join side becomes a
    validity mask on that side (hash_join's build_valid/probe_valid)
    instead of a full pack + argsort + row-gather compaction. At SF100 the
    o_orderdate filter's compaction of a 151M-capacity orders table cost
    ~10 GB of packed/gather temps inside the streaming prepare program —
    the mask costs one elementwise pass."""
    import jax.numpy as jnp

    projs = []
    n = node
    while isinstance(n, PProject):
        projs.append(n)
        n = n.child
    t = mask = None
    if _expandable_join(n, ctx):
        t, mask = n.execute_expanded(tables, ctx)
    elif isinstance(n, PFilter) and not isinstance(n.child, PFilter):
        if _expandable_join(n.child, ctx):
            t, match = n.child.execute_expanded(tables, ctx)
            v, valid, _ = n.predicate.eval(t)
            mask = match & valid & v.astype(jnp.bool_)
            ctx.join_totals[n.node_id] = jnp.int32(0)
        else:
            # gate: only weakly-selective filters (est keeps >= 1/4 of the
            # rows) over BIG scans fuse — a selective filter's compaction
            # shrinks every downstream capacity and must still run
            c = n.child
            while isinstance(c, PProject):
                c = c.child
            if isinstance(c, PScan) and c.label in tables:
                cap_c = tables[c.label].capacity
                if cap_c > (1 << 22) and n.est_rows * 4 >= cap_c:
                    t = n.child.execute(tables, ctx)
                    v, valid, _ = n.predicate.eval(t)
                    mask = valid & v.astype(jnp.bool_)
                    ctx.join_totals[n.node_id] = jnp.int32(0)
    if t is not None:
        for pr in reversed(projs):
            t = project_table(t, pr.exprs, pr.out_fields)
        return t, mask
    return node.execute(tables, ctx), None


@dataclass
class PAggregate(PhysicalPlan):
    child: PhysicalPlan
    group_keys: List[str]
    aggs: List[AggSpec]
    # planner's group-count estimate (catalog distinct counts); 0 = unknown
    est_groups: float = 0.0
    node_id: int = field(default_factory=lambda: _next_node_id())
    schema: Schema = None

    def __post_init__(self):
        self.schema = agg_output_schema(self.child.schema, self.group_keys,
                                        self.aggs)

    def children(self):
        return [self.child]

    def describe(self):
        a = ", ".join(f"{x.func}({x.input or '*'})" for x in self.aggs)
        return f"Aggregate(group={self.group_keys}, aggs=[{a}])"

    def fused_child(self, tables, ctx):
        """(child, row_filter): aggregate over a filter (under any projection
        chain) fuses the predicate as a row mask. A global aggregate then
        needs no compaction at all, and a grouped one compacts implicitly
        through its grouping sort — either way the filter's own row-gather
        disappears. Projections are elementwise and row-aligned, so the mask
        stays valid across them. (Streaming execution reuses this for the
        per-chunk partial aggregate.)

        An INNER join directly under the chain fuses the same way (late
        materialization): the aggregate reads the join's UNCOMPACTED
        candidate slots with the match mask as its row filter, skipping the
        pair compaction and the materialized intermediate entirely.
        Semi/anti joins fuse even better: their result IS one input table
        masked, so the fused form is that table + its visited/match flag —
        the join's compaction gather disappears outright."""
        import jax.numpy as jnp

        fusable_join = lambda n: _expandable_join(n, ctx)

        projs = []
        node = self.child
        while isinstance(node, PProject):
            projs.append(node)
            node = node.child

        child = row_filter = None
        if fusable_join(node):
            child, row_filter = node.execute_expanded(tables, ctx)
        elif isinstance(node, PFilter) and not isinstance(node.child, PFilter):
            if fusable_join(node.child):
                child, match = node.child.execute_expanded(tables, ctx)
                v, valid, _ = node.predicate.eval(child)
                row_filter = match & valid & v.astype(jnp.bool_)
            else:
                child = node.child.execute(tables, ctx)
                v, valid, _ = node.predicate.eval(child)
                row_filter = valid & v.astype(jnp.bool_)
            ctx.join_totals[node.node_id] = jnp.int32(0)
        if child is not None:
            for p in reversed(projs):
                child = project_table(child, p.exprs, p.out_fields)
            return child, row_filter
        return self.child.execute(tables, ctx), None

    def execute(self, tables, ctx):
        if self.node_id in ctx.materialized:
            # streaming execution materializes the merge-point aggregate's
            # finished result and runs the REST of the plan (anything above
            # it: outer aggregates, joins, sorts) on it — the generalized
            # "head" (a Q13-shaped plan has a second aggregate above the
            # streamed one)
            return ctx.materialized[self.node_id]
        child, row_filter = self.fused_child(tables, ctx)
        cap = ctx.join_caps.get(self.node_id)
        if cap is None:
            if self.est_groups > 0:
                # 2x headroom over the catalog estimate (filters upstream
                # only SHRINK group counts; overflow retry covers the rest)
                cap = max(128, min(round_capacity(int(2 * self.est_groups)),
                                   child.capacity))
            else:
                cap = min(child.capacity, max(1024, child.capacity // 4))
            ctx.join_caps[self.node_id] = cap
        out, total = hash_aggregate_counted(child, self.group_keys, self.aggs,
                                            cap, row_filter)
        ctx.join_totals[self.node_id] = total
        return out


@dataclass
class PSort(PhysicalPlan):
    child: PhysicalPlan
    keys: List[SortKey]
    schema: Schema = None

    def __post_init__(self):
        self.schema = self.child.schema

    def children(self):
        return [self.child]

    def describe(self):
        return f"Sort({[(k.column, 'asc' if k.ascending else 'desc') for k in self.keys]})"

    def execute(self, tables, ctx):
        return sort_table(self.child.execute(tables, ctx), self.keys)


@dataclass
class PLimit(PhysicalPlan):
    child: PhysicalPlan
    n: int
    schema: Schema = None

    def __post_init__(self):
        self.schema = self.child.schema

    def children(self):
        return [self.child]

    def describe(self):
        return f"Limit({self.n})"

    def execute(self, tables, ctx):
        return limit_table(self.child.execute(tables, ctx), self.n)


def find_joins(plan: PhysicalPlan) -> List[PHashJoin]:
    return [n for n in plan.walk() if isinstance(n, PHashJoin)]


def find_adaptive(plan: PhysicalPlan) -> List[Tuple[int, PhysicalPlan]]:
    """(capacity key, node) for every node with an adaptive output capacity."""
    out = []
    for n in plan.walk():
        if isinstance(n, PHashJoin):
            out.append((n.join_id, n))
        elif isinstance(n, (PFilter, PAggregate)):
            out.append((n.node_id, n))
    return out
