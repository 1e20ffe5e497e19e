"""Physical-plan optimizer rules.

Analog of reference L4 (src/operator/use_parallel_hash_join_rule.rs appends
rules to DataFusion's default set, parse_sql.rs:37-54). The planner already
performs join ordering and build-side selection inline; this module holds the
plan-to-plan rewrite rules that run afterwards:

  * `PruneColumnsRule` — column pruning above scans and through joins: the
    reference leans on DataFusion's projection pushdown and re-wraps joins in
    ProjectionExec (use_parallel_hash_join_rule.rs:108-131). Here width
    matters doubly: the join's packed row-gathers move whole rows, so every
    dead column costs HBM bandwidth in the hot path.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Set

from ..ops.expressions import BinOp, Col, Expr
from ..utils.columnar import Schema
from .physical import (PAggregate, PFilter, PHashJoin, PLimit, PProject,
                       PScan, PSort, PhysicalPlan)


def expr_columns(e: Expr, out: Set[str]) -> None:
    """Collect all Col names referenced by an expression tree."""
    if isinstance(e, Col):
        out.add(e.name)
        return
    if dataclasses.is_dataclass(e):
        for f in dataclasses.fields(e):
            v = getattr(e, f.name)
            _walk_value(v, out)


def _walk_value(v, out: Set[str]) -> None:
    if isinstance(v, Expr):
        expr_columns(v, out)
    elif isinstance(v, (list, tuple)):
        for item in v:
            _walk_value(item, out)


class PruneColumnsRule:
    """Narrow every subtree to the columns its consumers actually read."""

    def optimize(self, plan: PhysicalPlan) -> PhysicalPlan:
        return self._prune(plan, set(plan.schema.names))

    def _project_to(self, node: PhysicalPlan, required: Set[str]) -> PhysicalPlan:
        names = [n for n in node.schema.names if n in required]
        if len(names) == len(node.schema.names):
            return node
        fields = [node.schema.field(n) for n in names]
        return PProject(node, [(Col(n), n) for n in names], fields)

    def _prune(self, node: PhysicalPlan, required: Set[str]) -> PhysicalPlan:
        required = required & set(node.schema.names)
        if not required:  # consumer only counts rows: keep one column
            required = {node.schema.names[0]}

        if isinstance(node, PScan):
            return self._project_to(node, required)

        if isinstance(node, PProject):
            kept = [(e, n) for (e, n), f in zip(node.exprs, node.out_fields)
                    if n in required]
            kept_fields = [f for f in node.out_fields if f.name in required]
            if not kept:  # degenerate; keep everything
                kept, kept_fields = node.exprs, node.out_fields
            child_req: Set[str] = set()
            for e, _ in kept:
                expr_columns(e, child_req)
            child = self._prune(node.child, child_req)
            return PProject(child, kept, kept_fields)

        if isinstance(node, PFilter):
            child_req = set(required)
            expr_columns(node.predicate, child_req)
            child = self._prune(node.child, child_req)
            out = PFilter(child, node.predicate)
            out.node_id = node.node_id  # executor capacities key on this
            return self._project_to(out, required)

        if isinstance(node, PHashJoin):
            res_cols: Set[str] = set()
            if node.residual is not None:
                expr_columns(node.residual, res_cols)
            breq = ((required | res_cols) & set(node.build.schema.names)) \
                | set(node.build_keys)
            preq = ((required | res_cols) & set(node.probe.schema.names)) \
                | set(node.probe_keys)
            build = self._prune(node.build, breq)
            probe = self._prune(node.probe, preq)
            out = PHashJoin(build, probe, node.build_keys, node.probe_keys,
                            node.join_type, node.strategy, node.residual,
                            node.dist_mode, node.est_rows)
            out.join_id = node.join_id  # executor capacities key on this
            out.__post_init__()
            return self._project_to(out, required)

        if isinstance(node, PAggregate):
            child_req = set(node.group_keys)
            for a in node.aggs:
                if a.input:
                    child_req.add(a.input)
            child = self._prune(node.child, child_req)
            out = PAggregate(child, node.group_keys, node.aggs,
                             node.est_groups)
            out.node_id = node.node_id
            return out

        if isinstance(node, PSort):
            child_req = required | {k.column for k in node.keys}
            child = self._prune(node.child, child_req)
            return PSort(child, node.keys)

        if isinstance(node, PLimit):
            return PLimit(self._prune(node.child, required), node.n)

        return node


class CoalesceFiltersRule:
    """Merge chains of PFilter into one AND predicate: each filter pays a
    full row compaction (pack + row-gather), so N stacked single-column
    predicates cost N compactions where one suffices."""

    def optimize(self, plan: PhysicalPlan) -> PhysicalPlan:
        return self._rewrite(plan)

    def _rewrite(self, node: PhysicalPlan) -> PhysicalPlan:
        if isinstance(node, PFilter):
            preds = [node.predicate]
            child = node.child
            while isinstance(child, PFilter):
                preds.append(child.predicate)
                child = child.child
            child = self._rewrite(child)
            combined = preds[0]
            for p in preds[1:]:
                combined = BinOp("and", combined, p)
            out = PFilter(child, combined)
            out.node_id = node.node_id
            return out
        for attr in ("child", "build", "probe"):
            if hasattr(node, attr):
                setattr(node, attr, self._rewrite(getattr(node, attr)))
        if hasattr(node, "__post_init__"):
            node.__post_init__()
        return node


class ChooseDistModeRule:
    """Pick each join's distributed execution mode from statistics — the
    analog of the reference's broadcast-join threshold (its benchmark sizes
    tables 'above the maximum threshold for broadcast joins',
    benches/my_benchmark.rs:159) plus the salted-skew substitute for work
    stealing. Probe-driven join types only (INNER/RIGHT/RIGHT_SEMI/
    RIGHT_ANTI): replicated build rows would double-count LEFT*/FULL
    unmatched output."""

    PROBE_DRIVEN = ("inner", "right", "right_semi", "right_anti")

    def __init__(self, catalog, config):
        self.catalog = catalog
        self.config = config

    def optimize(self, plan: PhysicalPlan) -> PhysicalPlan:
        from .planner import _estimate_rows
        for node in plan.walk():
            if not isinstance(node, PHashJoin):
                continue
            if node.join_type.value not in self.PROBE_DRIVEN:
                node.dist_mode = "partitioned"
                continue
            best = _estimate_rows(node.build, self.catalog)
            if best <= getattr(self.config, "broadcast_threshold", 0):
                node.dist_mode = "broadcast"
            elif getattr(self.config, "skew_salting", False):
                node.dist_mode = "skew_salted"
        return plan


def optimize_plan(plan: PhysicalPlan, catalog=None, config=None) -> PhysicalPlan:
    plan = CoalesceFiltersRule().optimize(plan)
    plan = PruneColumnsRule().optimize(plan)
    if catalog is not None and config is not None:
        plan = ChooseDistModeRule(catalog, config).optimize(plan)
    return plan


def required_leaf_columns(plan) -> Dict[str, Set[str]]:
    """Per scan label, the set of BASE column names any node in the plan can
    read. Everything an operator touches goes through an expression, a join
    key, a group/agg input, or a sort key; a column referenced by none of
    those (and not in the final output) is dead weight — the executor uses
    this to upload only live columns (a full SF10 lineitem is ~6 GB in HBM,
    its 7 live columns ~2.5 GB)."""
    refs: Set[str] = set(plan.schema.names)
    labels = set()
    for node in plan.walk():
        if isinstance(node, PScan):
            labels.add(node.label)
        elif isinstance(node, PProject):
            for e, _ in node.exprs:
                expr_columns(e, refs)
        elif isinstance(node, PFilter):
            expr_columns(node.predicate, refs)
        elif isinstance(node, PHashJoin):
            refs.update(node.build_keys)
            refs.update(node.probe_keys)
            if node.residual is not None:
                expr_columns(node.residual, refs)
        elif isinstance(node, PAggregate):
            refs.update(node.group_keys)
            refs.update(a.input for a in node.aggs if a.input)
        elif isinstance(node, PSort):
            refs.update(k.column for k in node.keys)
    out: Dict[str, Set[str]] = {}
    for label in labels:
        pre = label + "."
        cols = {r.split(".", 1)[1] for r in refs if r.startswith(pre)}
        out[label] = cols
    return out
