"""Per-query out-of-core (morsel-streaming) eligibility report.

For every TPC-H query, plan it against a catalog and report whether the
plan streams its biggest scan (runtime/streaming.plan_stream), which scan,
through which join types, and the REASON when it cannot — the committed
eligibility table VERDICT r3 asked for ("a per-query SF100 eligibility
table with a reason for every exclusion").

Run: python -m datafusion_parallelism_tpu.tpch.eligibility \
         --data-path /root/data/sf100_bin --out results/sf100/eligibility.json
"""

from __future__ import annotations

import argparse
import json


def classify(plan, catalog):
    """-> dict describing stream eligibility of `plan`."""
    from ..models.physical import PAggregate, PHashJoin, PScan
    from ..runtime.streaming import (_contains, _path_to, plan_stream,
                                     _LINEAR_JOIN_TYPES, _VISITED_JOIN_TYPES)

    scans = [n for n in plan.walk() if isinstance(n, PScan)]
    if not scans:
        return {"eligible": False, "reason": "no scans"}
    scan = max(scans, key=lambda s: catalog.get(s.table_name).host.num_rows)
    info = {"streamed_table": scan.table_name,
            "streamed_rows": catalog.get(scan.table_name).host.num_rows}
    sp = plan_stream(plan, catalog)
    if sp is not None:
        info["eligible"] = True
        info["visited_joins"] = [j.join_type.value for j in sp.visited_joins]
        info["path_join_types"] = [
            n.join_type.value for n in sp.agg.child.walk()
            if isinstance(n, PHashJoin) and _contains(n.probe, sp.scan)]
        return info
    # diagnose WHY
    n_scans = sum(1 for n in plan.walk()
                  if isinstance(n, PScan) and n.table_name == scan.table_name)
    if n_scans != 1:
        info["eligible"] = False
        info["reason"] = (f"{scan.table_name} scanned {n_scans}x "
                          "(self-join): every scan would have to be "
                          "resident; chunking one leaves the others whole")
        return info
    path = _path_to(plan, scan)
    aggs = [n for n in path if isinstance(n, PAggregate)]
    if not aggs:
        info["eligible"] = False
        info["reason"] = ("no aggregate above the scan: the output is "
                          "row-shaped in the streamed table, so there is no "
                          "bounded merge point to fold chunks into")
        return info
    agg = aggs[-1]
    bad = [a.func for a in agg.aggs
           if a.func not in ("sum", "count", "count_star", "min", "max",
                             "avg")]
    if bad:
        info["eligible"] = False
        info["reason"] = f"non-decomposable aggregates at merge point: {bad}"
        return info
    sub = path[path.index(agg) + 1:]
    for i, node in enumerate(sub[:-1]):
        if isinstance(node, PHashJoin):
            nxt = sub[i + 1]
            if not any(m is nxt for m in node.probe.walk()):
                info["eligible"] = False
                info["reason"] = (f"{scan.table_name} is the BUILD side of a "
                                  f"{node.join_type.value} join: the lookup "
                                  "table must be frozen before any probe "
                                  "batch flows")
                return info
            if node.join_type not in (_LINEAR_JOIN_TYPES
                                      + _VISITED_JOIN_TYPES):
                info["eligible"] = False
                info["reason"] = (f"join type {node.join_type.value} on the "
                                  "stream path is neither probe-linear nor "
                                  "visited-streamable")
                return info
        elif isinstance(node, PAggregate):
            info["eligible"] = False
            info["reason"] = ("a second aggregate sits between the scan and "
                              "the merge point")
            return info
        elif not node.children():
            break
        elif node.__class__.__name__ in ("PSort", "PLimit"):
            info["eligible"] = False
            info["reason"] = (f"{node.__class__.__name__} between the scan "
                              "and the merge point is not row-decomposable")
            return info
    info["eligible"] = False
    info["reason"] = "plan_stream rejected (unclassified shape)"
    return info


def main(argv=None):
    from .. import SessionContext
    from .cli import load_data_path
    from .queries import QUERIES

    ap = argparse.ArgumentParser()
    ap.add_argument("--data-path", required=True)
    ap.add_argument("--scale-factor", type=float, default=100.0)
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    tables = load_data_path(args.data_path)
    ctx = SessionContext()
    for name, host in tables.items():
        ctx.register_table(name, host)
    report = {}
    for q in sorted(QUERIES):
        try:
            h = ctx.sql(QUERIES[q])
            report[str(q)] = classify(h.plan, ctx.catalog)
        except Exception as e:  # pragma: no cover - report, don't die
            report[str(q)] = {"eligible": False,
                              "reason": f"planning error: {e!r}"}
        r = report[str(q)]
        print(f"Q{q:>2}: {'STREAMS' if r.get('eligible') else 'resident':8s} "
              f"{r.get('streamed_table', '')} "
              f"{r.get('visited_joins', '') or r.get('reason', '')}",
              flush=True)
    out = {"scale_factor": args.scale_factor, "queries": report}
    if args.out:
        import os
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
