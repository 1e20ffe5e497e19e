"""Brute-force join/aggregate oracle used to check the engine.

Mirrors the role of the reference's expected-batch assertions in its
end-to-end matrix (reference src/lib.rs:47-726): results are compared as
SORTED row multisets because parallel output order is unspecified
(reference collect_and_sort_results, src/lib.rs:756-792).
"""

from __future__ import annotations

from typing import Callable, List, Optional


def rows_key(row: dict, names):
    def k(v):
        if v is None:
            return (0, "")
        if isinstance(v, bool):
            return (1, str(int(v)))
        if isinstance(v, (int, float)):
            return (2, f"{float(v):+030.9f}")
        return (3, str(v))
    return tuple(k(row.get(n)) for n in names)


def sort_rows(rows: List[dict], names=None):
    if names is None:
        names = sorted({k for r in rows for k in r})
    return sorted(rows, key=lambda r: rows_key(r, names))


def _vals_equal(x, y) -> bool:
    if x is None or y is None:
        return x is y
    if isinstance(x, float) or isinstance(y, float):
        import math
        return math.isclose(float(x), float(y), rel_tol=1e-9, abs_tol=1e-9)
    return x == y


def assert_rows_equal(actual: List[dict], expected: List[dict]):
    names = sorted({k for r in expected for k in r} | {k for r in actual for k in r})
    a = sort_rows([{n: r.get(n) for n in names} for r in actual], names)
    e = sort_rows([{n: r.get(n) for n in names} for r in expected], names)
    ok = len(a) == len(e) and all(
        all(_vals_equal(ra[n], re[n]) for n in names) for ra, re in zip(a, e))
    assert ok, f"rows differ:\n actual ({len(a)}): {a[:20]}\n expected ({len(e)}): {e[:20]}"


def _key_match(brow, prow, bkeys, pkeys):
    for bk, pk in zip(bkeys, pkeys):
        bv, pv = brow[bk], prow[pk]
        if bv is None or pv is None or bv != pv:
            return False
    return True


def oracle_join(build: List[dict], probe: List[dict],
                build_keys, probe_keys, join_type: str,
                residual: Optional[Callable[[dict], Optional[bool]]] = None
                ) -> List[dict]:
    """join_type in {inner,left,right,full,left_semi,left_anti,right_semi,right_anti};
    LEFT refers to the build side, matching the engine."""
    bnames = sorted({k for r in build for k in r})
    pnames = sorted({k for r in probe for k in r})
    out = []
    visited = [False] * len(build)
    pmatched = [False] * len(probe)
    for pi, prow in enumerate(probe):
        for bi, brow in enumerate(build):
            if not _key_match(brow, prow, build_keys, probe_keys):
                continue
            if residual is not None:
                r = residual({**brow, **prow})
                if r is not True:
                    continue
            visited[bi] = True
            pmatched[pi] = True
            if join_type in ("inner", "left", "right", "full"):
                out.append({**brow, **prow})
    if join_type in ("left", "full"):
        for bi, brow in enumerate(build):
            if not visited[bi]:
                out.append({**brow, **{n: None for n in pnames}})
    if join_type in ("right", "full"):
        for pi, prow in enumerate(probe):
            if not pmatched[pi]:
                out.append({**{n: None for n in bnames}, **prow})
    if join_type == "left_semi":
        out = [build[i] for i in range(len(build)) if visited[i]]
    if join_type == "left_anti":
        out = [build[i] for i in range(len(build)) if not visited[i]]
    if join_type == "right_semi":
        out = [probe[i] for i in range(len(probe)) if pmatched[i]]
    if join_type == "right_anti":
        out = [probe[i] for i in range(len(probe)) if not pmatched[i]]
    return out
