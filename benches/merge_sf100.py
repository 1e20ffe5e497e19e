"""Merge the round-5 SF100 runs (results/sf100_r5) into the consolidated
all-22 artifact (results/sf100/results.json), tagging each query with the
round it was measured in. Queries re-run in round 5 replace their round-4
entries (Q7's committed RESOURCE_EXHAUSTED gives way to its grace run)."""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

BASE = os.path.join(os.path.dirname(__file__), "..", "results")


def main():
    with open(os.path.join(BASE, "sf100", "results.json")) as f:
        out = json.load(f)
    with open(os.path.join(BASE, "sf100_r5", "results.json")) as f:
        r5 = json.load(f)
    for sect in ("query_times_ms", "query_summary", "query_metrics",
                 "checked"):
        out.setdefault(sect, {})
        for q, v in r5.get(sect, {}).items():
            out[sect][q] = v
    rounds = out.setdefault("measured_in_round", {})
    for q in out["query_summary"]:
        rounds.setdefault(q, 4)
    for q in r5.get("query_summary", {}):
        rounds[q] = 5
    with open(os.path.join(BASE, "sf100", "results.json"), "w") as f:
        json.dump(out, f, indent=2, default=str)
    done = sorted(int(q) for q in out["checked"] if out["checked"][q])
    print(f"consolidated: {len(done)}/22 checked -> {done}")


if __name__ == "__main__":
    main()
