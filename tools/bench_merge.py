#!/usr/bin/env python3
"""Merge N full-board Bench runs into the official per-round artifact:
per-query MIN across solo runs (the r11 convention the round-12 verdict
asked to restore), with a provenance note.

Usage: python3 tools/bench_merge.py OUT.json run1.json run2.json [...]
"""
import json
import sys


def main(out, runs):
    datas = [json.load(open(r)) for r in runs]
    queries = {}
    for d in datas:
        for q, t in d["queries"].items():
            if t < 0:
                continue  # crashed rep never masks a real time
            if q not in queries or t < queries[q]:
                queries[q] = t
    errors = sorted({e for d in datas for e in d.get("errors", [])})
    merged = {
        "metric": "total",
        "value": sum(queries.values()),
        "unit": "sec",
        "n_queries": len(queries),
        "queries": dict(sorted(queries.items())),
        "errors": errors,
        "sf": datas[0]["sf"],
        "note": (
            f"min per query over {len(runs)} solo full-board runs of the "
            f"{len(queries)}-row board this session (each run itself "
            "min-of-2 reps); no co-tenant workloads during any run"
        ),
    }
    json.dump(merged, open(out, "w"), indent=1)
    print(f"{out}: {len(queries)} queries, total {merged['value']:.1f}s, "
          f"errors={errors}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2:])
