#!/usr/bin/env python
"""Merge a `bench_vs_duckdb.py --only` rerun into the main
BENCH_VS_DUCKDB json and recompute the gate rollup.

Used when query code changes while the full sweep is in flight: rerun
just the changed names on the final code, then
    python tools/bvd_merge.py main.json patch.json out.json
The patched names are recorded in `patched_queries` for provenance.
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    main_path, patch_path, out_path = sys.argv[1:4]
    d = json.load(open(main_path))
    p = json.load(open(patch_path))
    d["queries"].update(p["queries"])
    floor = d["floor_sec"]
    gate = {
        n: r
        for n, r in d["queries"].items()
        if r.get("duck_sec") and r["duck_sec"] >= floor and r.get("spark_sec")
    }
    d["gate_queries"] = sorted(gate)
    d["n_compared"] = len(gate)
    d["spark_total_sec"] = round(
        sum(r["spark_sec"] for r in gate.values()), 2
    )
    d["duck_total_sec"] = round(sum(r["duck_sec"] for r in gate.values()), 2)
    d["suite_ratio"] = (
        round(d["spark_total_sec"] / d["duck_total_sec"], 3)
        if d["duck_total_sec"]
        else None
    )
    d["patched_queries"] = sorted(
        set(d.get("patched_queries", [])) | set(p["queries"])
    )
    with open(out_path, "w") as fh:
        json.dump(d, fh, indent=1, sort_keys=True)
    print(
        json.dumps(
            {
                k: d[k]
                for k in (
                    "n_compared",
                    "spark_total_sec",
                    "duck_total_sec",
                    "suite_ratio",
                )
            }
        )
    )


if __name__ == "__main__":
    main()
