#!/usr/bin/env python
"""Reconstruct a bench_vs_duckdb result JSON from interrupted-run logs.

The 64× sweep runs ~2h; when a session ends mid-sweep the per-query
results exist only as `# name: spark=… duck=… ratio=…` stderr lines.
This tool parses one or more such logs (later logs win on overlap —
pass them oldest-first), overlays an optional `--patch` JSON produced
by a `bench_vs_duckdb.py --only` rerun on final code (patch wins over
logs; its names are recorded in `patched_queries`), and recomputes the
gate rollup with the same floor rule as the main tool.

Usage:
  python tools/bvd_assemble.py --log /tmp/bvd_err.log /tmp/bvd2_err.log \
      --patch /tmp/bvd_patch2.json --out BENCH_VS_DUCKDB_x64.json
"""

from __future__ import annotations

import argparse
import json
import re

LINE = re.compile(
    r"# ([a-z0-9_]+): spark=([0-9.]+|None) duck=([0-9.]+|None) "
    r"ratio=([0-9.]+|None)"
)


def parse_log(path: str) -> dict[str, dict]:
    rows: dict[str, dict] = {}
    txt = open(path, errors="replace").read()
    for m in LINE.finditer(txt):
        name, s, d, r = m.groups()
        rows[name] = {
            "spark_sec": None if s == "None" else float(s),
            "duck_sec": None if d == "None" else round(float(d), 3),
            "ratio": None if r == "None" else float(r),
        }
    return rows


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--log", nargs="+", required=True)
    ap.add_argument("--patch", nargs="*", default=[])
    ap.add_argument("--fixture", default="/tmp/sparkify_probe_x64_v2")
    ap.add_argument("--scale", type=float, default=64.0)
    ap.add_argument("--floor", type=float, default=0.15)
    ap.add_argument("--repeat", type=int, default=2)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    queries: dict[str, dict] = {}
    for path in args.log:
        queries.update(parse_log(path))

    patched: set[str] = set()
    exponents: dict = {}
    excluded = ["dedup_embed", "sim_knn_graph", "sim_threshold_pairs"]
    for path in args.patch:
        p = json.load(open(path))
        queries.update(p["queries"])
        patched |= set(p["queries"])
        exponents.update(p.get("scaling_exponents_8x_to_64x", {}))
        excluded = p.get("excluded_quadratic_by_design", excluded)

    gate = {
        n: r
        for n, r in queries.items()
        if r.get("duck_sec") and r["duck_sec"] >= args.floor
        and r.get("spark_sec")
    }
    spark_total = round(sum(r["spark_sec"] for r in gate.values()), 2)
    duck_total = round(sum(r["duck_sec"] for r in gate.values()), 2)
    result = {
        "fixture": args.fixture,
        "scale_vs_sf0.1": args.scale,
        "floor_sec": args.floor,
        "repeat": args.repeat,
        "n_compared": len(gate),
        "spark_total_sec": spark_total,
        "duck_total_sec": duck_total,
        "suite_ratio": round(spark_total / duck_total, 3)
        if duck_total else None,
        "queries": queries,
        "gate_queries": sorted(gate),
        "excluded_quadratic_by_design": excluded,
        "scaling_exponents_8x_to_64x": exponents,
        "patched_queries": sorted(patched),
        "provenance": (
            "per-query rows parsed from interrupted-sweep stderr logs; "
            "patched_queries re-measured on final code via --only"
        ),
    }
    with open(args.out, "w") as fh:
        json.dump(result, fh, indent=1, sort_keys=True)
    print(json.dumps({k: result[k] for k in (
        "n_compared", "spark_total_sec", "duck_total_sec", "suite_ratio"
    )}))


if __name__ == "__main__":
    main()
