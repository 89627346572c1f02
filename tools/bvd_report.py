#!/usr/bin/env python
"""Render BENCH_VS_DUCKDB_x64.json as the BENCH.md markdown section:
gate rollup, per-query table (worst ratios first), exponent fits.

    python tools/bvd_report.py [BENCH_VS_DUCKDB_x64.json]
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "BENCH_VS_DUCKDB_x64.json"
    )
    d = json.load(open(path))
    gate = {
        n: d["queries"][n]
        for n in d["gate_queries"]
        if d["queries"][n].get("ratio") is not None
    }
    print(
        f"- Fixture {d['fixture']} ({d['scale_vs_sf0.1']:.0f}× sf0.1 row "
        f"counts ≈ sf{d['scale_vs_sf0.1'] / 10:.1f}), min-of-"
        f"{d['repeat']} per engine, oracle floor {d['floor_sec']} s."
    )
    print(
        f"- **Gate rollup over the {d['n_compared']} queries whose DuckDB "
        f"oracle does ≥ {d['floor_sec']} s of work at this scale: Spark "
        f"{d['spark_total_sec']} s vs DuckDB {d['duck_total_sec']} s = "
        f"**{d['suite_ratio']}×**.**"
    )
    n_win = sum(1 for r in gate.values() if r["ratio"] < 1.0)
    n_gate_pass = sum(1 for r in gate.values() if r["ratio"] <= 2.0)
    print(
        f"- Per-query: Spark outright faster on {n_win}/{len(gate)}, "
        f"within the 2× gate on {n_gate_pass}/{len(gate)}."
    )
    excl = d.get("excluded_quadratic_by_design", [])
    if excl:
        print(
            f"- Named-cause exclusions (exact all-pairs kernels, both "
            f"engines O(n²) by design, Spark already faster at sf0.1): "
            + ", ".join(f"`{e}`" for e in excl)
        )
    print()
    print("| query | spark s | duck s | ratio |")
    print("|---|---|---|---|")
    for n, r in sorted(gate.items(), key=lambda kv: -kv[1]["ratio"]):
        print(
            f"| `{n}` | {r['spark_sec']} | {r['duck_sec']} | "
            f"{r['ratio']} |"
        )
    print()
    exps = d.get("scaling_exponents_8x_to_64x", {})
    if exps:
        print("8×→64× fitted Spark scaling exponents "
              "(t ∝ n^e; 1.0 = linear):")
        print()
        print("| op | t(8×) s | t(64×) s | exponent |")
        print("|---|---|---|---|")
        for n, e in sorted(exps.items()):
            print(
                f"| `{n}` | {e['t_pre']} | {e['t_main']} | "
                f"{e['exponent']} |"
            )
    # anomalies: compared but errored/timed out
    bad = {
        n: r for n, r in d["queries"].items()
        if r.get("duck_err") or r.get("spark_err")
    }
    if bad:
        print()
        print("Errors/timeouts during the sweep:")
        for n, r in sorted(bad.items()):
            print(f"- `{n}`: {r.get('duck_err') or r.get('spark_err')}")


if __name__ == "__main__":
    main()
