#!/usr/bin/env python
"""p90 floor proof (VERDICT r9 #1): job count × measured per-job floor
for every query over the bar, from BENCH_FULL_local.json's
build_jobs/total_jobs census.

The structural claim: a query's wall time cannot go below
(total_jobs × per-job floor) on this harness, because every Spark job
pays scheduler + AQE-replan + Py4J round-trip latency even on empty
data. The per-job floor is MEASURED here by timing back-to-back
1-partition noop jobs on the live session. Multi-action ops (bounded
collects, eager/lazy checkpoint materializations, index builds) are
job-count-heavy BY DESIGN — their tail is a floor product, not a plan
defect; the single-action p90 (bench.py's p90_1act) is the metric that
tracks plan quality.

Usage: python tools/floor_report.py [--bar 0.8] (prints a markdown
table; run right after a full bench.py so the census is fresh).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def measure_job_floor(spark, n: int = 30) -> float:
    """Median latency of a minimal 1-task job on the live session."""
    sc = spark.sparkContext
    ts = []
    rdd = sc.parallelize([1], 1)
    rdd.count()  # warm
    for _ in range(n):
        t0 = time.perf_counter()
        rdd.count()
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--bar", type=float, default=0.8)
    ap.add_argument(
        "--full", default=os.path.join(REPO, "BENCH_FULL_local.json")
    )
    args = ap.parse_args()

    with open(args.full) as fh:
        d = json.load(fh)
    q, bj, tj = d["queries"], d["build_jobs"], d.get("total_jobs", {})

    from sparkify_datalake_spark.session import get_spark

    spark = get_spark("floor-report")
    floor = measure_job_floor(spark)
    spark.stop()

    over = sorted(
        ((v, k) for k, v in q.items() if v > args.bar), reverse=True
    )
    single = [v for k, v in q.items() if bj.get(k, 0) == 0]
    multi = [v for k, v in q.items() if bj.get(k, 0) > 0]

    def p90(xs):
        xs = sorted(xs)
        return xs[min(int(len(xs) * 0.9), len(xs) - 1)] if xs else None

    print(f"per-job floor (median of 30 one-task jobs): {floor*1000:.0f} ms")
    print(
        f"p90 all={p90(list(q.values()))}s  "
        f"p90 single-action (n={len(single)})={p90(single)}s  "
        f"p90 multi-action (n={len(multi)})={p90(multi)}s"
    )
    print()
    print("| query | sec | build jobs | total jobs | floor (jobs×f) | excess |")
    print("|---|---|---|---|---|---|")
    for v, k in over:
        j = tj.get(k)
        fl = round(j * floor, 2) if j else None
        ex = round(v - fl, 2) if fl is not None else None
        print(
            f"| `{k}` | {v} | {bj.get(k, '?')} | {j or '?'} |"
            f" {fl if fl is not None else '?'} | {ex if ex is not None else '?'} |"
        )


if __name__ == "__main__":
    main()
