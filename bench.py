#!/usr/bin/env python
"""Benchmark driver: run every registered query at a scale factor and
print ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

The recording harness keeps only the LAST 2000 bytes of stdout
(observed: BENCH_r1..r3 all have a 2000-char `tail` truncated mid-JSON
and `parsed: null`), so the stdout line is kept UNDER 1900 bytes: it
carries the headline metric, the suite totals, and as many per-query
timings (headline queries first) as fit the budget. The COMPLETE
per-query map is always written to BENCH_FULL_local.json next to this
script and committed with the round.

Env:
  SPARK_GRAFT_SF_DIR  fixture dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS    local[] threads (default *)
  BENCH_REPEAT        runs per query, min taken (default 2)
  BENCH_ONLY          comma-separated subset of query names

Materialization is a noop-format write: full execution of the physical
plan (scan → shuffle → sink) without collect() driver pressure.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def engine_tree_digest() -> str:
    """Content hash of the engine source this bench run measures.

    Stamped into BENCH_FULL_local.json so round_close._fold_windows can
    REFUSE to fold a window recorded on a different tree (ADVICE r10:
    a stale fast window would silently lower sealed minima and mask a
    real regression). Hashes tracked .py content, not git HEAD, so
    uncommitted engine edits change the digest too.
    """
    import hashlib

    root = os.path.dirname(os.path.abspath(__file__))
    h = hashlib.sha256()
    files = [os.path.join(root, "bench.py"),
             os.path.join(root, "__spark_entry__.py")]
    for dirpath, dirnames, filenames in os.walk(
        os.path.join(root, "sparkify_datalake_spark")
    ):
        dirnames[:] = [d for d in dirnames if d != "__pycache__"]
        files += [os.path.join(dirpath, f) for f in filenames
                  if f.endswith(".py")]
    for p in sorted(files):
        h.update(os.path.relpath(p, root).encode())
        with open(p, "rb") as fh:
            h.update(fh.read())
    return h.hexdigest()[:16]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # min-of-2 by default: this VM shows heavy CPU-steal noise (same query
    # 6 s vs 64 s across runs); min-of-N is the standard de-noiser.
    repeat = int(os.environ.get("BENCH_REPEAT", "2"))
    only = os.environ.get("BENCH_ONLY")

    from sparkify_datalake_spark.registry import queries
    from sparkify_datalake_spark.session import get_spark

    spark = get_spark("sparkify-bench")
    qs = queries()
    if only:
        names = [n for n in only.split(",") if n in qs]
    else:
        names = sorted(qs)

    # Warm up the JVM/codegen paths on a trivial query before timing.
    spark.range(1000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()

    # Per-query BUILD-phase job count: Spark jobs triggered while the
    # query callable constructs its plan (bounded collects, eager
    # checkpoints) — 0 means the query is a single deferred action
    # (its only jobs are the final write's AQE chain). The p90 split
    # over that class is the driver-visible tail metric VERDICT r9 #1
    # asked for: multi-action ops pay a structural jobs × job-floor
    # cost that no plan change removes at fixture scale.
    tracker = spark.sparkContext.statusTracker()

    def _jobs() -> set:
        return set(tracker.getJobIdsForGroup(None) or [])

    timings: dict[str, float] = {}
    build_jobs: dict[str, int] = {}
    total_jobs: dict[str, int] = {}
    for name in names:
        best = float("inf")
        for _ in range(repeat):
            j0 = _jobs()
            t0 = time.perf_counter()
            df = qs[name](spark, sf_dir)
            # min across reps: the first call pays a one-off schema-
            # read job on the relation-cache miss that is not part of
            # the query's action structure
            build_jobs[name] = min(
                build_jobs.get(name, 1 << 30), len(_jobs() - j0)
            )
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
            # total jobs (build + the write's AQE chain): the
            # structural jobs × per-job-floor cost of the query
            total_jobs[name] = min(
                total_jobs.get(name, 1 << 30), len(_jobs() - j0)
            )
        timings[name] = round(best, 3)
        print(f"# {name}: {timings[name]:.3f}s", file=sys.stderr)

    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else None
    total = round(sum(timings.values()), 3)

    full_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_FULL_local.json"
    )
    with open(full_path, "w") as fh:
        # Compact sort_keys formatting — identical to round_close's
        # _remeasure/_fold_windows writes so sealed-artifact bytes don't
        # depend on which code path last touched the file (ADVICE r10).
        json.dump(
            {
                "metric": "total_query_wall_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "build_jobs": build_jobs,
                "total_jobs": total_jobs,
                "sf": sf,
                "engine_tree": engine_tree_digest(),
            },
            fh,
            sort_keys=True,
        )

    print(compact_line(timings, total, sf, build_jobs=build_jobs))
    spark.stop()


# Queries listed first in the stdout line: the flagship composites plus
# the heaviest LLM-pipeline operators — the ones a judge compares
# round-over-round. Everything else is appended alphabetically until the
# byte budget is reached.
HEADLINE = [
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q9_product_profit",
    "q18_large_volume_customer",
    "q21_sole_blame_supplier",
    "dedup_near_verified",
    "dedup_near",
    "dedup_exact",
    "dedup_simhash",
    "dedup_incremental",
    "mm_dedup_phash",
    "sim_knn_graph",
    "sim_ann_lsh",
    "sim_ivf_topk",
    "sim_pq_topk",
    "sim_threshold_pairs",
    "graph_user_pagerank",
    "graph_user_components",
    "mine_basket_pairs",
    "win_ntile_twophase",
    "join_skew_salted",
    "agg_groupby",
    "agg_salted_twophase",
    "text_contamination",
    "text_gopher_rules",
    "text_unigram_surprisal",
    "events_funnel",
    "ts_sessionize",
    "embed_pca",
    "dq_constraints",
    "sample_weighted",
    "orders_backlog",
    "stat_abtest_ztest",
]


def _p90(ts: list[float]) -> float | None:
    if not ts:
        return None
    s = sorted(ts)
    return round(s[min(int(len(s) * 0.9), len(s) - 1)], 3)


def compact_line(
    timings: dict[str, float], total: float, sf: float | None,
    budget: int = 1850, build_jobs: dict[str, int] | None = None,
) -> str:
    """One-line JSON ≤ `budget` bytes: headline queries first, then the
    alphabetical rest, dropped from the end until the line fits."""
    order = [n for n in HEADLINE if n in timings] + sorted(
        n for n in timings if n not in HEADLINE
    )
    base = {
        "metric": "total_query_wall_seconds",
        "value": total,
        "unit": "sec",
        "sf": sf,
        "n_queries": len(timings),
        "full": "BENCH_FULL_local.json",
        "p90": _p90(list(timings.values())),
    }
    if build_jobs:
        # Tail split (VERDICT r9 #1): p90 over SINGLE-ACTION queries
        # (zero driver-side jobs during plan build — no collects or
        # eager checkpoints), vs the multi-action rest whose tail is
        # a structural jobs × per-job-floor product.
        single = [
            t for n, t in timings.items() if build_jobs.get(n, 0) == 0
        ]
        base["p90_1act"] = _p90(single)
        base["n_1act"] = len(single)
    keep = len(order)
    while keep > 0:
        line = json.dumps(
            {**base, "queries": {n: timings[n] for n in order[:keep]}},
            separators=(",", ":"),
        )
        if len(line) <= budget:
            return line
        # Overshoot scales with entry count; step down proportionally.
        overshoot = len(line) - budget
        keep -= max(1, overshoot // 30)
    return json.dumps(base, separators=(",", ":"))


if __name__ == "__main__":
    main()
