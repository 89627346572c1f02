#!/usr/bin/env python
"""Three-point scaling exponents for the sealed tail ops (VERDICT r9
#5): 8× → 64× → 256× over the deterministic probe fixtures.

The 8×→64× two-point fit under-resolves ops whose small-point time sits
near the scheduler job floor (fixed overhead deflates the measured
exponent); the 256× tier separates a real super-linear term from floor
noise. Fits both segment exponents and the overall 8×→256× slope.

Writes SCALE_256.json at the repo root and prints one row per op.
Usage:
    SPARK_GRAFT_DRIVER_MEM=48g python tools/scale_probe_256.py \
        [--ops a,b,c] [--repeats 2]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

_TIERS = {
    8.0: "/tmp/sparkify_probe_x8_v2",
    64.0: "/tmp/sparkify_probe_x64_v2",
    256.0: "/tmp/sparkify_probe_x256_v2",
}

# The r9-sealed top-10 tail + the wedge-join family + the exact-kNN
# anchor the verdict called out (sim_knn_graph is O(n^2/blocks) BY
# DESIGN — its exponent is reported, not bounded).
_DEFAULT_OPS = [
    "dedup_near_verified",
    "graph_user_pagerank",
    "pipeline_star_etl",
    "graph_link_prediction",
    "mine_basket_pairs",
    "dedup_incremental",
    "graph_label_propagation",
    "mine_basket_triples",
    "dedup_near",
    "join_scd2_pit",
    "graph_clustering_coefficient",
    "graph_triangle_count",
    "sim_knn_graph",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ops", default=",".join(_DEFAULT_OPS))
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument(
        "--tiers",
        default="8,64,256",
        help="comma list of tiers to run (subset of 8,64,256) — for "
        "by-design-quadratic anchors (sim_knn_graph) whose 256x point "
        "would be a multi-hour O(n^2) burn; pair with --cap to record "
        "WHY the top tier is skipped in the artifact",
    )
    ap.add_argument(
        "--cap",
        default=None,
        help="documented-cap note stored as {'capped': ...} on every "
        "op in this invocation (only meaningful with a reduced --tiers)",
    )
    ap.add_argument(
        "--out", default=os.path.join(REPO, "SCALE_256.json")
    )
    ap.add_argument(
        "--isolate",
        action="store_true",
        help="run each op in its own subprocess/JVM: a heap death on "
        "one 256x op otherwise kills the session and cascades "
        "instant failures onto every later op (hit round 10 with "
        "mine_basket_pairs)",
    )
    args = ap.parse_args()

    if args.isolate:
        import subprocess
        import tempfile

        merged: dict[str, dict] = {}
        if os.path.exists(args.out):
            with open(args.out) as fh:
                merged = json.load(fh)
        for name in args.ops.split(","):
            with tempfile.NamedTemporaryFile(suffix=".json") as tf:
                cmd = [sys.executable, os.path.abspath(__file__),
                       "--ops", name, "--repeats", str(args.repeats),
                       "--tiers", args.tiers, "--out", tf.name]
                if args.cap:
                    cmd += ["--cap", args.cap]
                r = subprocess.run(cmd, env=dict(os.environ))
                try:
                    with open(tf.name) as fh:
                        merged.update(json.load(fh))
                except (json.JSONDecodeError, OSError):
                    merged[name] = {"failed": f"subprocess rc={r.returncode}"}
                    print(f"{name}: subprocess died rc={r.returncode}",
                          flush=True)
            # Flush after EVERY op: a kill mid-run (or a later heap
            # death taking the parent with it) keeps completed points.
            with open(args.out, "w") as fh:
                json.dump(merged, fh, indent=1, sort_keys=True)
        return

    from gen_probe_fixture import generate

    from sparkify_datalake_spark.registry import queries
    from sparkify_datalake_spark.session import get_spark

    wanted = {float(t) for t in args.tiers.split(",")}
    tiers = {s: d for s, d in _TIERS.items() if s in wanted}
    spark = get_spark("scale-256")
    for scale, d in tiers.items():
        generate(spark, d, scale)
    qs = queries()
    spark.range(1000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()

    out: dict[str, dict] = {}
    for name in args.ops.split(","):
        times: dict[str, float] = {}
        failed = None
        for scale, d in sorted(tiers.items()):
            best = float("inf")
            try:
                for _ in range(args.repeats):
                    t0 = time.monotonic()
                    qs[name](spark, d).write.format("noop").mode(
                        "overwrite"
                    ).save()
                    best = min(best, time.monotonic() - t0)
            except Exception as exc:  # disk-full/OOM: isolate the op
                failed = f"x{int(scale)}: {type(exc).__name__}"
                break
            times[f"x{int(scale)}"] = round(best, 2)
        if failed is not None:
            out[name] = {**times, "failed": failed}
            print(f"{name}: FAILED at {failed} (times so far {times})",
                  flush=True)
            continue
        exps = {}
        if "x8" in times and "x64" in times:
            exps["exp_8_64"] = round(
                math.log(times["x64"] / times["x8"]) / math.log(8), 2
            )
        if "x64" in times and "x256" in times:
            exps["exp_64_256"] = round(
                math.log(times["x256"] / times["x64"]) / math.log(4), 2
            )
        if "x8" in times and "x256" in times:
            exps["exp_8_256"] = round(
                math.log(times["x256"] / times["x8"]) / math.log(32), 2
            )
        out[name] = {**times, **exps}
        if args.cap:
            out[name]["capped"] = args.cap
        print(f"{name}: {times} => {exps}", flush=True)
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    spark.stop()


if __name__ == "__main__":
    main()
