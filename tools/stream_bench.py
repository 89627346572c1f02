#!/usr/bin/env python
"""Streaming-runtime throughput bench (VERDICT r10 #3).

The streaming surface is semantically verified (watermarks, session
merge, exactly-once sink, stream-stream join — tests/test_streaming.py)
but had no measured throughput. This benches the two production paths:

1. `ingest_lifecycle` — documents replayed as parquet micro-batches
   through the `stream_ingest_vacuum_lifecycle` path: file-source
   readStream → foreachBatch(dedup_store_ingest) against a live
   signature store, with `dedup_store_vacuum` interleaved mid-stream
   (the maintenance cadence the lifecycle test pins semantically).
   Metric: sustained ingested docs/s over the whole lifecycle wall
   (vacuums INCLUDED — that is the honest ingestion rate a 100 TB
   pipeline sees), plus per-micro-batch latency quantiles and vacuum
   cost.

2. `events_tumbling` — raw events replayed as parquet micro-batches
   through a watermarked 1-hour tumbling window aggregation
   (stream_tumbling's expressions under readStream, update mode).
   Metric: sustained events/s + per-batch latency quantiles.

Tiers: sf0.1 (driver fixtures) and the 8× probe fixture. Writes
STREAM_BENCH.json at the repo root and prints one row per tier.

Usage:  python tools/stream_bench.py [--batches 16] [--tiers sf0.1,x8]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

TIERS = {
    "sf0.1": "/root/testdata/sf0.1",
    "x8": "/tmp/sparkify_probe_x8_v2",
}


def _quantiles(ms: list[float]) -> dict:
    if not ms:
        return {}
    s = sorted(ms)

    def pick(q: float) -> float:
        return round(s[min(int(len(s) * q), len(s) - 1)], 1)

    return {"p50_ms": pick(0.5), "p90_ms": pick(0.9), "max_ms": round(s[-1], 1)}


def _progress_latencies(q) -> list[float]:
    out = []
    for p in q.recentProgress:
        if isinstance(p, str):
            p = json.loads(p)
        if p.get("numInputRows", 0) > 0:
            out.append(float(p["durationMs"]["triggerExecution"]))
    return out


def _slices(df, n_batches: int, order_col: str):
    """Split df into n_batches equal slices by order_col (ntile over a
    global sort — bench SETUP, not the measured path)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    b = df.withColumn(
        "_b", F.ntile(n_batches).over(Window.orderBy(order_col))
    )
    return [
        b.filter(F.col("_b") == i + 1).drop("_b") for i in range(n_batches)
    ]


def bench_ingest(spark, sf_dir: str, n_batches: int) -> dict:
    from pyspark.sql import functions as F

    import sparkify_datalake_spark.operators.dedup_incremental as inc
    from sparkify_datalake_spark.sources.load import load

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    cut = docs.agg(F.expr("percentile_approx(doc_id, 0.2)")).collect()[0][0]
    base = docs.filter(F.col("doc_id") <= int(cut))
    stream_docs = docs.filter(F.col("doc_id") > int(cut))

    work = tempfile.mkdtemp(prefix="stream_bench_")
    store = os.path.join(work, "store")
    src = os.path.join(work, "src")
    chk = os.path.join(work, "chk")
    os.makedirs(src)
    try:
        inc.dedup_store_build(spark, base, store)
        n_rows = stream_docs.count()
        slices = _slices(stream_docs, n_batches, "doc_id")
        half = n_batches // 2

        latencies: list[float] = []

        def run_segment() -> float:
            # one writeStream per segment; the checkpoint carries the
            # file-source offset, so segment 2 resumes past segment 1's
            # files. The vacuum between segments sees a quiesced store
            # (the lifecycle contract).
            t0 = time.monotonic()
            q = (
                spark.readStream.schema("doc_id long, text string")
                .option("maxFilesPerTrigger", 1)
                .parquet(src)
                .writeStream.foreachBatch(
                    lambda b, _i: None
                    if b.isEmpty()
                    else inc.dedup_store_ingest(b.sparkSession, b, store)
                )
                .option("checkpointLocation", chk)
                .start()
            )
            try:
                q.processAllAvailable()
            finally:
                q.stop()
            latencies.extend(_progress_latencies(q))
            return time.monotonic() - t0

        t_total0 = time.monotonic()
        for s in slices[:half]:
            s.coalesce(1).write.mode("append").parquet(src)
        t_seg1 = run_segment()
        tv0 = time.monotonic()
        inc.dedup_store_vacuum(spark, store)
        t_vac1 = time.monotonic() - tv0
        for s in slices[half:]:
            s.coalesce(1).write.mode("append").parquet(src)
        t_seg2 = run_segment()
        tv0 = time.monotonic()
        inc.dedup_store_vacuum(spark, store)
        t_vac2 = time.monotonic() - tv0
        wall = time.monotonic() - t_total0

        ingested = spark.read.parquet(f"{store}/reps").count()
        return {
            "rows_replayed": n_rows,
            "store_rows_final": ingested,
            "n_batches": len(latencies),
            "wall_s": round(wall, 2),
            "ingest_rows_per_s": round(n_rows / (t_seg1 + t_seg2), 1),
            "lifecycle_rows_per_s": round(n_rows / wall, 1),
            "vacuum_s": [round(t_vac1, 2), round(t_vac2, 2)],
            "batch_latency": _quantiles(latencies),
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)


def bench_events_tumbling(spark, sf_dir: str, n_batches: int) -> dict:
    from pyspark.sql import functions as F

    from sparkify_datalake_spark.functions.determinism import dec_sum
    from sparkify_datalake_spark.sources.load import load

    ev = load(spark, sf_dir, "events").select(
        "event_id", "ts", "event_type", "value"
    )
    work = tempfile.mkdtemp(prefix="stream_bench_ev_")
    src = os.path.join(work, "src")
    chk = os.path.join(work, "chk")
    os.makedirs(src)
    try:
        n_rows = ev.count()
        for s in _slices(ev, n_batches, "ts"):
            s.coalesce(1).write.mode("append").parquet(src)
        t0 = time.monotonic()
        stream = (
            spark.readStream.schema(
                "event_id long, ts timestamp, event_type string, value double"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .withWatermark("ts", "1 hour")
            .groupBy(F.window("ts", "1 hour"), "event_type")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                dec_sum("value", "sum_value"),
            )
        )
        q = (
            stream.writeStream.outputMode("update")
            .format("noop")
            .option("checkpointLocation", chk)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        wall = time.monotonic() - t0
        return {
            "rows_replayed": n_rows,
            "n_batches": n_batches,
            "wall_s": round(wall, 2),
            "events_per_s": round(n_rows / wall, 1),
            "batch_latency": _quantiles(_progress_latencies(q)),
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, default=16)
    ap.add_argument("--tiers", default="sf0.1,x8")
    ap.add_argument("--out", default=os.path.join(REPO, "STREAM_BENCH.json"))
    args = ap.parse_args()

    from bench import engine_tree_digest
    from sparkify_datalake_spark.session import get_spark

    spark = get_spark("stream-bench")
    out: dict = {"engine_tree": engine_tree_digest(),
                 "batches": args.batches}
    for tier in args.tiers.split(","):
        d = TIERS[tier]
        if not os.path.exists(d):
            from gen_probe_fixture import generate

            generate(spark, d, {"x8": 8.0}[tier])
        out[tier] = {
            "ingest_lifecycle": bench_ingest(spark, d, args.batches),
            "events_tumbling": bench_events_tumbling(
                spark, d, args.batches
            ),
        }
        print(tier, json.dumps(out[tier]), flush=True)
    with open(args.out, "w") as fh:
        json.dump(out, fh, sort_keys=True)
    spark.stop()


if __name__ == "__main__":
    main()
