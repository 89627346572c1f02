"""Structured Streaming runtime helpers (SURVEY.md §2-J `test` rows:
stream_watermark_late, stream_stateful_dedup).

Batch queries in streaming/windows.py prove the *semantics*; this module
runs the *runtime*: file-source replay → watermark-governed state →
memory sink. tests/test_streaming.py drives it.

Scale notes (100 TB stream): the same topology runs against Kafka by
swapping the source; watermark delay bounds state size (windows/dedup
keys older than watermark are evicted), and ``dropDuplicatesWithinWatermark``
keeps one state entry per key within the horizon instead of forever.

Source seam: every topology takes ``src: SourceLike`` — a path (file
replay, backward compatible) OR a source provider from
``streaming/sources.py`` (rate, Kafka). The topology code never names
a transport; tests/test_streaming.py proves the same topology runs
unchanged on file replay and on the rate source.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkify_datalake_spark.streaming.sources import (
    EVENT_SCHEMA,
    SourceLike,
    resolve_source,
)


def write_replay_batch(
    spark: SparkSession, path: str, rows: list[tuple], batch_name: str
) -> None:
    """Write one replay file into the streaming source directory."""
    os.makedirs(path, exist_ok=True)
    df = spark.createDataFrame(rows, EVENT_SCHEMA)
    df.coalesce(1).write.mode("append").parquet(path)
    # Touch marker so each call lands in distinct files (mtime ordering).
    _ = batch_name


def windowed_counts_stream(
    spark: SparkSession, src: SourceLike, watermark: str = "10 minutes"
) -> DataFrame:
    """Watermarked 10-minute tumbling counts over any event source."""
    stream = resolve_source(src, spark)
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "10 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "n_events")
    )


def session_counts_stream(
    spark: SparkSession,
    src: SourceLike,
    gap: str = "10 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked session windows per user — the Structured-Streaming
    runtime twin of the batch `stream_session` query (streaming/
    windows.py): identical `session_window` expression, same output
    schema, but run through readStream where the engine MERGES a
    micro-batch's events into existing session state (two sessions
    whose windows overlap collapse into one, extending the end to
    last-event + gap) and emits a session only after the watermark
    passes its end.

    Streaming-specific constraints this topology honors: session
    windows require append mode (update is unsupported) and at least
    one grouping key beside `session_window` (user_id here — which is
    also the shuffle key, so state is partitioned per user and scales
    horizontally; watermark delay bounds how long an open session can
    wait for a straggler before closing).
    """
    stream = resolve_source(src, spark)
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def dedup_stream(
    spark: SparkSession, src: SourceLike, watermark: str = "30 minutes"
) -> DataFrame:
    """Stateful streaming dedup on event_id within the watermark horizon."""
    stream = resolve_source(src, spark)
    return stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def running_counts_stream(spark: SparkSession, src: SourceLike) -> DataFrame:
    """Custom stateful operator: per-event_type running count + last seen id.

    ``applyInPandasWithState`` — the escape hatch when built-in streaming
    aggregations can't express the state machine. The GroupState holds
    (count, max_event_id) per event_type and survives across micro-batches
    (asserted by the runtime test). State is per-key and partitioned by
    the group key, so it scales horizontally; a production operator adds
    a state timeout to bound the key space.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = "event_type string, n_events long, max_event_id long"
    state_schema = "n long, max_id long"

    def update(key, pdfs, state: GroupState):
        n, max_id = state.get if state.exists else (0, -1)
        for pdf in pdfs:
            n += len(pdf)
            max_id = max(max_id, int(pdf["event_id"].max()))
        state.update((n, max_id))
        yield pd.DataFrame(
            {"event_type": [key[0]], "n_events": [n], "max_event_id": [max_id]}
        )

    stream = resolve_source(src, spark)
    return stream.groupBy("event_type").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_to_memory(
    df: DataFrame, table: str, output_mode: str, checkpoint: str
):
    """Start a memory-sink query; caller drives processAllAvailable()."""
    return (
        df.writeStream.format("memory")
        .queryName(table)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint)
        .start()
    )


def click_purchase_join_stream(
    spark: SparkSession, clicks_src: SourceLike, purchases_src: SourceLike
) -> DataFrame:
    """Stream-stream inner join: purchases matched to recent clicks.

    Both sides are unbounded, so Spark buffers each side in state; the
    watermarks + the time-bound join condition (purchase within 30 min
    AFTER the click) tell the engine when buffered rows can never match
    again and get evicted — without the bound, stream-stream join state
    grows forever. Same topology at 100 TB/day: state is per join-key
    partition, watermark delay bounds its size.
    """
    clicks = (
        resolve_source(clicks_src, spark)
        .withWatermark("ts", "1 hour")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
    )
    purchases = (
        resolve_source(purchases_src, spark)
        .withWatermark("ts", "1 hour")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
        )
    )
    return purchases.join(
        clicks,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("click_ts") + F.expr("INTERVAL 30 MINUTES")
        ),
    ).select("p_user", "purchase_id", "click_id", "purchase_ts", "click_ts")


def stream_static_enrich(
    spark: SparkSession, src: SourceLike, dim: DataFrame
) -> DataFrame:
    """Stream ⋈ static-dimension enrichment via broadcast hash join.

    The most common production streaming topology: an unbounded fact
    stream joined to a small static dimension (user → segment). The
    static side is broadcast to every task — NO state store involved
    (unlike stream-stream joins): each micro-batch hash-probes the
    broadcast table, so the join adds zero streaming state and the
    dimension can be swapped by restarting the query. At 100 TB/day the
    same plan holds as long as the dimension fits the broadcast
    threshold; beyond that it becomes a stream-static shuffled join.
    """
    stream = resolve_source(src, spark)
    return stream.join(F.broadcast(dim), "user_id").select(
        "event_id", "user_id", "event_type", "segment"
    )


def click_purchase_left_outer_stream(
    spark: SparkSession, clicks_src: SourceLike, purchases_src: SourceLike
) -> DataFrame:
    """Stream-stream LEFT OUTER join: every click, with its purchase if
    one lands within 30 minutes, else NULL-padded once the watermark
    proves no match can still arrive.

    The semantics the inner join can't show: an unmatched left row is
    held in state until BOTH watermarks pass its join-condition bound,
    then emitted with nulls — so "click without conversion" rows appear
    exactly once, late, and deterministically. State size is identical
    to the inner join (both sides buffer inside the time bound); the
    null-padding decision costs nothing extra. Production telemetry
    uses exactly this shape for abandonment/non-conversion feeds.
    """
    clicks = (
        resolve_source(clicks_src, spark)
        .withWatermark("ts", "10 minutes")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
    )
    purchases = (
        resolve_source(purchases_src, spark)
        .withWatermark("ts", "10 minutes")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
        )
    )
    return clicks.join(
        purchases,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("click_ts") + F.expr("INTERVAL 30 MINUTES")
        ),
        "left_outer",
    ).select("c_user", "click_id", "purchase_id", "click_ts", "purchase_ts")
