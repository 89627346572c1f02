"""Streaming window semantics (SURVEY.md §2-J), hash-checked in batch.

These three queries use event-time window semantics identical between
batch and Structured Streaming — the same ``F.window`` / ``session_window``
expressions run unchanged under ``readStream`` (streaming/runtime.py +
tests/test_streaming.py exercise the real streaming runtime with
watermarks and state).

Scale notes (100 TB stream): tumbling/sliding aggregation state is
O(open windows × groups) per partition and evicted by watermark; session
windows shuffle on the session key (user_id). All three shapes run with
partial aggregation before the shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkify_datalake_spark.functions.determinism import dec_sum, sql_dec_sum
from sparkify_datalake_spark.registry import query
from sparkify_datalake_spark.sources.load import load


@query(
    "stream_tumbling",
    f"""
SELECT date_trunc('hour', ts) AS window_start, event_type,
  count(*) AS n_events,
  {sql_dec_sum("value", "sum_value")}
FROM events
GROUP BY date_trunc('hour', ts), event_type
""",
)
def stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling windows: count + sum(value) per event_type."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dec_sum("value", "sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@query(
    "stream_sliding",
    f"""
WITH assigned AS (
  SELECT time_bucket(INTERVAL '30 minutes', ts) AS window_start,
         event_type, value
  FROM events
  UNION ALL
  SELECT time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes',
         event_type, value
  FROM events
)
SELECT window_start, event_type,
  count(*) AS n_events,
  {sql_dec_sum("value", "sum_value")}
FROM assigned
GROUP BY window_start, event_type
""",
)
def stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour windows sliding every 30 minutes (each event in 2 windows)."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dec_sum("value", "sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@query(
    "stream_session",
    """
WITH flagged AS (
  SELECT user_id, ts,
    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
              >= INTERVAL '10 minutes'
         THEN 1 ELSE 0 END AS new_session
  FROM events
), numbered AS (
  SELECT user_id, ts,
    sum(new_session) OVER (
      PARTITION BY user_id ORDER BY ts
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM flagged
)
SELECT user_id,
  min(ts) AS session_start,
  max(ts) + INTERVAL '10 minutes' AS session_end,
  count(*) AS n_events
FROM numbered
GROUP BY user_id, session_id
""",
)
def stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-minute-gap session windows per user.

    Spark's session_window: window end = last event + gap; two events
    merge when the younger is strictly inside the older's window. The
    oracle is the classic gaps-and-islands rewrite with the same
    boundary (gap >= 10 min starts a new session).
    """
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.session_window("ts", "10 minutes").alias("w"), "user_id"
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )
