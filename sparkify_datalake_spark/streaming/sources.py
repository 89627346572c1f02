"""Streaming source adapters — the seam between topology and transport
(VERDICT r3 next-round item #8).

Every topology in ``streaming/runtime.py`` consumes a *source
provider*: a callable ``SparkSession -> streaming DataFrame`` with the
event schema. The topology (watermarks, windows, state machines, joins)
is therefore transport-agnostic: tests replay files, CI can inject the
rate source, and production swaps in Kafka — none of which touches the
operator code. This is the same inversion Structured Streaming itself
uses (``format(...)`` picks the source, the query plan is unchanged).

Providers:

- ``file_replay_source(path)`` — parquet-directory replay, one file per
  micro-batch (deterministic; what the test suite drives).
- ``rate_events_source(rows_per_second)`` — Spark's built-in ``rate``
  source mapped onto the event schema (synthetic, unbounded; proves the
  seam with a second, genuinely different transport).
- ``kafka_events_source(bootstrap, topic)`` — the production adapter:
  Kafka value-JSON → event schema. The sandbox ships no
  ``spark-sql-kafka`` package (no network), so *constructing the plan*
  raises AnalysisException here; the adapter documents the exact
  production shape and is import-safe (nothing evaluates until called).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Union

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENT_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
    ]
)

SourceProvider = Callable[[SparkSession], DataFrame]
# Topologies accept either a provider or a bare path (wrapped into
# file_replay_source for backward compatibility with round-1..3 calls).
SourceLike = Union[str, SourceProvider]


def file_replay_source(path: str) -> SourceProvider:
    """Parquet-directory replay: one file per micro-batch (mtime order)."""

    def provide(spark: SparkSession) -> DataFrame:
        return (
            spark.readStream.schema(EVENT_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(path)
        )

    return provide


def rate_events_source(rows_per_second: int = 100) -> SourceProvider:
    """Synthetic unbounded events from the built-in ``rate`` source.

    ``rate`` emits (timestamp, value); the map onto the event schema is
    deterministic in ``value``, so downstream assertions can reason
    about user/type distributions. Used by tests to prove topologies
    are transport-agnostic — same plan, different source.
    """

    def provide(spark: SparkSession) -> DataFrame:
        raw = (
            spark.readStream.format("rate")
            .option("rowsPerSecond", rows_per_second)
            .load()
        )
        return raw.select(
            F.col("value").alias("event_id"),
            F.col("timestamp").alias("ts"),
            (F.col("value") % 100).alias("user_id"),
            F.element_at(
                F.array(F.lit("view"), F.lit("click"), F.lit("purchase")),
                (F.col("value") % 3 + 1).cast("int"),
            ).alias("event_type"),
        )

    return provide


def kafka_events_source(
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "latest",
) -> SourceProvider:
    """Production adapter: Kafka value-JSON → event schema.

    Requires the ``spark-sql-kafka-0-10`` package on the classpath
    (absent in this sandbox — calling the provider raises at plan
    construction, which is the correct failure point: the topology
    never partially runs against a missing transport). At scale,
    partitions map 1:1 Kafka→Spark and the watermark bounds state
    exactly as with any other source — that invariance is the point of
    the seam.
    """

    def provide(spark: SparkSession) -> DataFrame:
        raw = (
            spark.readStream.format("kafka")
            .option("kafka.bootstrap.servers", bootstrap_servers)
            .option("subscribe", topic)
            .option("startingOffsets", starting_offsets)
            .load()
        )
        return raw.select(
            F.from_json(
                F.col("value").cast("string"), EVENT_SCHEMA
            ).alias("e")
        ).select("e.*")

    return provide


def resolve_source(src: SourceLike, spark: SparkSession) -> DataFrame:
    """Turn a path-or-provider into a streaming DataFrame."""
    if callable(src):
        return src(spark)
    return file_replay_source(src)(spark)
