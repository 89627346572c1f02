"""Scan operators (SURVEY.md §2-A): full scan, column pruning, predicate
pushdown, and the nanosecond-timestamp scan.

Scale notes (100 TB): these queries are *declarative* so Catalyst pushes
projection and predicates into the Parquet reader — `.explain` shows
``ReadSchema`` limited to selected columns and ``PushedFilters`` reaching
row-group min/max skipping. At cluster scale that is the difference
between scanning 100 TB and scanning the 2 columns × matching row groups
actually needed. tests/test_plans.py asserts both properties on the
physical plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkify_datalake_spark.registry import query
from sparkify_datalake_spark.sources.load import load


@query("scan_full", "SELECT * FROM region")
def scan_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full scan, all columns — the minimal end-to-end read path."""
    return load(spark, sf_dir, "region")


@query(
    "scan_prune_columns",
    "SELECT l_orderkey, l_quantity FROM lineitem",
)
def scan_prune_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column pruning: 2 of 11 lineitem columns reach the Parquet reader."""
    return load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")


@query(
    "scan_filter_pushdown",
    "SELECT * FROM orders WHERE o_orderstatus = 'F'",
)
def scan_filter_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered scan; the equality predicate is pushed to Parquet."""
    return load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")


@query(
    "scan_events_ns",
    """
SELECT event_id, date_trunc('second', ts) AS ts_s, event_type
FROM events
""",
)
def scan_events_ns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan the TIMESTAMP(NANOS) table Spark can't read natively.

    The loader reads it via nanosAsLong and rebuilds a µs timestamp
    (SURVEY §7.3-R1); project second-truncation to stay precision-safe.
    """
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.date_trunc("second", F.col("ts")).cast("timestamp_ntz").alias("ts_s"),
        "event_type",
    )
