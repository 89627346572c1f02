"""Bucketed-table writes: pre-shuffled layouts for shuffle-free joins
and aggregations (SURVEY §2-A lakehouse addendum; the Hive/Spark
bucketing feature, tabled in round 5's advice and delivered here).

Why it matters at 100 TB: a fact⋈dim or fact⋈fact equi-join normally
shuffles BOTH sides on the key every time it runs. Writing each table
``bucketBy(n, key)`` hash-partitions rows into n files per partition AT
WRITE TIME; Spark's scan then reports the hash distribution to the
planner, and every later join or aggregation on that key runs with NO
Exchange on the bucketed side — the shuffle is paid once at ingest,
amortized over every downstream query. tests/test_bucketed.py
plan-asserts all three payoffs (join without Exchange, aggregate
without Exchange, bucket pruning on point predicates).

Caveats encoded here rather than discovered in production:
- both join sides must agree on bucket COUNT and key, or Spark
  re-shuffles the mismatched side;
- bucketed tables live in the session catalog (``saveAsTable``) — a
  plain ``.parquet(path)`` write silently drops bucket metadata;
- ``sortBy`` within buckets additionally removes the per-task Sort of
  a sort-merge join on the bucket key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed_table(
    df: DataFrame,
    name: str,
    key: str,
    n_buckets: int = 8,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a bucketed (and optionally bucket-sorted)
    parquet table in the session catalog. Overwrites any prior table
    of the same name."""
    w = df.write.bucketBy(n_buckets, key).mode("overwrite")
    if sort:
        w = w.sortBy(key)
    w.format("parquet").saveAsTable(name)


def executed_plan(df: DataFrame) -> str:
    """The EXECUTED physical plan string (post-AQE input plan) — what
    the bucket assertions read."""
    return df._jdf.queryExecution().executedPlan().toString()


def has_exchange(df: DataFrame) -> bool:
    """True if the physical plan contains any shuffle Exchange."""
    return "Exchange" in executed_plan(df)


def bucketed_scan_info(df: DataFrame) -> list[str]:
    """The ``SelectedBucketsCount`` markers of every bucketed scan in
    the plan (empty list → no bucketed scan participated)."""
    import re

    return re.findall(
        r"SelectedBucketsCount: (\d+ out of \d+)", executed_plan(df)
    )
