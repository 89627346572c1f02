"""Extended bucketed-table assertions (round 7), on top of
tests/test_sinks.py::test_bucketed_join_is_shuffle_free's core
join-without-Exchange guarantee:

1. aggregation on the bucket key runs with NO Exchange;
2. a point predicate on the bucket key prunes to 1 of n buckets
   (SelectedBucketsCount) — requires autoBucketedScan OFF, because the
   planner otherwise drops the bucketed read for a bare filter scan
   ("Bucketed: false (disabled by query planner)") and forfeits
   pruning with it;
3. the layout contract's caveat: joining an 8-bucket table against a
   4-bucket table re-shuffles exactly ONE side (the mismatched one).
"""

from __future__ import annotations

import re

import pytest

from pyspark.sql import functions as F

from sparkify_datalake_spark.sources.load import load
from sparkify_datalake_spark.sources.sinks import write_bucketed_table

_N = 8


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _bucket_counts(df) -> list[str]:
    return re.findall(r"SelectedBucketsCount: (\d+ out of \d+)", _plan(df))


@pytest.fixture(scope="module")
def bucketed_orders(spark, sf_dir, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed_ext")
    write_bucketed_table(
        load(spark, sf_dir, "orders"),
        "bx_orders",
        "o_custkey",
        _N,
        str(base / "bx_orders"),
    )
    yield "bx_orders"
    spark.sql("DROP TABLE IF EXISTS bx_orders")


def test_bucketed_aggregate_has_no_exchange(spark, bucketed_orders):
    agg = (
        spark.table(bucketed_orders)
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert "Exchange" not in _plan(agg), _plan(agg)


def test_bucket_pruning_on_point_predicate(spark, bucketed_orders):
    key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    old = spark.conf.get(key)
    spark.conf.set(key, "false")
    try:
        probe = spark.table(bucketed_orders).filter(
            F.col("o_custkey") == 42
        )
        assert _bucket_counts(probe) == [f"1 out of {_N}"], _plan(probe)
        assert {r["o_custkey"] for r in probe.collect()} <= {42}
    finally:
        spark.conf.set(key, old)


def test_mismatched_bucket_counts_reshuffle_one_side(
    spark, sf_dir, bucketed_orders, tmp_path
):
    write_bucketed_table(
        load(spark, sf_dir, "customer"),
        "bx_cust4",
        "c_custkey",
        4,
        str(tmp_path / "bx_cust4"),
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o = spark.table(bucketed_orders)
        c4 = spark.table("bx_cust4")
        j = o.join(c4, o.o_custkey == c4.c_custkey)
        assert _plan(j).count("Exchange") == 1, _plan(j)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS bx_cust4")
