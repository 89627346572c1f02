"""Bucketed-table capability: the write-once-shuffle-never layout.

Three plan-asserted payoffs of ``write_bucketed_table``:
1. equi-join of two same-bucketed tables runs with NO Exchange and
   matches the plain-join result exactly;
2. aggregation on the bucket key runs with NO Exchange;
3. a point predicate on the bucket key prunes to 1 of n buckets at the
   scan (SelectedBucketsCount).

Broadcast is disabled inside these tests — the point is the co-located
SHUFFLE-free shape that survives when neither side broadcasts (the
fact⋈fact case at 100 TB).
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from sparkify_datalake_spark.sources.bucketed import (
    bucketed_scan_info,
    executed_plan,
    has_exchange,
    write_bucketed_table,
)
from sparkify_datalake_spark.sources.load import load

_N = 8


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir, tmp_path_factory):
    wd = str(tmp_path_factory.mktemp("bucketed_wh"))
    old_wh = spark.conf.get("spark.sql.warehouse.dir", None)
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    write_bucketed_table(orders, "t_orders_b", "o_custkey", _N)
    write_bucketed_table(cust, "t_cust_b", "c_custkey", _N)
    yield "t_orders_b", "t_cust_b"
    for t in ("t_orders_b", "t_cust_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    del wd, old_wh


def test_bucketed_join_has_no_exchange_and_matches(
    spark, sf_dir, bucketed_tables
):
    ob, cb = bucketed_tables
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o, c = spark.table(ob), spark.table(cb)
        j = o.join(c, o.o_custkey == c.c_custkey).select(
            "o_orderkey", "o_custkey", "c_mktsegment"
        )
        assert not has_exchange(j), executed_plan(j)
        info = bucketed_scan_info(j)
        assert info and all(s == f"{_N} out of {_N}" for s in info), info
        got = sorted(tuple(r) for r in j.collect())
        orders = load(spark, sf_dir, "orders")
        cust = load(spark, sf_dir, "customer")
        want = sorted(
            tuple(r)
            for r in orders.join(
                cust, orders.o_custkey == cust.c_custkey
            )
            .select("o_orderkey", "o_custkey", "c_mktsegment")
            .collect()
        )
        assert got == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_aggregate_has_no_exchange(spark, bucketed_tables):
    ob, _ = bucketed_tables
    agg = (
        spark.table(ob)
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert not has_exchange(agg), executed_plan(agg)


def test_bucket_pruning_on_point_predicate(spark, bucketed_tables):
    # autoBucketedScan drops the bucketed read when no operator needs
    # the distribution ("Bucketed: false (disabled by query planner)"),
    # which also forfeits pruning; a point lookup wants it ON.
    ob, _ = bucketed_tables
    key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    old = spark.conf.get(key)
    spark.conf.set(key, "false")
    try:
        probe = spark.table(ob).filter(F.col("o_custkey") == 42)
        info = bucketed_scan_info(probe)
        assert info == [f"1 out of {_N}"], executed_plan(probe)
        got = {r["o_custkey"] for r in probe.collect()}
        assert got <= {42}
    finally:
        spark.conf.set(key, old)


def test_mismatched_bucket_counts_reshuffle_one_side(
    spark, sf_dir, bucketed_tables
):
    """The caveat test: a 4-bucket right side against the 8-bucket
    orders table forces an Exchange on the MISMATCHED side only —
    agreeing on bucket count is part of the layout contract."""
    ob, _ = bucketed_tables
    cust = load(spark, sf_dir, "customer")
    write_bucketed_table(cust, "t_cust_b4", "c_custkey", 4)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o, c4 = spark.table(ob), spark.table("t_cust_b4")
        j = o.join(c4, o.o_custkey == c4.c_custkey)
        plan = executed_plan(j)
        assert plan.count("Exchange") == 1, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS t_cust_b4")
