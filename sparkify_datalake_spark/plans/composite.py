"""Composite multi-operator queries (optimizer-composition showcases).

Single-operator rows in SURVEY §2 pin each primitive; these pin the
*composition*: filter pushdown through multi-joins, partial aggregation
above broadcast joins, bounded-heap top-k over aggregated output — the
plan shapes a real workload produces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkify_datalake_spark.functions.determinism import dec2, sql_dec2
from sparkify_datalake_spark.registry import query
from sparkify_datalake_spark.sources.load import load


@query(
    "q3_shipping_priority",
    f"""
SELECT l.l_orderkey,
  CAST(round(sum({sql_dec2('l.l_extendedprice')}
      * (CAST(1 AS DECIMAL(3,2)) - {sql_dec2('l.l_discount', 4)})), 2)
    AS DOUBLE) AS revenue,
  CAST(o.o_orderdate AS DATE) AS o_orderdate
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < DATE '1995-03-15'
  AND l.l_shipdate > DATE '1995-03-15'
GROUP BY l.l_orderkey, o.o_orderdate
ORDER BY revenue DESC, l.l_orderkey
LIMIT 10
""",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q3 flavor: segment filter → 3-way join → agg → top-10.

    The composition the optimizer must get right: both date filters and
    the segment filter push to the parquet scans, customer broadcasts
    into orders, the join output partial-aggregates before the shuffle,
    and the final ordering is a TakeOrderedAndProject bounded heap —
    verified in tests/test_plans.py. Revenue follows the §7.2 decimal
    discipline; ORDER BY carries the orderkey tiebreak for determinism.
    """
    cutoff = F.lit("1995-03-15").cast("timestamp_ntz")
    customer = load(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    one = F.lit(1).cast("decimal(3,2)")
    revenue = dec2("l_extendedprice") * (one - dec2("l_discount", 4))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.round(F.sum(revenue), 2).cast("double").alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.col("o_orderdate").cast("date").alias("o_orderdate"),
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@query(
    "q5_local_supplier_volume",
    f"""
SELECT n.n_name,
  CAST(round(sum({sql_dec2('l.l_extendedprice')}
      * (CAST(1 AS DECIMAL(3,2)) - {sql_dec2('l.l_discount', 4)})), 2)
    AS DOUBLE) AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
              AND c.c_nationkey = s.s_nationkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= DATE '1996-01-01'
  AND o.o_orderdate < DATE '1998-01-01'
GROUP BY n.n_name
""",
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q5 flavor: 6-table star join with a local-supplier residual.

    The join-graph stress test: lineitem is the only big table; every
    dimension broadcasts, and the c_nationkey = s_nationkey residual
    rides on the supplier join rather than forcing an extra shuffle.
    The region filter prunes before the nation/supplier joins.
    """
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    li = load(spark, sf_dir, "lineitem")
    supplier = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    one = F.lit(1).cast("decimal(3,2)")
    revenue = dec2("l_extendedprice") * (one - dec2("l_discount", 4))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(
            F.broadcast(supplier),
            (li.l_suppkey == supplier.s_suppkey)
            & (customer.c_nationkey == supplier.s_nationkey),
        )
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(revenue), 2).cast("double").alias("revenue"))
    )


@query(
    "q10_returned_items",
    f"""
SELECT c.c_custkey, c.c_name, n.n_name,
  CAST(round(sum({sql_dec2('l.l_extendedprice')}
      * (CAST(1 AS DECIMAL(3,2)) - {sql_dec2('l.l_discount', 4)})), 2)
    AS DOUBLE) AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
  AND o.o_orderdate >= DATE '1996-01-01'
  AND o.o_orderdate < DATE '1996-07-01'
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY revenue DESC, c.c_custkey
LIMIT 20
""",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q10 flavor: top-20 customers by returned-item revenue.

    High-cardinality group-by (per customer) above a selective fact
    filter, finished with a bounded-heap top-k — the "find the worst
    offenders" report shape. Returnflag + date filters push to the
    scans; ORDER BY carries the custkey tiebreak.
    """
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp_ntz"))
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = load(spark, sf_dir, "nation")
    one = F.lit(1).cast("decimal(3,2)")
    revenue = dec2("l_extendedprice") * (one - dec2("l_discount", 4))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.round(F.sum(revenue), 2).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@query(
    "q18_large_volume_customer",
    """
SELECT c.c_custkey, c.c_name, o.o_orderkey,
  CAST(o.o_totalprice AS DOUBLE) AS o_totalprice,
  CAST(sum(l.l_quantity) AS DOUBLE) AS total_qty
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey IN (
  SELECT l_orderkey FROM lineitem
  GROUP BY l_orderkey HAVING sum(l_quantity) > 250
)
GROUP BY c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
ORDER BY o_totalprice DESC, o.o_orderkey
LIMIT 20
""",
)
def q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q18 flavor: aggregated IN-subquery (orders whose lineitems
    total > 250 units) feeding a 3-way join, re-agg, top-20.

    The composition this pins beyond q3/q5/q10: a HAVING-filtered
    aggregate used as a semi-join filter — the aggregate runs ONCE over
    lineitem, its tiny survivor set semi-joins orders before the wide
    join, so the expensive join only sees qualifying orders. Quantity
    sums are exact integers in doubles (≤ a few hundred) — no decimal
    discipline needed; o_totalprice tiebreaks by orderkey.
    """
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_name")
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 250)
        .select("l_orderkey")
    )
    return (
        orders.join(
            F.broadcast(big),
            orders.o_orderkey == big.l_orderkey,
            "left_semi",
        )
        .join(li, orders.o_orderkey == li.l_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_totalprice")
        .agg(F.sum("l_quantity").cast("double").alias("total_qty"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
            "total_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(20)
    )
