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
