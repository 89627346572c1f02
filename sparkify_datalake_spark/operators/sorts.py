"""Sort / limit / top-k operators (SURVEY.md §2-F).

Order-insensitive hashing makes a bare sort invisible, so every query
couples the sort with LIMIT/OFFSET over a total order — an order bug
changes the row *set*.

Scale notes (100 TB): ``orderBy().limit(k)`` compiles to
``TakeOrderedAndProject`` — a bounded per-partition heap + driver merge of
k rows per partition; no global sort is ever materialized. OFFSET adds the
offset to the heap bound (still k+offset rows per partition, fine for page
-sized offsets; deep pagination should switch to keyset predicates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkify_datalake_spark.registry import query
from sparkify_datalake_spark.sources.load import load


@query(
    "sort_limit_topk",
    """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 10
""",
)
def sort_limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-10 orders by (price DESC, key) → TakeOrderedAndProject."""
    orders = load(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
    )


@query(
    "limit_offset",
    """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 10 OFFSET 10
""",
)
def limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows 11–20 of the same total order (OFFSET + LIMIT)."""
    orders = load(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .offset(10)
        .limit(10)
    )


@query(
    "sort_nulls_ordering",
    """
SELECT o_orderkey, nullif(o_orderstatus, 'O') AS status_or_null
FROM orders
ORDER BY status_or_null ASC NULLS FIRST, o_orderkey
LIMIT 15
""",
)
def sort_nulls_ordering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULLS FIRST made visible through a limit over a nullable key."""
    orders = load(spark, sf_dir, "orders")
    return (
        orders.select(
            "o_orderkey",
            F.nullif(F.col("o_orderstatus"), F.lit("O")).alias("status_or_null"),
        )
        .orderBy(
            F.col("status_or_null").asc_nulls_first(), F.col("o_orderkey")
        )
        .limit(15)
    )
