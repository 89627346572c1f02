"""Projection / filter / predicate operators (SURVEY.md §2-B).

All row-level expressions stay inside whole-stage codegen (built-in
functions only — no Python UDFs on this path), and money arithmetic stays
in DECIMAL per functions/determinism.py.

Scale notes (100 TB): pure map-side operators — no shuffle at any scale;
predicates push to Parquet row-group skipping, so selective filters read a
fraction of the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkify_datalake_spark.functions.determinism import dec2, sql_dec2
from sparkify_datalake_spark.registry import query
from sparkify_datalake_spark.sources.load import load

_ONE = "CAST(1 AS DECIMAL(3,2))"


@query(
    "project_arith",
    f"""
SELECT l_orderkey, l_linenumber,
  CAST(round({sql_dec2('l_extendedprice')} * ({_ONE} - {sql_dec2('l_discount', 4)}), 2) AS DOUBLE) AS revenue,
  CAST(round({sql_dec2('l_extendedprice')} * ({_ONE} - {sql_dec2('l_discount', 4)}) * ({_ONE} + {sql_dec2('l_tax', 4)}), 2) AS DOUBLE) AS charge
FROM lineitem
""",
)
def project_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-row revenue and charge, computed exactly in decimal, 2dp double."""
    li = load(spark, sf_dir, "lineitem")
    one = F.lit(1).cast("decimal(3,2)")
    revenue = dec2("l_extendedprice") * (one - dec2("l_discount", 4))
    charge = revenue * (one + dec2("l_tax", 4))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(revenue, 2).cast("double").alias("revenue"),
        F.round(charge, 2).cast("double").alias("charge"),
    )


@query(
    "project_case",
    """
SELECT o_orderkey,
  CASE WHEN o_totalprice < 50000 THEN 'low'
       WHEN o_totalprice < 150000 THEN 'mid'
       ELSE 'high' END AS price_bucket
FROM orders
""",
)
def project_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN price-bucket labels."""
    orders = load(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") < 50000, "low")
        .when(F.col("o_totalprice") < 150000, "mid")
        .otherwise("high")
        .alias("price_bucket"),
    )


@query(
    "filter_range_in_like",
    """
SELECT p_partkey, p_name, p_type, p_size, p_retailprice
FROM part
WHERE p_type LIKE 'PROMO%'
  AND p_size IN (5, 10, 15, 20, 25)
  AND p_retailprice BETWEEN 500 AND 1500
""",
)
def filter_range_in_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Combined LIKE + IN + BETWEEN predicate on part."""
    part = load(spark, sf_dir, "part")
    return part.filter(
        F.col("p_type").like("PROMO%")
        & F.col("p_size").isin(5, 10, 15, 20, 25)
        & F.col("p_retailprice").between(500, 1500)
    ).select("p_partkey", "p_name", "p_type", "p_size", "p_retailprice")


@query(
    "filter_null_semantics",
    """
SELECT l_linestatus,
  count(*) AS n_rows,
  count(nullif(l_returnflag, 'N')) AS n_flagged,
  CAST(sum(CASE WHEN nullif(l_returnflag, 'N') IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
  count(DISTINCT coalesce(nullif(l_returnflag, 'N'), 'NONE')) AS n_distinct_coalesced
FROM lineitem
GROUP BY l_linestatus
""",
)
def filter_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-valued logic: nullif-manufactured NULLs through count/coalesce."""
    li = load(spark, sf_dir, "lineitem")
    flagged = F.nullif(F.col("l_returnflag"), F.lit("N"))
    return li.groupBy("l_linestatus").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(flagged).alias("n_flagged"),
        F.sum(F.when(flagged.isNull(), 1).otherwise(0)).alias("n_null"),
        F.countDistinct(F.coalesce(flagged, F.lit("NONE"))).alias(
            "n_distinct_coalesced"
        ),
    )


@query(
    "distinct_project",
    "SELECT DISTINCT c_mktsegment, c_nationkey FROM customer",
)
def distinct_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT DISTINCT over a projection (hash-aggregate underneath)."""
    return load(spark, sf_dir, "customer").select(
        "c_mktsegment", "c_nationkey"
    ).distinct()


@query(
    "subquery_scalar_corr",
    """
SELECT c.c_custkey, c.c_name,
  CAST(round(CAST(c.c_acctbal AS DECIMAL(12,2)), 2) AS DOUBLE) AS acctbal
FROM customer c
WHERE c.c_acctbal > (
  SELECT avg(c2.c_acctbal) FROM customer c2
  WHERE c2.c_nationkey = c.c_nationkey
)
""",
)
def subquery_scalar_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery: customers above their nation's average.

    Expressed in SQL so Catalyst's RewriteCorrelatedScalarSubquery runs:
    the correlated aggregate decorrelates into an aggregate-then-join
    (one shuffle on nationkey + broadcast of the 25-row per-nation
    averages) — never a per-row subquery execution. The DataFrame-API
    equivalent is the groupBy+join written out by hand; this pins the
    SQL surface.
    """
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer_sq")
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_name,
          CAST(round(CAST(c.c_acctbal AS DECIMAL(12,2)), 2) AS DOUBLE)
            AS acctbal
        FROM customer_sq c
        WHERE c.c_acctbal > (
          SELECT avg(c2.c_acctbal) FROM customer_sq c2
          WHERE c2.c_nationkey = c.c_nationkey
        )
        """
    )


@query(
    "subquery_in_agg",
    """
SELECT o_orderkey, o_totalprice
FROM orders
WHERE o_custkey IN (
  SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY'
) AND o_orderstatus = 'O'
""",
)
def subquery_in_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery over a filtered dimension (rewritten to a semi-join)."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_sq")
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer_sq2")
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice
        FROM orders_sq
        WHERE o_custkey IN (
          SELECT c_custkey FROM customer_sq2
          WHERE c_mktsegment = 'MACHINERY'
        ) AND o_orderstatus = 'O'
        """
    )


@query(
    "filter_not_in_null_trap",
    """
SELECT
  (SELECT count(*) FROM customer
   WHERE c_custkey NOT IN
     (SELECT o_custkey FROM orders WHERE o_custkey IS NOT NULL))
    AS not_in_clean,
  (SELECT count(*) FROM customer
   WHERE c_custkey NOT IN (SELECT nullif(o_custkey, 1) FROM orders))
    AS not_in_with_null
""",
)
def filter_not_in_null_trap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The NOT IN three-valued-logic trap, pinned by both engines.

    `x NOT IN (subquery)` is NOT the anti-join when the subquery can
    yield NULL: under SQL 3VL, `x <> NULL` is unknown, so a single NULL
    in the list makes every row's predicate non-true and the result
    EMPTY. The query returns both counts side by side: the clean list
    behaves like a null-aware anti join (customers with no orders),
    the nullif-poisoned list collapses to 0. Spark plans the null-aware
    case as ExistenceJoin/NullAwareAntiJoin — semantics identical to
    DuckDB's, which is exactly what this hash row proves. Production
    guidance stays: filter NULLs out of IN-lists (or use anti joins)
    so the optimizer gets the cheap plan.
    """
    load(spark, sf_dir, "customer").createOrReplaceTempView("cust_nn")
    load(spark, sf_dir, "orders").createOrReplaceTempView("ord_nn")
    return spark.sql(
        """
        SELECT
          (SELECT count(*) FROM cust_nn
           WHERE c_custkey NOT IN
             (SELECT o_custkey FROM ord_nn WHERE o_custkey IS NOT NULL))
            AS not_in_clean,
          (SELECT count(*) FROM cust_nn
           WHERE c_custkey NOT IN
             (SELECT nullif(o_custkey, 1) FROM ord_nn))
            AS not_in_with_null
        """
    )
