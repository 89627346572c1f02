"""Set operations (SURVEY.md §2-G): UNION [ALL], INTERSECT, EXCEPT.

Scale notes (100 TB): UNION ALL is a zero-shuffle concatenation of scans;
the distinct variants (UNION/INTERSECT/EXCEPT) hash-shuffle on the full
row — keep projections narrow before the set op so the shuffle carries
only the compared columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkify_datalake_spark.registry import query
from sparkify_datalake_spark.sources.load import load


def _tagged_nationkeys(spark: SparkSession, sf_dir: str):
    c = load(spark, sf_dir, "customer").select(
        F.lit("customer").alias("side"), F.col("c_nationkey").alias("nationkey")
    )
    s = load(spark, sf_dir, "supplier").select(
        F.lit("supplier").alias("side"), F.col("s_nationkey").alias("nationkey")
    )
    return c, s


@query(
    "set_union",
    """
SELECT side, nationkey, count(*) AS n
FROM (
  SELECT 'customer' AS side, c_nationkey AS nationkey FROM customer
  UNION ALL
  SELECT 'supplier' AS side, s_nationkey AS nationkey FROM supplier
)
GROUP BY side, nationkey
""",
)
def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL with a tag column; counts prove ALL (bag) semantics."""
    c, s = _tagged_nationkeys(spark, sf_dir)
    return (
        c.unionByName(s)
        .groupBy("side", "nationkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "set_intersect",
    """
SELECT c_nationkey AS nationkey FROM customer
INTERSECT
SELECT s_nationkey AS nationkey FROM supplier
""",
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nation keys present in both customer and supplier."""
    c = load(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.intersect(s)


@query(
    "set_except",
    """
SELECT c_nationkey AS nationkey FROM customer
EXCEPT
SELECT s_nationkey AS nationkey FROM supplier
""",
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nation keys with customers but no suppliers."""
    c = load(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    # subtract == EXCEPT (distinct); exceptAll would keep any key whose
    # customer multiplicity exceeds its supplier multiplicity.
    return c.subtract(s)


@query(
    "set_bag_ops",
    """
WITH a AS (SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'R'),
b AS (SELECT l_suppkey FROM lineitem WHERE l_linestatus = 'F'),
ia AS (SELECT l_suppkey FROM a INTERSECT ALL SELECT l_suppkey FROM b),
ea AS (SELECT l_suppkey FROM a EXCEPT ALL SELECT l_suppkey FROM b)
SELECT 'intersect_all' AS op, l_suppkey, count(*) AS multiplicity
FROM ia GROUP BY 2
UNION ALL
SELECT 'except_all', l_suppkey, count(*) FROM ea GROUP BY 2
""",
)
def set_bag_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag (multiset) set operations — INTERSECT ALL / EXCEPT ALL —
    which the distinct variants in this family deliberately are not:
    per key, INTERSECT ALL keeps min(count_a, count_b) copies and
    EXCEPT ALL keeps count_a − count_b, the multiplicity algebra
    behind reconciliation jobs ("which shipments appear more times in
    feed A than feed B"). Exercised on two overlapping lineitem
    projections with real duplicate multiplicities; results
    re-aggregate to (key, multiplicity) so the output is bounded by
    the key domain while still hash-proving the ALL semantics.
    Spark's intersectAll/exceptAll compile to the count-expand plan
    (per-key counts, then generate replicas) — one shuffle per side,
    no row-by-row anti semantics.
    """
    li = load(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_returnflag") == "R").select("l_suppkey")
    b = li.filter(F.col("l_linestatus") == "F").select("l_suppkey")
    ia = (
        a.intersectAll(b)
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("multiplicity"))
        .select(F.lit("intersect_all").alias("op"), "l_suppkey", "multiplicity")
    )
    ea = (
        a.exceptAll(b)
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("multiplicity"))
        .select(F.lit("except_all").alias("op"), "l_suppkey", "multiplicity")
    )
    return ia.unionByName(ea)
