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
