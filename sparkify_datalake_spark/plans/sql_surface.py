"""Raw-SQL query surface — ``spark.sql`` over registered views.

Every other query in the catalog is declared through the DataFrame API;
these two run as literal ANSI SQL text through Spark's SQL parser, pinning
the second half of the engine's public surface (SURVEY §3.2: DataFrame
and ``spark.sql`` share one Catalyst pipeline, so both must produce the
same optimized plans). The SQL text is intentionally near-identical to
the DuckDB oracle — the point is that the *same query text* runs on both
engines and hash-matches.

Scale notes: identical to the DataFrame twins — the parser output feeds
the same optimizer, so pushdown/broadcast/partial-agg behavior is shared.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from sparkify_datalake_spark.registry import query
from sparkify_datalake_spark.sources.load import load


def _register_views(spark: SparkSession, sf_dir: str, *tables: str) -> None:
    """Expose fixture tables as temp views for ``spark.sql`` queries.

    Views are session-scoped and cheap to re-register (no data copied —
    a view is just a named logical plan); going through ``load`` keeps
    the nanosecond-timestamp workaround and session confs identical to
    the DataFrame path.
    """
    for t in tables:
        load(spark, sf_dir, t).createOrReplaceTempView(t)


_Q6_SQL = """
SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))
    * CAST(l_discount AS DECIMAL(4,2))), 2) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= DATE '1997-01-01'
  AND l_shipdate < DATE '1998-01-01'
  AND l_discount BETWEEN 0.02 AND 0.04
  AND l_quantity < 24
"""


@query("q6_forecast_revenue", _Q6_SQL)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q6 flavor, executed as raw SQL text via ``spark.sql``.

    The ONE query string runs verbatim on both engines (the oracle is
    the same constant). Pins: the SQL parser entry point, BETWEEN on a
    double column (exact — fixture discounts are 2dp values that both
    engines compare as the same binary doubles), DATE-literal vs
    timestamp_ntz comparison coercion, and the decimal-sum discipline
    spelled in SQL. All three filters reach the Parquet scan.
    """
    _register_views(spark, sf_dir, "lineitem")
    return spark.sql(_Q6_SQL)


_Q4_SQL = """
SELECT o.o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders o
WHERE o.o_orderdate >= DATE '1997-01-01'
  AND o.o_orderdate < DATE '1997-04-01'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate > o.o_orderdate
  )
GROUP BY o.o_orderpriority
"""


@query("q4_order_priority", _Q4_SQL)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q4 flavor: priority counts of orders shipped after order
    date, executed as raw SQL text via ``spark.sql``.

    Pins the correlated-EXISTS path through the SQL parser: the
    subquery correlates on orderkey AND compares two columns from
    different tables (l_shipdate > o_orderdate), so Spark must rewrite
    it to a left-semi join with the comparison as a residual — same
    shape q21 builds by hand through the DataFrame API, here produced
    by the parser+analyzer. Quarter filter pushes to the orders scan.
    """
    _register_views(spark, sf_dir, "orders", "lineitem")
    return spark.sql(_Q4_SQL)


ALL_TABLES = (
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
)


def sql(spark: SparkSession, sf_dir: str, query_text: str) -> DataFrame:
    """The engine's SQL front door: run arbitrary ANSI SQL text against
    the full fixture catalog.

    Registers every table as a temp view (named logical plans — no data
    movement; the loader keeps the nanosecond-timestamp workaround and
    session confs identical to the DataFrame path) and hands the text
    to Spark's parser. A reference user's ad-hoc SQL runs unchanged:
    same Catalyst pipeline, same optimizations as the DataFrame API.
    """
    _register_views(spark, sf_dir, *ALL_TABLES)
    return spark.sql(query_text)


_RECURSIVE_CAL_SQL = """
WITH RECURSIVE monthly AS (
  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS m,
    count(*) AS n_orders,
    CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE)
      AS revenue
  FROM orders GROUP BY 1
),
bounds AS (SELECT min(m) AS lo, max(m) AS hi FROM monthly),
years(y, hi) AS (
  SELECT CAST(date_trunc('year', lo) AS DATE), hi FROM bounds
  UNION ALL
  SELECT CAST(y + INTERVAL 1 YEAR AS DATE), hi FROM years
  WHERE y < CAST(date_trunc('year', hi) AS DATE)
),
months AS (
  SELECT CAST(y + k * INTERVAL 1 MONTH AS DATE) AS m
  FROM years CROSS JOIN
    (VALUES (0),(1),(2),(3),(4),(5),(6),(7),(8),(9),(10),(11)) AS off(k)
)
SELECT months.m AS month,
  CAST(coalesce(monthly.n_orders, 0) AS BIGINT) AS n_orders,
  coalesce(monthly.revenue, 0.0) AS revenue
FROM months CROSS JOIN bounds
LEFT JOIN monthly ON months.m = monthly.m
WHERE months.m BETWEEN bounds.lo AND bounds.hi
"""


@query("sql_recursive_calendar", _RECURSIVE_CAL_SQL)
def sql_recursive_calendar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive-CTE surface (Spark 4 WITH RECURSIVE, SPARK-24497): a
    gap-free month calendar LEFT-JOINed to monthly order rollups so
    empty months report zeros, with the scaffold built by recursion in
    the SQL-standard idiom (orders_backlog shows the sequence()-based
    twin). The SAME query text runs on Spark and DuckDB. Recursion
    depth is deliberately YEARS (~7 sequential 1-row iterations), with
    the 12 months expanded by a VALUES cross join: each recursive step
    is a separate scheduled stage, so a month-grain recursion (~80
    steps) measured 10.4 s of pure scheduler latency at sf0.1 vs
    ~2.4 s for this shape — recursion depth, not data volume, is the
    cost driver of WITH RECURSIVE on Spark, and bounding it is the
    production discipline. Equally important at 100 TB: the recursion
    carries its stop bound (`hi`) as a COLUMN seeded once from the
    tiny month rollup, never as a correlated scalar subquery over
    orders — a subquery in the recursive step re-executes per
    iteration, turning ~7 calendar steps into ~7 extra fact-table
    scans (measured 1.66 s → 0.8 s at sf0.1 from this rewrite alone).
    Money stays decimal until the final round.
    """
    _register_views(spark, sf_dir, "orders")
    return spark.sql(_RECURSIVE_CAL_SQL)


_PARAM_SQL = """
SELECT o_orderpriority,
  count(*) AS n_orders,
  CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE)
    AS revenue
FROM orders
WHERE o_totalprice >= :min_price AND o_orderstatus = :status
GROUP BY o_orderpriority
"""


@query(
    "sql_parameterized",
    """
SELECT o_orderpriority,
  count(*) AS n_orders,
  CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE)
    AS revenue
FROM orders
WHERE o_totalprice >= 1000.0 AND o_orderstatus = 'F'
GROUP BY o_orderpriority
""",
)
def sql_parameterized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameterized SQL via named parameter markers (Spark ≥3.4
    ``spark.sql(sql, args={...})``): the injection-safe front door for
    user-supplied literals — parameters bind as typed literals in the
    parser, never string-spliced, so a hostile value cannot change the
    plan shape (and Catalyst still constant-folds + pushes the bound
    literal into the scan like any other literal). The oracle inlines
    the same values; what's under test is that the BOUND plan matches
    the literal plan row-for-row.
    """
    _register_views(spark, sf_dir, "orders")
    return spark.sql(
        _PARAM_SQL, args={"min_price": 1000.0, "status": "F"}
    )
