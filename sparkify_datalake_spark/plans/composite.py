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


@query(
    "q12_priority_lines",
    """
SELECT l.l_returnflag,
  CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
  CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM orders o
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate >= DATE '1997-01-01'
  AND l.l_shipdate < DATE '1998-01-01'
GROUP BY l.l_returnflag
""",
)
def q12_priority_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q12 flavor: conditional aggregation over a fact-fact join.

    Pins the CASE-inside-SUM pattern (pivot-style counting without a
    pivot): the priority predicate is evaluated per joined row and both
    counters partial-aggregate map-side. The shipdate year filter pushes
    to the lineitem scan; orders⋈lineitem is the shuffle join on
    orderkey (at 100 TB: bucket both on orderkey — the same note as
    SURVEY §2-C join_inner). No broadcast: both sides are fact-sized.
    """
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    li = (
        load(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
        )
        .select("l_orderkey", "l_returnflag")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0))
            .cast("long")
            .alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1))
            .cast("long")
            .alias("low_line_count"),
        )
    )


@query(
    "q13_order_count_distribution",
    """
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c
  LEFT JOIN orders o
    ON c.c_custkey = o.o_custkey
   AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
) per_cust
GROUP BY c_count
""",
)
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q13 flavor: customer order-count distribution.

    Pins the two-level aggregation over an outer join: the LEFT join
    keeps order-less customers, ``count(o_orderkey)`` counts only
    matched rows (NULL-skipping count semantics — the part naive
    ``count(*)`` gets wrong), and the second groupBy collapses 1.5k
    customers into a ~10-row histogram. The join-side filter lives in
    the ON clause, not WHERE — pushing it to WHERE would turn the outer
    join into an inner one and drop the zero bucket. Scale shape: both
    aggs are partial→final; the first shuffles on custkey (the join
    key, so AQE reuses the exchange), the second on the tiny count key.
    """
    cust = load(spark, sf_dir, "customer").select("c_custkey")
    # The ON-clause priority filter touches only right-side columns, so
    # pre-filtering orders is equivalent for a LEFT join — and it pushes
    # the predicate to the scan instead of evaluating it per joined row.
    orders = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != "1-URGENT")
        .select("o_custkey", "o_orderkey")
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).cast("long").alias("custdist")
    )


@query(
    "q14_promo_effect",
    f"""
SELECT CAST(round(
    100.0 * CAST(sum(CASE WHEN p.p_type = 'PROMO'
        THEN {sql_dec2('l.l_extendedprice')}
           * (CAST(1 AS DECIMAL(3,2)) - {sql_dec2('l.l_discount', 4)}) END)
      AS DOUBLE)
    / CAST(sum({sql_dec2('l.l_extendedprice')}
        * (CAST(1 AS DECIMAL(3,2)) - {sql_dec2('l.l_discount', 4)}))
      AS DOUBLE), 6) AS DOUBLE) AS promo_revenue_pct
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= DATE '1997-09-01'
  AND l.l_shipdate < DATE '1997-10-01'
""",
)
def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q14 flavor: promo revenue share for one ship-month.

    Pins the conditional-sum ratio: both numerator and denominator
    aggregate in exact DECIMAL (order-independent), convert to DOUBLE
    only for the single final division, round 6dp — bit-identical
    across engines per the §7.2 discipline. The month filter pushes to
    the lineitem scan; part broadcasts (dimension); the global agg is
    one partial→final pass, output is a single row.
    """
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp_ntz"))
    )
    part = load(spark, sf_dir, "part").select("p_partkey", "p_type")
    one = F.lit(1).cast("decimal(3,2)")
    revenue = dec2("l_extendedprice") * (one - dec2("l_discount", 4))
    promo = F.when(F.col("p_type") == "PROMO", revenue)
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(promo).cast("double")
                / F.sum(revenue).cast("double"),
                6,
            ).alias("promo_revenue_pct")
        )
    )


@query(
    "q19_bracketed_revenue",
    f"""
SELECT CAST(round(sum({sql_dec2('l.l_extendedprice')}
    * (CAST(1 AS DECIMAL(3,2)) - {sql_dec2('l.l_discount', 4)})), 2)
  AS DOUBLE) AS revenue,
  CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
       AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#14' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 20 AND 30)
""",
)
def q19_bracketed_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q19 flavor: disjunction of brand/size/quantity brackets.

    Pins OR-of-ANDs predicate handling across a join: Catalyst derives
    the common ``l_quantity BETWEEN 1 AND 30`` envelope and the brand
    IN-list for scan-level pushdown (constraint propagation), then
    re-checks the exact disjunction post-join. Part broadcasts; the
    residual disjunction evaluates in codegen, not a UDF. Output is a
    single global-agg row under the decimal discipline.
    """
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    part = load(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    bracket = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#14")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    one = F.lit(1).cast("decimal(3,2)")
    revenue = dec2("l_extendedprice") * (one - dec2("l_discount", 4))
    return joined.filter(bracket).agg(
        F.round(F.sum(revenue), 2).cast("double").alias("revenue"),
        F.count(F.lit(1)).cast("long").alias("n_lines"),
    )


@query(
    "q7_nation_trade",
    f"""
SELECT supp_nation, cust_nation, l_year,
  CAST(round(sum(rev), 2) AS DOUBLE) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
    CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
    {sql_dec2('l.l_extendedprice')}
      * (CAST(1 AS DECIMAL(3,2)) - {sql_dec2('l.l_discount', 4)}) AS rev
  FROM supplier s
  JOIN lineitem l ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
      OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
    AND l.l_shipdate >= DATE '1996-01-01'
    AND l.l_shipdate < DATE '1998-01-01'
) shipping
GROUP BY supp_nation, cust_nation, l_year
""",
)
def q7_nation_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q7 flavor: bilateral trade volume between two nations.

    Pins the same-dimension-twice join: nation joins the plan through
    two different foreign keys (supplier side and customer side), so the
    two broadcasts must keep distinct attribute ids — handled here by
    renaming before the join instead of relying on alias resolution.
    The cross-pair disjunction can only be evaluated once both nation
    names are attached; Catalyst still pushes the date range to the
    lineitem scan and derives IsNotNull/IN constraints for each side.
    """
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    supplier = load(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    customer = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    nation = load(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"),
        F.col("n_name").alias("supp_nation"),
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"),
        F.col("n_name").alias("cust_nation"),
    )
    pair = (
        (F.col("supp_nation") == "NATION_3")
        & (F.col("cust_nation") == "NATION_7")
    ) | (
        (F.col("supp_nation") == "NATION_7")
        & (F.col("cust_nation") == "NATION_3")
    )
    one = F.lit(1).cast("decimal(3,2)")
    revenue = dec2("l_extendedprice") * (one - dec2("l_discount", 4))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .withColumn("l_year", F.year("l_shipdate").cast("long"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.round(F.sum(revenue), 2).cast("double").alias("revenue"))
    )


@query(
    "q21_sole_blame_supplier",
    """
SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
FROM supplier s
JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
JOIN orders o ON o.o_orderkey = l1.l_orderkey
WHERE o.o_orderstatus = 'F'
  AND l1.l_returnflag = 'R'
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey
      AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey
      AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_returnflag = 'R'
  )
GROUP BY s.s_name
ORDER BY numwait DESC, s.s_name
LIMIT 20
""",
)
def q21_sole_blame_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q21 flavor: the only supplier whose line was returned on a
    multi-supplier finalized order.

    Pins correlated EXISTS / NOT EXISTS with a non-equi residual: both
    subqueries correlate on orderkey AND require a *different* supplier,
    so they compile to left-semi / left-anti joins whose condition mixes
    an equi key (shuffle-able) with an inequality residual. The fact
    self-joins twice; column lineage is kept honest with explicit
    aliased projections. At 100 TB all three lineitem scans shuffle on
    orderkey — one exchange, reused by AQE; supplier broadcasts at the
    end so names attach to an already-tiny survivor set.
    """
    li = load(spark, sf_dir, "lineitem")
    orders_f = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
    )
    supplier = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    l1 = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("sk")
    )
    base = l1.join(orders_f, F.col("ok") == F.col("o_orderkey")).select(
        "ok", "sk"
    )
    l2 = li.select(
        F.col("l_orderkey").alias("ok2"), F.col("l_suppkey").alias("sk2")
    )
    l3 = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("ok3"), F.col("l_suppkey").alias("sk3")
    )
    survivors = (
        base.join(
            l2,
            (F.col("ok") == F.col("ok2")) & (F.col("sk") != F.col("sk2")),
            "left_semi",
        ).join(
            l3,
            (F.col("ok") == F.col("ok3")) & (F.col("sk") != F.col("sk3")),
            "left_anti",
        )
    )
    return (
        survivors.join(
            F.broadcast(supplier), F.col("sk") == F.col("s_suppkey")
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("long").alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(20)
    )


@query(
    "q22_idle_rich_customers",
    f"""
WITH stats AS (
  SELECT CAST(count(*) AS BIGINT) AS cnt,
    sum({sql_dec2('c_acctbal')}) AS tot
  FROM customer WHERE c_acctbal > 0
)
SELECT c.c_mktsegment,
  CAST(count(*) AS BIGINT) AS numcust,
  CAST(round(sum({sql_dec2('c.c_acctbal')}), 2) AS DOUBLE) AS totacctbal
FROM customer c, stats
WHERE {sql_dec2('c.c_acctbal')} * stats.cnt > stats.tot
  AND NOT EXISTS (
    SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
      AND o.o_orderpriority = '1-URGENT'
  )
GROUP BY c.c_mktsegment
""",
)
def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q22 flavor: above-average-balance customers with no orders.

    Pins the scalar-aggregate comparison + anti-join composition. The
    classic float trap: ``c_acctbal > avg(c_acctbal)`` is undecidable
    across engines for boundary rows because parallel double summation
    differs in the last ulp. The discipline here: compare
    ``acctbal * count > sum`` entirely in DECIMAL — exact, order-free —
    so both engines classify every row identically. The stats frame is
    a 1-row broadcast (cross join); the urgent-order-existence check is
    a left-anti join on custkey against a pre-filtered orders key column
    (every SF has order-less-ness too rare to survive — "no URGENT
    order" keeps the anti-join shape with a non-vacuous survivor set:
    5 / 75 / 937 rows at sf0.001/0.01/0.1).
    """
    cust = load(spark, sf_dir, "customer")
    orders_keys = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    stats = (
        cust.filter(F.col("c_acctbal") > 0)
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(dec2("c_acctbal")).alias("tot"),
        )
    )
    rich = cust.crossJoin(F.broadcast(stats)).filter(
        dec2("c_acctbal") * F.col("cnt") > F.col("tot")
    )
    idle = rich.join(
        orders_keys,
        rich.c_custkey == orders_keys.o_custkey,
        "left_anti",
    )
    return idle.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("long").alias("numcust"),
        F.round(F.sum(dec2("c_acctbal")), 2).cast("double").alias("totacctbal"),
    )
