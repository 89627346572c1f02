"""TPC-H-flavor composites Q2/Q8/Q9/Q11/Q15/Q16/Q17/Q20 — completing
the 22-query sweep (SURVEY §2 composite addenda; Q1/Q3-7/Q10/Q12-14/
Q18/Q19/Q21/Q22 live in aggregates.py / composite.py / sql_surface.py).

The fixture has no ``partsupp`` table, so the part-supplier-bridge
queries are *flavors*: the (part, supplier) association and its cost
come from ``lineitem`` (unit cost = min observed ``l_extendedprice /
l_quantity``), and Q9's supply cost uses a deterministic
``0.6 × p_retailprice`` proxy. The plan shapes — correlated min
subquery (Q2), two-nation-role join with conditional share (Q8),
profit star join (Q9), HAVING-over-global-scalar (Q11), max-scalar
view (Q15), NOT-IN + count-distinct (Q16), correlated avg cutoff
(Q17), IN-over-grouped-HAVING (Q20) — are the TPC-H ones.

Selectivity constants are ratio-based where TPC-H uses absolute
fixture-calibrated values (q11's 2×avg, q20's 0.16 share) so the
predicate stays meaningful at every scale factor instead of going
all-or-nothing when n changes 100×.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sparkify_datalake_spark.functions.determinism import dec2, sql_dec2
from sparkify_datalake_spark.registry import query
from sparkify_datalake_spark.sources.load import load

_ONE = "CAST(1 AS DECIMAL(3,2))"


def _revenue(prefix: str = "") -> "F.Column":
    one = F.lit(1).cast("decimal(3,2)")
    return dec2(f"{prefix}l_extendedprice") * (one - dec2(f"{prefix}l_discount", 4))


def _sql_revenue(alias: str = "l") -> str:
    return (
        f"{sql_dec2(alias + '.l_extendedprice')} "
        f"* ({_ONE} - {sql_dec2(alias + '.l_discount', 4)})"
    )


@query(
    "q2_min_cost_supplier",
    """
WITH cost AS (
  SELECT l_partkey, l_suppkey,
    min(round(l_extendedprice / l_quantity, 2)) AS unit_cost
  FROM lineitem GROUP BY 1, 2
), eu AS (
  SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
  FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey WHERE r.r_name = 'EUROPE'
)
SELECT s.s_acctbal, s.s_name, s.n_name, p.p_partkey, c.unit_cost
FROM part p JOIN cost c ON p.p_partkey = c.l_partkey
JOIN eu s ON c.l_suppkey = s.s_suppkey
WHERE p.p_type = 'LARGE' AND p.p_size <= 15
  AND c.unit_cost = (
    SELECT min(c2.unit_cost)
    FROM cost c2 JOIN eu s2 ON c2.l_suppkey = s2.s_suppkey
    WHERE c2.l_partkey = p.p_partkey)
ORDER BY s.s_acctbal DESC, s.n_name, s.s_name, p.p_partkey
LIMIT 100
""",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q2 flavor: cheapest in-region supplier per qualifying part.

    The correlated-min-subquery shape. Spark formulation decorrelates by
    hand the way Catalyst would: derive the (part, supplier) unit-cost
    table from lineitem with ONE shuffle, restrict to in-region
    suppliers via a broadcast semi-side, take the per-part min with a
    window over the part key (no second scan of lineitem — the former
    rewrite of `cost = (SELECT min …)`), and keep rows at the minimum.
    The part filter broadcasts into the probe; output is the TPC-H
    column order with the acctbal-desc top-100.
    """
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").filter(
        (F.col("p_type") == "LARGE") & (F.col("p_size") <= 15)
    )
    supplier = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eu = (
        supplier.join(
            F.broadcast(
                nation.join(
                    F.broadcast(region),
                    nation.n_regionkey == region.r_regionkey,
                )
            ),
            supplier.s_nationkey == nation.n_nationkey,
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    cost = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.round(F.col("l_extendedprice") / F.col("l_quantity"), 2)).alias(
            "unit_cost"
        )
    )
    w = Window.partitionBy("l_partkey")
    return (
        cost.join(F.broadcast(eu), cost.l_suppkey == eu.s_suppkey)
        .withColumn("min_cost", F.min("unit_cost").over(w))
        .filter(F.col("unit_cost") == F.col("min_cost"))
        .join(F.broadcast(part), F.col("l_partkey") == part.p_partkey)
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "unit_cost")
        .orderBy(
            F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey"
        )
        .limit(100)
    )


@query(
    "q8_market_share",
    f"""
SELECT EXTRACT(year FROM o.o_orderdate) AS o_year,
  round(
    CAST(sum(CASE WHEN n2.n_name = 'NATION_3' THEN {_sql_revenue()}
                  ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
    / CAST(sum({_sql_revenue()}) AS DOUBLE), 6) AS mkt_share
FROM part p
JOIN lineitem l ON p.p_partkey = l.l_partkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
JOIN region r ON n1.n_regionkey = r.r_regionkey
JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
WHERE r.r_name = 'AMERICA' AND p.p_type = 'ECONOMY'
  AND o.o_orderdate BETWEEN DATE '1995-01-01' AND DATE '1996-12-31'
GROUP BY o_year
""",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q8 flavor: one nation's share of in-region volume per year.

    The two-nation-role join (customer's nation gates the region,
    supplier's nation tags the share) plus a conditional aggregate
    ratio. Nation joins both broadcast under different aliases; the
    share divides two exact decimal sums as doubles (§7.2 discipline —
    the division is the only inexact step and runs on identical IEEE
    inputs in both engines).
    """
    part = load(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    li = load(spark, sf_dir, "lineitem")
    supplier = load(spark, sf_dir, "supplier")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") <= F.lit("1996-12-31").cast("timestamp_ntz"))
    )
    customer = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    n1 = nation.alias("n1")
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_nationkey"),
        F.col("n_name").alias("supp_nation"),
    )
    volume = _revenue()
    zero = F.lit(0).cast("decimal(12,2)")
    flat = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(n1), customer.c_nationkey == F.col("n1.n_nationkey"))
        .join(
            F.broadcast(region),
            F.col("n1.n_regionkey") == region.r_regionkey,
        )
        .join(
            F.broadcast(n2), supplier.s_nationkey == F.col("n2_nationkey")
        )
        .select(
            F.year("o_orderdate").alias("o_year"),
            volume.alias("volume"),
            "supp_nation",
        )
    )
    return flat.groupBy("o_year").agg(
        F.round(
            F.sum(
                F.when(F.col("supp_nation") == "NATION_3", F.col("volume"))
                .otherwise(zero)
            ).cast("double")
            / F.sum("volume").cast("double"),
            6,
        ).alias("mkt_share")
    )


@query(
    "q9_product_profit",
    f"""
SELECT n.n_name AS nation, EXTRACT(year FROM o.o_orderdate) AS o_year,
  CAST(round(sum(
    {_sql_revenue()}
    - {sql_dec2('p.p_retailprice')} * CAST(0.6 AS DECIMAL(2,1))
      * {sql_dec2('l.l_quantity')}
  ), 2) AS DOUBLE) AS profit
FROM part p
JOIN lineitem l ON p.p_partkey = l.l_partkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE p.p_name LIKE '%widget%'
GROUP BY 1, 2
""",
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q9 flavor: profit by supplier nation × order year.

    The profit star join: lineitem against four broadcast dimensions,
    with cost proxied as 0.6 × p_retailprice × quantity (no partsupp
    table in the fixture). All arithmetic stays DECIMAL through the
    sum — products of exact decimals are exact, so partial-aggregation
    order can't drift the result (§7.2).
    """
    part = load(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    li = load(spark, sf_dir, "lineitem")
    supplier = load(spark, sf_dir, "supplier")
    orders = load(spark, sf_dir, "orders")
    nation = load(spark, sf_dir, "nation")
    profit = _revenue() - dec2("p_retailprice") * F.lit("0.6").cast(
        "decimal(2,1)"
    ) * dec2("l_quantity")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(F.round(F.sum(profit), 2).cast("double").alias("profit"))
    )


@query(
    "q11_important_parts",
    """
WITH val AS (
  SELECT l.l_partkey, sum(CAST(l.l_extendedprice AS DECIMAL(12,2))) AS part_value
  FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  WHERE n.n_name = 'NATION_7'
  GROUP BY 1
)
SELECT l_partkey, CAST(round(part_value, 2) AS DOUBLE) AS part_value
FROM val
WHERE CAST(part_value AS DOUBLE)
      > (SELECT CAST(avg(part_value) AS DOUBLE) * 2.0 FROM val)
""",
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q11 flavor: parts whose one-nation shipped value is > 2×
    the average part's.

    The HAVING-over-global-scalar shape: the per-part aggregate is
    computed once, a one-row global aggregate over *the same frame* is
    cross-broadcast back, and the filter compares the two. TPC-H's
    absolute `0.0001` fraction is replaced by a 2×avg ratio so the
    predicate keeps its meaning at any scale factor. The aggregated
    frame is localCheckpointed so the scalar and the probe read ONE
    materialization instead of recomputing the 3-table join twice.
    """
    li = load(spark, sf_dir, "lineitem")
    supplier = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation").filter(
        F.col("n_name") == "NATION_7"
    )
    val = (
        li.join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .groupBy("l_partkey")
        .agg(F.sum(dec2("l_extendedprice")).alias("part_value"))
        .localCheckpoint(eager=False)
    )
    cut = val.agg(
        (F.avg(F.col("part_value").cast("double")) * 2.0).alias("cut")
    )
    return (
        val.crossJoin(F.broadcast(cut))
        .filter(F.col("part_value").cast("double") > F.col("cut"))
        .select(
            "l_partkey",
            F.round("part_value", 2).cast("double").alias("part_value"),
        )
    )


@query(
    "q15_top_supplier",
    f"""
WITH rev AS (
  SELECT l_suppkey, CAST(round(sum({sql_dec2('l_extendedprice')}
      * ({_ONE} - {sql_dec2('l_discount', 4)})), 2) AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-04-01'
  GROUP BY 1
)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM supplier s JOIN rev r ON s.s_suppkey = r.l_suppkey
WHERE r.total_revenue = (SELECT max(total_revenue) FROM rev)
""",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q15 flavor: supplier(s) with the quarter's max revenue.

    The view + max-scalar-subquery shape. The revenue view materializes
    once (lazy localCheckpoint); its global max broadcasts back as a
    one-row frame — at 100 TB the view is the only corpus-sized
    aggregation and runs exactly once, the max probe is O(suppliers).
    Revenue is rounded *before* the max-equality compare in BOTH
    engines, so ties at the max are exact (2dp doubles), not
    float-noise-dependent.
    """
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
    )
    supplier = load(spark, sf_dir, "supplier")
    rev = (
        li.groupBy("l_suppkey")
        .agg(
            F.round(F.sum(_revenue()), 2)
            .cast("double")
            .alias("total_revenue")
        )
        .localCheckpoint(eager=False)
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("mx"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == supplier.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "q16_supplier_count",
    """
SELECT p.p_brand, p.p_type, p.p_size, count(DISTINCT l.l_suppkey) AS supplier_cnt
FROM part p JOIN lineitem l ON p.p_partkey = l.l_partkey
WHERE p.p_brand <> 'Brand#1' AND p.p_type <> 'PROMO'
  AND p.p_size IN (1, 5, 9, 15, 20, 25, 30, 35)
  AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2, 3
""",
)
def q16_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q16 flavor: distinct suppliers per part descriptor, minus
    "complaint" suppliers (negative balance — the fixture's stand-in
    for the comment-LIKE filter).

    NOT-IN over a subquery + count(DISTINCT) shape. s_suppkey is
    non-null, so NOT IN is a plain broadcast anti-join (the null-trap
    variant is pinned separately by `filter_not_in_null`); the distinct
    count shuffles once on the (brand, type, size) group key with
    partial distinct-aggregation upstream.
    """
    part = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 5, 9, 15, 20, 25, 30, 35))
    )
    li = load(spark, sf_dir, "lineitem")
    complaints = load(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(
            F.broadcast(complaints),
            li.l_suppkey == complaints.s_suppkey,
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q17_small_qty_revenue",
    """
WITH pavg AS (
  SELECT l_partkey, 0.2 * avg(l_quantity) AS qty_cut FROM lineitem GROUP BY 1
)
SELECT CAST(round(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
    / 7.0, 2) AS DOUBLE) AS avg_yearly
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN pavg a ON a.l_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#3' AND p.p_size < 10 AND l.l_quantity < a.qty_cut
""",
)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q17 flavor: revenue lost to below-average-quantity orders.

    The correlated-avg-cutoff shape, decorrelated into a per-part
    aggregate joined back to the fact (what Catalyst does to the
    `l_quantity < (SELECT 0.2*avg …)` subquery). The cutoff compare is
    safe cross-engine: quantities are integer-valued doubles, so the
    per-part mean is exact in both engines regardless of summation
    order. Output is a single global row.
    """
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#3") & (F.col("p_size") < 10)
    )
    pavg = li.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        (F.avg("l_quantity") * 0.2).alias("qty_cut")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(pavg, li.l_partkey == F.col("a_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_cut"))
        .agg(
            F.round(
                F.sum(dec2("l_extendedprice")).cast("double") / 7.0, 2
            )
            .cast("double")
            .alias("avg_yearly")
        )
    )


@query(
    "q20_small_part_suppliers",
    """
SELECT s.s_name, s.s_acctbal
FROM supplier s
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'AFRICA'
  AND s.s_suppkey IN (
    SELECT l.l_suppkey
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= DATE '1996-01-01' AND l.l_shipdate < DATE '1997-01-01'
    GROUP BY l.l_suppkey
    HAVING sum(CASE WHEN p.p_name LIKE 'small%' THEN l.l_quantity ELSE 0 END)
         > 0.16 * sum(l.l_quantity)
  )
ORDER BY s.s_name
""",
)
def q20_small_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q20 flavor: in-region suppliers whose 1996 volume skews
    toward 'small%' parts.

    IN-over-grouped-HAVING shape: the inner aggregate computes each
    supplier's small-part quantity share for the year (conditional sum
    over a broadcast part join — quantity sums are exact integer-valued
    doubles), the HAVING keeps the >16% tail, and the outer query
    semi-joins the supplier dimension against it. TPC-H's absolute
    `0.5 * availqty` threshold becomes a share so selectivity survives
    scale changes.
    """
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    part = load(spark, sf_dir, "part").select(
        "p_partkey", F.col("p_name").like("small%").alias("is_small")
    )
    supplier = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "AFRICA")
    qualified = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("l_suppkey")
        .agg(
            F.sum(
                F.when(F.col("is_small"), F.col("l_quantity")).otherwise(0.0)
            ).alias("small_qty"),
            F.sum("l_quantity").alias("total_qty"),
        )
        .filter(F.col("small_qty") > 0.16 * F.col("total_qty"))
        .select("l_suppkey")
    )
    return (
        supplier.join(
            F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey
        )
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .join(qualified, supplier.s_suppkey == qualified.l_suppkey, "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )
