"""Window-function operators (SURVEY.md §2-E).

Every window orders by a total order (sort keys + unique-key tiebreak) —
mandatory for cross-engine determinism (SURVEY §7.2-4).

Scale notes (100 TB): a window = one shuffle on the partition keys + an
in-partition sort. Partition keys here (customer, nation) have bounded
per-key row counts, so partitions can't blow out executor memory; for
billion-row-per-key cases the pattern is `repartitionByRange` + AQE. The
rank-filter top-k (win_topk_group) never materializes full sort output —
the filter prunes to k rows per group right after the window operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sparkify_datalake_spark.functions.determinism import dec2
from sparkify_datalake_spark.registry import query
from sparkify_datalake_spark.sources.load import load


@query(
    "win_rank",
    """
SELECT o_custkey, o_orderkey, o_totalprice,
  row_number() OVER w AS rn,
  rank() OVER w AS rnk,
  dense_rank() OVER w AS drnk
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
""",
)
def win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number/rank/dense_rank per customer by (price DESC, key)."""
    orders = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
    )


@query(
    "win_topk_group",
    """
SELECT c_nationkey, o_orderkey, o_totalprice, rn FROM (
  SELECT c.c_nationkey, o.o_orderkey, o.o_totalprice,
    row_number() OVER (
      PARTITION BY c.c_nationkey
      ORDER BY o.o_totalprice DESC, o.o_orderkey) AS rn
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
) WHERE rn <= 3
""",
)
def win_topk_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per nation via the rank-filter pattern."""
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    joined = orders.join(
        F.broadcast(customer), orders.o_custkey == customer.c_custkey
    )
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        joined.select(
            "c_nationkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@query(
    "win_lag_lead",
    """
SELECT o_custkey, o_orderkey,
  date_diff('day',
    lag(CAST(o_orderdate AS DATE)) OVER w,
    CAST(o_orderdate AS DATE)) AS days_since_prev,
  date_diff('day',
    CAST(o_orderdate AS DATE),
    lead(CAST(o_orderdate AS DATE)) OVER w) AS days_to_next
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
""",
)
def win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day gap to previous/next order per customer (NULL at the edges)."""
    orders = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    d = F.col("o_orderdate").cast("date")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.datediff(d, F.lag(d).over(w)).alias("days_since_prev"),
        F.datediff(F.lead(d).over(w), d).alias("days_to_next"),
    )


@query(
    "win_running",
    """
SELECT o_custkey, o_orderkey,
  CAST(round(sum(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS DOUBLE)
  AS running_spend
FROM orders
""",
)
def win_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative revenue per customer in date order (decimal-exact)."""
    orders = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum(dec2("o_totalprice")).over(w), 2)
        .cast("double")
        .alias("running_spend"),
    )


@query(
    "win_moving",
    """
SELECT o_custkey, o_orderkey,
  (sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) OVER w
     // count(*) OVER w) / 100.0 AS moving_avg
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
""",
)
def win_moving(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-row moving average per customer, truncated to whole cents.

    A rounded avg() of doubles is nondeterministic across engines: a
    2-row frame averages to exact .xx5 ties that HALF_UP/half-even
    resolve differently. Instead: exact integer-cent sum, integer
    division by the frame count (identical in both engines), /100.
    """
    orders = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, 0)
    )
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.sum(cents).over(w).alias("cents_sum"),
        F.count(F.lit(1)).over(w).alias("cnt"),
    ).select(
        "o_custkey",
        "o_orderkey",
        (F.expr("cents_sum div cnt") / 100.0).alias("moving_avg"),
    )


@query(
    "win_range_ntile",
    """
SELECT o_orderkey, o_orderstatus, o_totalprice,
  count(*) OVER (
    PARTITION BY o_orderstatus ORDER BY o_totalprice
    RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW) AS n_in_band,
  ntile(4) OVER (
    PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey) AS quartile
FROM orders WHERE o_orderkey < 60000
""",
)
def win_range_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-based RANGE frame (±1000 price band) + ntile quartiles,
    pinned to a bounded key-range sample (o_orderkey < 60000 — the
    whole table at sf ≤ 0.04, a fixed 60k rows beyond).

    This is the naive-window semantic ANCHOR, not the scale path: the
    window partitions by o_orderstatus (3 distinct values), so each
    partition is a single-task sort — the classic low-cardinality-key
    skew hazard. Unbounded it measured 212 s at the 64× probe (24.6×
    DuckDB, 18% of the whole suite) while answering the same question
    as its de-skewed twin. The pin follows the dedup_near_exact
    discipline: identical semantics on a deterministic bounded subset,
    still hash-checked, cost O(1) in SF. win_ntile_twophase below is
    the full-scale plan — binned two-phase ranking, hash-proven to
    match this oracle's arithmetic on the FULL table (11.4 s at 64×).
    """
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") < 60000
    )
    w_range = (
        Window.partitionBy("o_orderstatus")
        .orderBy("o_totalprice")
        .rangeBetween(-1000, 0)
    )
    w_ntile = Window.partitionBy("o_orderstatus").orderBy(
        "o_totalprice", "o_orderkey"
    )
    return orders.select(
        "o_orderkey",
        "o_orderstatus",
        "o_totalprice",
        F.count(F.lit(1)).over(w_range).alias("n_in_band"),
        F.ntile(4).over(w_ntile).alias("quartile"),
    )


@query(
    "win_ntile_twophase",
    """
SELECT o_orderkey, o_orderstatus, o_totalprice,
  count(*) OVER (
    PARTITION BY o_orderstatus ORDER BY o_totalprice
    RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW) AS n_in_band,
  ntile(4) OVER (
    PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey) AS quartile
FROM orders
""",
)
def win_ntile_twophase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """win_range_ntile semantics without the 3-value-partition-key sort.

    The de-skewed 100 TB plan (same oracle as win_range_ntile — results
    are identical, only the physical strategy changes). Everything runs
    over BAND-WIDTH PRICE BINS, bin = floor(price/1000): thousands of
    bounded (status, bin) window partitions instead of the 3-value
    status key, so no task ever sorts more than one bin's rows.

    1. Two-phase distributed ranking with bins as the ranges: the tiny
       (status, bin) → count table rolls into running offsets (a window
       over ~status×#bins rows, broadcast back), and each row's global
       per-status rank = bin offset + row_number within its bin. Same
       trick as sampled range-partitioned ranking, but the ranges are
       data-defined and deterministic — no repartitionByRange sampling,
       no pinned-partitioning materialization.
    2. ntile(4) is computed arithmetically from (rank, status total)
       with exact SQL NTILE semantics (first n%4 tiles get the extra
       row).
    3. The RANGE band count [p-1000, p] spans exactly bins {b-1, b}
       because the bin width equals the frame width:
       n_in_band = (same-bin rows with price' ≤ p: a RANGE running
       count, sharing the step-1 exchange) + (prev-bin rows with
       price' ≥ p-1000: a probe row at p-1000 unioned into bin b-1,
       running data-count subtracted from the bin total). Each
       partition's size is the intrinsic band cardinality — the rows
       any engine must touch to answer the query. An earlier cut
       aggregated to distinct (status, price) first and windowed THAT
       by status alone — at the 64× probe, prices are 97% unique
       (9.3M distinct of 9.6M), making the "compact" table the full
       table and the status window a single-task 3M-row sort: 446 s.
       The binned rewrite runs in seconds at the same scale.
    """
    BAND = 1000.0
    base = (
        load(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .withColumn(
            "bin", F.floor(F.col("o_totalprice") / F.lit(BAND)).cast("long")
        )
    )

    # Tiny per-bin counts → running offsets and status totals. The
    # table is (status × #bins) rows — bounded by the price domain over
    # the band width, not by the row count; broadcastable.
    bin_totals = base.groupBy("o_orderstatus", "bin").agg(
        F.count(F.lit(1)).alias("bin_cnt")
    )
    w_off = (
        Window.partitionBy("o_orderstatus")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = bin_totals.select(
        "o_orderstatus",
        "bin",
        "bin_cnt",
        F.coalesce(F.sum("bin_cnt").over(w_off), F.lit(0)).alias("off"),
    )
    totals = bin_totals.groupBy("o_orderstatus").agg(
        F.sum("bin_cnt").alias("n_status")
    )

    # One exchange on (status, bin) serves BOTH window specs: the
    # within-bin rank order (price, orderkey) and the same-bin RANGE
    # count (price' <= p with exact tie handling).
    w_bin_rank = Window.partitionBy("o_orderstatus", "bin").orderBy(
        "o_totalprice", "o_orderkey"
    )
    w_same = (
        Window.partitionBy("o_orderstatus", "bin")
        .orderBy("o_totalprice")
        .rangeBetween(Window.unboundedPreceding, 0)
    )
    rn = F.row_number().over(w_bin_rank) + F.col("off")
    q = F.col("n_status") - (F.col("n_status") % 4)  # 4 * (n div 4)
    r = F.col("n_status") % 4
    big = (q / 4 + 1).cast("long")  # size of the first r tiles
    # divisor guard: when a status group has < 4 rows, q/4 is 0 and the
    # otherwise-branch would divide by zero (an ERROR under ANSI mode,
    # shielded today only by CASE laziness since the when-branch covers
    # all rows for n<4) — greatest(1, ·) makes the expression total
    small = F.greatest(F.lit(1).cast("long"), (q / 4).cast("long"))
    quartile = F.when(
        F.col("rn") <= r * big, F.ceil(F.col("rn") / big)
    ).otherwise(r + F.ceil((F.col("rn") - r * big) / small))

    ranked = (
        base.join(F.broadcast(offsets), ["o_orderstatus", "bin"])
        .join(F.broadcast(totals), "o_orderstatus")
        .withColumn("same_le", F.count(F.lit(1)).over(w_same))
        .withColumn("rn", rn)
        .withColumn("quartile", quartile.cast("int"))
    )

    # Prev-bin contribution via probe rows: a probe at qprice = p-BAND
    # lands in bin b-1 (exactly one band below p). Ordering
    # (price, is_data) puts the probe BEFORE data rows tied at qprice,
    # so the running data-count at the probe = #rows with price' <
    # qprice strictly; the band wants price' >= qprice inclusive, i.e.
    # bin_total - that count. Tied probes all see the same prefix and
    # contribute 0 to the sum, so row-frame tie nondeterminism cannot
    # reach the output.
    data = base.select(
        "o_orderstatus",
        "bin",
        F.col("o_totalprice").alias("price"),
        F.lit(1).alias("is_data"),
        F.lit(None).cast("long").alias("probe_key"),
    )
    probes = base.select(
        "o_orderstatus",
        (F.col("bin") - 1).alias("bin"),
        (F.col("o_totalprice") - F.lit(BAND)).alias("price"),
        F.lit(0).alias("is_data"),
        F.col("o_orderkey").alias("probe_key"),
    )
    w_scan = (
        Window.partitionBy("o_orderstatus", "bin")
        .orderBy("price", "is_data")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    prev_ge = (
        data.unionByName(probes)
        .withColumn("lt", F.sum("is_data").over(w_scan))
        .where(F.col("is_data") == 0)
        .join(
            F.broadcast(
                bin_totals.withColumnRenamed("bin_cnt", "prev_cnt")
            ),
            ["o_orderstatus", "bin"],
            "left",
        )
        .select(
            F.col("probe_key").alias("o_orderkey"),
            (F.coalesce(F.col("prev_cnt"), F.lit(0)) - F.col("lt")).alias(
                "prev_ge"
            ),
        )
    )

    return ranked.join(prev_ge, "o_orderkey").select(
        "o_orderkey",
        "o_orderstatus",
        "o_totalprice",
        (F.col("same_le") + F.col("prev_ge")).alias("n_in_band"),
        "quartile",
    )


@query(
    "win_first_last",
    """
SELECT o_custkey, o_orderkey,
  first_value(o_orderkey) OVER w AS first_order,
  last_value(o_orderkey) OVER (
    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_order,
  nth_value(o_orderkey, 2) OVER (
    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_order
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
""",
)
def win_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last/nth order id per customer — the frame-semantics trap.

    `last_value`/`nth_value` over the DEFAULT frame (unbounded→current)
    see only the prefix, which is almost never what's meant; both get the
    explicit full-partition frame here, identically in Spark and the
    oracle. ORDER BY carries the orderkey tiebreak (§7.2-4).
    """
    orders = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wfull = w.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_orderkey").over(w).alias("first_order"),
        F.last("o_orderkey").over(wfull).alias("last_order"),
        F.nth_value("o_orderkey", 2).over(wfull).alias("second_order"),
    )


@query(
    "win_percent_rank",
    """
SELECT o_custkey, o_orderkey,
  round(percent_rank() OVER w, 6) AS pct_rank,
  round(cume_dist() OVER w, 6) AS cume,
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
""",
)
def win_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative-rank family: percent_rank + cume_dist per customer."""
    orders = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


@query(
    "win_trailing_1h",
    """
SELECT event_id, user_id,
  CAST(round(sum(CAST(value AS DECIMAL(18,2))) OVER (
    PARTITION BY user_id ORDER BY date_trunc('second', ts)
    RANGE BETWEEN INTERVAL '1 hour' PRECEDING AND CURRENT ROW
  ), 2) AS DOUBLE) AS trailing_1h_sum
FROM events
""",
)
def win_trailing_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 1-hour event-time RANGE window per user (rolling metric).

    The time-series rolling-aggregate shape: RANGE (not ROWS) so the
    frame is defined by event time, and same-timestamp peers always
    aggregate together. Both engines order by second-truncated time —
    Spark ranges over epoch seconds (interval RANGE frames need a
    numeric key), DuckDB over the truncated timestamp with an INTERVAL
    frame; the two are equivalent exactly because sub-second parts are
    dropped on both sides. Decimal-disciplined sum per §7.2-1.
    """
    ev = load(spark, sf_dir, "events")
    # epoch seconds (truncated); ntz→ltz cast is exact under the pinned
    # UTC session timezone
    sec = F.unix_seconds(F.col("ts").cast("timestamp"))
    w = (
        Window.partitionBy("user_id")
        .orderBy(sec)
        .rangeBetween(-3600, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.sum(F.col("value").cast("decimal(18,2)")).over(w), 2)
        .cast("double")
        .alias("trailing_1h_sum"),
    )


@query(
    "win_count_distinct",
    """
SELECT event_id, user_id,
  count(DISTINCT event_type) OVER (
    PARTITION BY user_id ORDER BY ts, event_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
  ) AS types_seen
FROM events
""",
)
def win_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running distinct count per entity (event types seen so far per
    user) — the windowed COUNT(DISTINCT) Spark's window functions
    refuse outright (DISTINCT_WINDOW_FUNCTION_UNSUPPORTED).

    Composition: a row is the FIRST sighting of its (user, type) pair
    iff, with the user's rows sorted by (type, ts), the previous row
    holds a different type (lag-based group-boundary flag); the running
    sum of first-sighting flags over the user's event-time order IS the
    running distinct count. Both window passes partition by user_id
    ALONE (the boundary flag deliberately uses lag within the user
    partition rather than row_number over (user, type), which would
    demand a second hash partitioning) — Catalyst plans ONE Exchange
    and two Sorts (plan-asserted), and per-row state is one counter,
    vs the per-frame set a naive windowed DISTINCT would hold. The
    oracle runs DuckDB's native DISTINCT window aggregate, pinning the
    composition to the real semantics. Ordering is total (ts, event_id)
    so both engines agree on every prefix.
    """
    ev = load(spark, sf_dir, "events")
    by_type = Window.partitionBy("user_id").orderBy(
        "event_type", "ts", "event_id"
    )
    first_seen = (
        F.lag("event_type").over(by_type).isNull()
        | (F.lag("event_type").over(by_type) != F.col("event_type"))
    )
    running = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return ev.select(
        "event_id",
        "user_id",
        F.sum(first_seen.cast("long")).over(running).alias("types_seen"),
    )


@query(
    "win_navigation",
    """
SELECT event_id, user_id,
  nth_value(event_type, 3) OVER (
    PARTITION BY user_id ORDER BY ts, event_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS third_type,
  round(cume_dist() OVER (
    PARTITION BY user_id ORDER BY ts, event_id), 6) AS time_position
FROM events
""",
)
def win_navigation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-navigation window functions: nth_value (the user's 3rd
    event type, visible once reached — NULL on earlier rows because the
    running frame hasn't grown to 3 yet) and cume_dist (how far through
    the user's history each event sits) — completing the window-surface
    ladder next to rank/lag/first_last/percent_rank.

    One entity-keyed window partitioning serves both functions in a
    single pass; ordering is total via (ts, event_id) so frame contents
    — and therefore nth_value's NULL boundary and every cume_dist
    denominator step — are engine-exact. cume_dist counts ties by peer
    group (SQL standard) but the total order makes every peer group
    size 1, so both engines agree bit-for-bit after 6dp rounding.
    """
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return ev.select(
        "event_id",
        "user_id",
        F.nth_value("event_type", 3).over(wf).alias("third_type"),
        F.round(F.cume_dist().over(w), 6).alias("time_position"),
    )


@query(
    "win_moving_median",
    """
SELECT event_id, user_id,
  round(median(value) OVER (
    PARTITION BY user_id ORDER BY ts, event_id
    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 6) AS mov_median7
FROM events
WHERE event_type = 'view'
""",
)
def win_moving_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-row moving MEDIAN of view values per user — the
    robust sibling of win_moving's mean/sum: one outlier in the frame
    moves the mean but not the median, which is why monitoring
    pipelines smooth with it.

    Spark has no median window function, so the frame materializes as
    collect_list over the same ROWS frame, sorts (≤7 elements — the
    frame bound caps the per-row cost, this never becomes a per-row
    O(history) scan), and interpolates the middle exactly as
    quantile_cont(0.5) does: middle element when the frame is odd,
    mean of the two central elements when even. Partitioned by
    user_id, totally ordered by (ts, event_id), so frame contents are
    engine-exact; averaging the same two doubles is bit-identical, and
    6dp rounding is display only. Scale: one hash shuffle on user_id,
    per-partition sort — identical cost profile to win_moving.
    """
    ev = load(spark, sf_dir, "events").filter(
        F.col("event_type") == "view"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-6, 0)
    )
    arr = F.array_sort(F.collect_list("value").over(w))
    n = F.size(arr)
    odd = F.element_at(arr, ((n + 1) / 2).cast("int"))
    even = (
        F.element_at(arr, (n / 2).cast("int"))
        + F.element_at(arr, (n / 2 + 1).cast("int"))
    ) / 2.0
    # All-null frame guard (ADVICE r4): collect_list drops nulls, so a
    # frame of only-null values yields n = 0 and the even branch would
    # evaluate element_at(arr, 0) — a runtime error. CASE WHEN is lazy
    # per-row, so routing n = 0 to NULL first (matching DuckDB's
    # median() over an empty frame) keeps the fragile branch unreached.
    med = (
        F.when(n == 0, F.lit(None).cast("double"))
        .when(n % 2 == 1, odd)
        .otherwise(even)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.round(med, 6).alias("mov_median7"),
    )


@query(
    "win_cume_dist",
    """
SELECT o_orderkey, o_orderstatus, o_totalprice,
  round(cume_dist() OVER (
    PARTITION BY o_orderstatus ORDER BY o_totalprice), 6) AS cume
FROM orders
""",
)
def win_cume_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cume_dist per order status — the ECDF window function (fraction
    of the partition with value ≤ current row's), completing the
    ranking-family coverage beside win_percent_rank/win_range_ntile.
    Tie-safe by definition: all rows sharing a price share a cume
    value, so the hash needs no tiebreak column.

    NOT executed as the naive 3-value-status-key window (the
    win_ntile_twophase lesson: a low-cardinality partition key turns
    the sort into 3 single-task multi-million-row sorts at 64×).
    Binned two-phase plan, bin = floor(price/1000): cume numerator =
    broadcast per-bin prefix offset + a same-bin RANGE running count
    (ties never span bins because equal prices share a bin);
    denominator = broadcast status totals. One (status, bin) exchange
    does all the row-grain work; every other frame is bins-sized.
    """
    BAND = 1000.0
    base = (
        load(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .withColumn(
            "bin",
            F.floor(F.col("o_totalprice") / F.lit(BAND)).cast("long"),
        )
    )
    bin_totals = base.groupBy("o_orderstatus", "bin").agg(
        F.count(F.lit(1)).alias("bin_cnt")
    )
    w_off = (
        Window.partitionBy("o_orderstatus")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = bin_totals.select(
        "o_orderstatus",
        "bin",
        F.coalesce(F.sum("bin_cnt").over(w_off), F.lit(0)).alias("off"),
    )
    totals = bin_totals.groupBy("o_orderstatus").agg(
        F.sum("bin_cnt").alias("n_status")
    )
    w_same = (
        Window.partitionBy("o_orderstatus", "bin")
        .orderBy("o_totalprice")
        .rangeBetween(Window.unboundedPreceding, 0)
    )
    return (
        base.join(F.broadcast(offsets), ["o_orderstatus", "bin"])
        .join(F.broadcast(totals), "o_orderstatus")
        .select(
            "o_orderkey",
            "o_orderstatus",
            "o_totalprice",
            F.round(
                (F.col("off") + F.count(F.lit(1)).over(w_same))
                / F.col("n_status").cast("double"),
                6,
            ).alias("cume"),
        )
    )
