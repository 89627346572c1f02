"""UDF / UDAF / UDTF surface (SURVEY.md §2-K).

The slow-path demo family: row-at-a-time Python UDF (worker round-trip
per row batch), Arrow-vectorized pandas UDF, grouped applyInPandas as the
UDAF shape, and a Spark 4 Python UDTF.

Scale notes (100 TB): the scalar Python UDF exists to *measure* the
boundary cost — every production expression in this engine uses built-in
functions instead. When Python is unavoidable, the pandas UDF path
(Arrow batches, ~10-100× faster than per-row) is the only acceptable
shape; applyInPandas shuffles once on the group key and streams Arrow
batches per group.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType

from sparkify_datalake_spark.registry import query
from sparkify_datalake_spark.sources.load import load


@query(
    "udf_scalar_py",
    """
SELECT o_orderkey,
  TRY_CAST(substring(o_orderpriority, 1, 1) AS INTEGER) AS priority_digit
FROM orders
""",
)
def udf_scalar_py(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF parsing '1-URGENT' → 1."""

    @F.udf(IntegerType())
    def leading_digit(s: str) -> int | None:
        if s and s[0].isdigit():
            return int(s[0])
        return None

    orders = load(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey", leading_digit("o_orderpriority").alias("priority_digit")
    )


@query(
    "udf_pandas_vec",
    """
SELECT event_id, value * 2.0 + 1.0 AS scaled
FROM events
""",
)
def udf_pandas_vec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-vectorized pandas UDF: same IEEE arithmetic as the SQL oracle.

    No rounding on purpose: *2.0 and +1.0 on identical doubles are
    bit-deterministic, while pandas' half-even round would drift from
    SQL engines' half-up.
    """

    @F.pandas_udf("double")
    def scale(v: pd.Series) -> pd.Series:
        return v * 2.0 + 1.0

    ev = load(spark, sf_dir, "events")
    return ev.select("event_id", scale("value").alias("scaled"))


@query(
    "udaf_grouped_pandas",
    """
SELECT event_type, round(exp(avg(ln(value))), 4) AS geomean
FROM events
WHERE value > 0
GROUP BY event_type
""",
)
def udaf_grouped_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate geometric mean: partial log-sums + tiny merge.

    Geomean is algebraic (exp of the mean log), so it aggregates in two
    phases like any sum: (1) mapInPandas computes per-Arrow-batch
    partials (event_type, fsum(ln value), count) — map-side, no
    shuffle, each Python worker holds one ~10k-row batch; (2) the
    partials (#batches × #event_types rows, kilobytes at any corpus
    size) shuffle once and merge per group via applyInPandas — the
    UDAF-surface demo, now on provably bounded input. The former shape
    (groupBy("event_type").applyInPandas over raw rows) materialized a
    third of the events table in ONE worker per key — the whole-group
    OOM anti-pattern this engine rejects everywhere else.

    Geomean is defined over positive values — the value>0 guard matters
    at SFs where events carry zeros (DuckDB ln(0) errors; numpy returns
    -inf). math.fsum gives an exactly-rounded log-sum per batch; the
    merge fsums ~dozens of partials, so cross-engine noise stays
    per-element libm ln (≤1 ulp) — far inside the 4dp rounding.
    """

    def partial_logs(batches):
        import math as m

        import numpy as np
        import pandas as pd_

        for pdf in batches:
            frame = pd_.DataFrame(
                {
                    "event_type": pdf["event_type"],
                    "lg": np.log(pdf["value"].to_numpy()),
                }
            )
            rows = [
                (k, m.fsum(grp["lg"]), len(grp))
                for k, grp in frame.groupby("event_type")
            ]
            yield pd_.DataFrame(
                rows, columns=["event_type", "log_sum", "cnt"]
            )

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        import math as m

        gm = m.exp(m.fsum(pdf["log_sum"]) / pdf["cnt"].sum())
        return pd.DataFrame(
            {
                "event_type": [pdf["event_type"].iloc[0]],
                "geomean": [round(gm, 4)],
            }
        )

    ev = load(spark, sf_dir, "events").filter(F.col("value") > 0)
    partials = ev.select("event_type", "value").mapInPandas(
        partial_logs, "event_type string, log_sum double, cnt long"
    )
    return partials.groupBy("event_type").applyInPandas(
        merge, "event_type string, geomean double"
    )


@query(
    "udtf_python",
    """
SELECT doc_id, unnest(string_split(text, ' ')) AS token
FROM documents
WHERE doc_id < 100
""",
)
def udtf_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 Python UDTF exploding text into (doc_id, token) rows."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id bigint, token string")
    class SplitDoc:
        def eval(self, doc_id: int, text: str):
            for token in text.split(" "):
                yield doc_id, token

    spark.udtf.register("split_doc", SplitDoc)
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    docs.createOrReplaceTempView("udtf_docs")
    return spark.sql(
        "SELECT s.doc_id, s.token "
        "FROM udtf_docs d, LATERAL split_doc(d.doc_id, d.text) s"
    )


@query(
    "udf_map_in_arrow",
    """
SELECT l_orderkey, l_linenumber,
  CAST(round(CAST(l_extendedprice AS DECIMAL(12,2))
    * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(12,4))), 2)
    AS DOUBLE) AS net_price
FROM lineitem WHERE l_quantity >= 30
""",
)
def udf_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow — the lowest-level Python surface: raw
    ``pyarrow.RecordBatch`` in/out, no pandas materialization at all.

    One tier below mapInPandas: the Arrow buffers Spark ships are
    compute()'d on directly (zero-copy columnar kernels), which matters
    when pandas conversion itself is the overhead — wide batches,
    binary columns, or chained arrow-native kernels. The computation
    (net price at 2dp over decimal exact values) is chosen so the
    oracle can hash-check a Python-boundary operator: arithmetic on
    exactly-representable 2dp values rounds identically everywhere.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    def net(batches):
        # §7.2 discipline, arrow-native: a double multiply-then-round
        # drifts by a cent vs DuckDB's decimal product, so lift the 2dp
        # price and 4dp discount into exact integer space (cents /
        # basis points), multiply as int64, and round half-up by
        # integer arithmetic — bit-identical to the decimal oracle.
        i64 = pa.int64()
        for batch in batches:
            price_c = pc.cast(
                pc.round(pc.multiply(batch.column(2), 100.0), 0), i64
            )
            disc_bp = pc.cast(
                pc.round(pc.multiply(batch.column(3), 10000.0), 0), i64
            )
            net6 = pc.multiply(
                price_c, pc.subtract(pa.scalar(10000, i64), disc_bp)
            )
            cents = pc.divide(pc.add(net6, 5000), pa.scalar(10000, i64))
            price = pc.divide(pc.cast(cents, pa.float64()), 100.0)
            yield pa.RecordBatch.from_arrays(
                [batch.column(0), batch.column(1), price],
                ["l_orderkey", "l_linenumber", "net_price"],
            )

    li = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") >= 30)
        .select("l_orderkey", "l_linenumber", "l_extendedprice", "l_discount")
    )
    return li.mapInArrow(
        net, "l_orderkey long, l_linenumber int, net_price double"
    )


@query(
    "udf_arrow_scalar",
    """
SELECT o_orderkey,
  upper(substring(o_orderpriority, 3)) AS priority_word,
  length(o_orderpriority) - 2 AS word_len
FROM orders
""",
)
def udf_arrow_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-optimized scalar Python UDF (``useArrow=True``) — the
    Spark 4 middle rung of the Python ladder: the same per-value
    function signature as the classic UDF above, but arguments cross
    the boundary in Arrow batches instead of pickled rows (~2-5×
    faster serialization; still a Python call per value, which is why
    pandas_udf stays the vectorized tier). Parses '1-URGENT' →
    ('URGENT', 6); pure string ops are exact cross-engine.
    """

    @F.udf("string", useArrow=True)
    def priority_word(s: str) -> str | None:
        return s[2:].upper() if s and len(s) > 2 else None

    @F.udf("int", useArrow=True)
    def word_len(s: str) -> int | None:
        return len(s) - 2 if s else None

    orders = load(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        priority_word("o_orderpriority").alias("priority_word"),
        word_len("o_orderpriority").alias("word_len"),
    )


@query(
    "udaf_grouped_arrow",
    """
WITH ranked AS (
  SELECT event_type, value,
    row_number() OVER (PARTITION BY event_type ORDER BY value, event_id)
      AS r,
    count(*) OVER (PARTITION BY event_type) AS n
  FROM events
)
SELECT event_type,
  CAST(max(n) AS BIGINT) AS n,
  round(avg(CASE WHEN r > CAST(floor(n * 0.1) AS BIGINT)
                  AND r <= n - CAST(floor(n * 0.1) AS BIGINT)
            THEN value END), 6) AS trimmed_mean
FROM ranked
GROUP BY event_type
""",
)
def udaf_grouped_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-native grouped UDAF via Spark 4's ``applyInArrow``: 10%
    two-sided trimmed mean of `value` per event type. Completes the
    Python-boundary matrix (§2-K): row-UDF → pandas-UDF → grouped
    pandas → UDTF → mapInArrow → **applyInArrow**, the zero-copy
    grouped path — each group arrives as a pyarrow.Table (no pandas
    conversion), numpy sorts once and slices the middle 80%. Group
    sizes here are ~events/5 so a group fits a task trivially; the
    scale caveat is the usual grouped-UDF one (a group must fit one
    task's memory — for giant groups, pre-aggregate or sketch). The
    oracle computes the identical trim via rank arithmetic; ties in
    `value` don't matter because only the multiset of kept values
    feeds the mean (sort order among equals reshuffles equal numbers).
    """
    import pyarrow as pa

    ev = load(spark, sf_dir, "events").select("event_type", "value")

    def trimmed(table: pa.Table) -> pa.Table:
        # Self-contained kernel (pickled by value for foreign-cwd
        # workers): numpy via zero-copy arrow buffers.
        import numpy as np
        import pyarrow as pa

        vals = np.sort(table.column("value").to_numpy(zero_copy_only=False))
        n = len(vals)
        k = int(n * 0.1)
        kept = vals[k : n - k] if n - 2 * k > 0 else vals
        return pa.table(
            {
                "event_type": [table.column("event_type")[0].as_py()],
                "n": [n],
                "trimmed_mean": [round(float(kept.mean()), 6)],
            }
        )

    return ev.groupBy("event_type").applyInArrow(
        trimmed, "event_type string, n long, trimmed_mean double"
    )
