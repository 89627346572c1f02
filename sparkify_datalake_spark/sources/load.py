"""Table loader — the single entry point for reading fixture tables.

Every query goes through ``load(spark, sf_dir, name)``; this is the one
place that knows about the events nanosecond-timestamp workaround
(SURVEY.md §7.3-R1) and keeps session confs pinned.

Scale notes (100 TB): at cluster scale each ``name`` maps to a partitioned
directory (e.g. ``s3://lake/lineitem/l_shipdate_month=*/``) instead of one
file; ``spark.read.parquet`` handles both shapes unchanged, and partition
pruning + predicate pushdown reach the scan because queries filter on the
partition columns declaratively. Nothing in this module assumes
single-file inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkify_datalake_spark.session import configure_session

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def _events_from_nanos(df: DataFrame) -> DataFrame:
    # With spark.sql.legacy.parquet.nanosAsLong=true the ns-precision `ts`
    # arrives as int64 epoch-nanos; truncate to microseconds (exactly what
    # DuckDB does when it reads the same file) and rebuild a timestamp.
    # Cast to TIMESTAMP_NTZ (identity under the pinned UTC session tz) so
    # events.ts has the same type family as the parquet ms-timestamps and
    # collects as naive datetimes like DuckDB's. Integer `div` is load-
    # bearing: epoch-nanos (~1.7e18) overflow a double's 53-bit mantissa,
    # so `/ 1000` + cast drifts the microseconds by ±1.
    return df.withColumn(
        "ts",
        F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz"),
    )


def corpus_fingerprint(sf_dir: str, name: str) -> str:
    """Cheap identity of one fixture table: resolved path + file size +
    mtime, hashed. Derived artifacts (ANN indexes, dedup signature
    stores) fold this into their on-disk keys so regenerating the data
    at the same path invalidates them instead of silently serving stale
    answers. At cluster scale the analog is the table snapshot/commit id.
    """
    import hashlib
    from pathlib import Path

    p = Path(sf_dir.rstrip("/")).resolve() / f"{name}.parquet"
    try:
        st = p.stat()
        raw = f"{p}|{st.st_size}|{st.st_mtime_ns}"
    except OSError:
        raw = str(p)
    return hashlib.md5(raw.encode()).hexdigest()[:10]


# Per-session relation cache: spark.read.parquet costs ~0.1 s per call
# (file listing + footer schema read through py4j), and a composite
# query loads 2-7 tables — that metadata tax dominated the low end of
# the per-query latency distribution. The cache plays the role a real
# lakehouse catalog/metastore plays at 100 TB: resolve the table's
# schema once, serve the immutable logical relation afterwards. Keyed
# by the live SparkSession (WeakKeyDictionary: a stopped/collected
# session drops its entries) and the corpus fingerprint (path + size +
# mtime), so regenerated fixtures invalidate instead of serving stale.
from weakref import WeakKeyDictionary

_RELATION_CACHE: "WeakKeyDictionary[SparkSession, dict]" = (
    WeakKeyDictionary()
)


def widen_if_starved(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Round-robin repartition a frame whose SCAN parallelism is
    starved by the physical file layout.

    Parquet scan parallelism is capped by row-group count, not split
    count (SURVEY §7.3): a small fixture written as one 128 MB row
    group runs every downstream per-row expression single-threaded, a
    pathology AQE cannot fix because it only replans shuffles. For
    per-row-CPU-heavy aggregates (decimal money sums, md5 ladders) the
    established in-repo remedy is an explicit spread before the work
    (stat_bootstrap_ci, agg_bloom_runtime_filter); this helper gates
    that spread on the frame actually being starved, so at production
    layouts (128 MB groups × thousands of files — always ≥ cores-wide)
    it is a metadata check and a no-op: no shuffle is added at 100 TB.
    """
    cores = spark.sparkContext.defaultParallelism
    # cores//4: a scan already running at a quarter of the machine
    # amortizes per-row CPU well enough that a full round-robin
    # shuffle costs more than it buys (measured at the 64× probe:
    # widening a 12-partition 38M-row scan on 32 cores regressed
    # agg_weighted_avg 3.2 s → 4.4 s). The gate is for the 1-3
    # partition single-row-group pathology, not mild under-width.
    if df.rdd.getNumPartitions() < max(cores // 4, 2):
        return df.repartition(cores)
    return df


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table as a DataFrame with normalized types.

    ``events.ts`` comes back as a proper microsecond TIMESTAMP_NTZ; all
    other tables are returned exactly as stored.
    """
    per_session = _RELATION_CACHE.setdefault(spark, {})
    key = (sf_dir.rstrip("/"), name, corpus_fingerprint(sf_dir, name))
    hit = per_session.get(key)
    if hit is not None:
        return hit
    configure_session(spark)
    path = f"{sf_dir.rstrip('/')}/{name}.parquet"
    df = spark.read.parquet(path)
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = _events_from_nanos(df)
    per_session[key] = df
    return df
