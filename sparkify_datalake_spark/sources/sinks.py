"""Sinks (SURVEY.md §2-A `test` rows): partitioned Parquet, CSV/JSON.

The reference family's signature op `[RECONSTRUCTED]` is
``df.write.partitionBy(...).parquet(out)`` (star-schema tables partitioned
by e.g. (year, artist_id)); these helpers are the engine's equivalents,
exercised by tests/test_sinks.py.

Scale notes (100 TB): partition columns must be low-cardinality (status,
date buckets) — a high-cardinality partitionBy creates millions of tiny
files. Pair with ``df.repartition(cols)`` before the write so each
partition directory is produced by one task (one file), and let AQE
coalesce small post-shuffle partitions. Readers get partition pruning for
free on the directory layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def write_partitioned_parquet(
    df: DataFrame, path: str, partition_cols: list[str]
) -> None:
    """Partitioned Parquet sink; one file per partition directory."""
    (
        df.repartition(*partition_cols)
        .write.mode("overwrite")
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def read_partitioned_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def write_csv(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").option("header", "true").csv(path)


def read_csv(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    return spark.read.schema(schema).option("header", "true").csv(path)


def write_json(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").json(path)


def read_json(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    return spark.read.schema(schema).json(path)


def write_bucketed_table(
    df: DataFrame, table: str, key: str, n_buckets: int, path: str
) -> None:
    """Bucketed (hash-clustered) + sorted table sink.

    THE 100 TB fact-⋈-fact join technique: two tables bucketed on the
    join key with the same bucket count join with NO exchange — each
    task reads bucket i of both sides and merge-joins presorted files
    (tests/test_sinks.py asserts the Exchange-free plan). At 100 TB,
    bucketing lineitem+orders on orderkey turns the biggest shuffle in
    the workload into a metadata lookup; the write-side shuffle is paid
    once, amortized over every subsequent join.
    """
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .option("path", path)
        .saveAsTable(table)
    )


def read_json_permissive(
    spark: SparkSession, path: str, schema: StructType
) -> DataFrame:
    """JSON source that quarantines malformed rows instead of failing.

    PERMISSIVE mode: parseable rows populate the schema columns;
    malformed lines land whole in ``_corrupt_record`` with NULLs
    elsewhere. At 100 TB ingest this is the only sane default — one bad
    row in a billion must not kill the job; the corrupt column is
    filtered into a quarantine sink for inspection.
    """
    full = schema.add("_corrupt_record", "string")
    return (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )
