"""Spark 4 Python DataSource connector (sources/pydatasource.py).

End-to-end reads go through real executors (pickled class → workers), so
these tests double as the worker-import check for the package. The
pushdown contract is additionally verified white-box on the reader
object — Spark re-applies unsupported/all filters post-scan, so a result
check alone cannot distinguish pushdown from post-filtering.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.datasource import EqualTo, GreaterThan, InputPartition, IsNull

from sparkify_datalake_spark.sources.pydatasource import (
    CATEGORIES,
    SyntheticDocsSource,
    _DocsReader,
    register,
)


def _read(spark, **options):
    register(spark)
    r = spark.read.format("synthetic_docs")
    for k, v in options.items():
        r = r.option(k, v)
    return r.load()


def test_read_schema_and_cardinality(spark):
    df = _read(spark, partitions=4, rows_per_partition=250)
    assert [f.name for f in df.schema.fields] == [
        "doc_id",
        "category",
        "score",
        "text",
    ]
    assert df.count() == 1000
    assert df.select("doc_id").distinct().count() == 1000


def test_connector_decides_parallelism(spark):
    """partitions() drives split planning: 6 requested → 6 task splits."""
    df = _read(spark, partitions=6, rows_per_partition=10)
    pids = df.select(F.spark_partition_id().alias("p")).distinct().count()
    assert pids == 6


def test_reread_is_deterministic(spark):
    """Task retries must see identical content: two independent scans
    agree row-for-row (pure-arithmetic content, no RNG)."""
    a = _read(spark, partitions=3, rows_per_partition=100)
    b = _read(spark, partitions=3, rows_per_partition=100)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_filtered_read_matches_post_filter_semantics(spark):
    """Pushdown must not change results: connector-filtered read equals
    the unfiltered read filtered by Spark."""
    full = _read(spark, partitions=4, rows_per_partition=100)
    expected = sorted(
        r.doc_id
        for r in full.filter(
            (F.col("category") == "news") & (F.col("doc_id") > 150)
        ).collect()
    )
    got = sorted(
        r.doc_id
        for r in _read(spark, partitions=4, rows_per_partition=100)
        .filter((F.col("category") == "news") & (F.col("doc_id") > 150))
        .collect()
    )
    assert got == expected and len(got) > 0


def test_pushdown_narrows_generation_whitebox():
    """White-box: accepted filters narrow what read() *generates*;
    unsupported filters are handed back."""
    rd = _DocsReader({"partitions": "4", "rows_per_partition": "100"})
    unsupported = list(
        rd.pushFilters(
            [
                EqualTo(("category",), "news"),
                GreaterThan(("doc_id",), 150),
                IsNull(("text",)),  # not supported by the connector
            ]
        )
    )
    assert unsupported == [IsNull(("text",))]
    rows = list(rd.read(InputPartition(1)))  # ids 100..199 before pushdown
    assert all(cat == "news" for _, cat, _, _ in rows)
    assert all(doc_id > 150 for doc_id, _, _, _ in rows)
    assert 0 < len(rows) < 50  # strictly narrower than the raw split


def test_category_domain(spark):
    cats = {
        r.category
        for r in _read(spark, partitions=2, rows_per_partition=200)
        .select("category")
        .distinct()
        .collect()
    }
    assert cats <= set(CATEGORIES)


def test_writer_roundtrip_with_two_phase_commit(spark, tmp_path):
    """df.write.format(...) drives write→commit: staged files promote
    on commit, a _SUCCESS manifest lists them, and the JSONL content
    round-trips."""
    import json
    import os

    register(spark)
    out = str(tmp_path / "sink")
    df = spark.range(20).selectExpr(
        "id AS doc_id",
        "CAST(id % 3 AS STRING) AS category",
        "CAST(id AS DOUBLE) / 10 AS score",
        "concat('text-', id) AS text",
    ).repartition(3)
    df.write.format("synthetic_docs").option("path", out).mode(
        "append"
    ).save()
    files = sorted(os.listdir(out))
    assert "_SUCCESS" in files
    assert not [f for f in files if f.startswith(".staged-")]
    manifest = json.load(open(os.path.join(out, "_SUCCESS")))
    assert sum(m["n_rows"] for m in manifest) == 20
    assert {m["file"] for m in manifest} <= set(files)
    rows = []
    for f in files:
        if f.endswith(".jsonl"):
            with open(os.path.join(out, f)) as fh:
                rows += [json.loads(line) for line in fh]
    assert sorted(r["doc_id"] for r in rows) == list(range(20))
    assert all(r["text"] == f"text-{r['doc_id']}" for r in rows)


def test_writer_abort_cleans_staged_files(spark, tmp_path):
    """A failing task must leave NO committed artifacts: abort removes
    staged files and _SUCCESS is never written."""
    import os

    from pyspark.sql import functions as F

    register(spark)
    out = str(tmp_path / "sink")

    @F.udf("long")
    def boom(v):
        if v == 13:
            raise ValueError("injected task failure")
        return v

    df = spark.range(20).select(
        boom(F.col("id")).alias("doc_id"),
        F.lit("x").alias("category"),
        F.lit(0.5).cast("double").alias("score"),
        F.lit("t").alias("text"),
    ).repartition(4)
    try:
        df.write.format("synthetic_docs").option("path", out).mode(
            "append"
        ).save()
        raise AssertionError("write should have failed")
    except Exception as e:  # noqa: BLE001 — py4j wraps the task error
        assert "injected task failure" in str(e)
    leftovers = os.listdir(out) if os.path.isdir(out) else []
    assert "_SUCCESS" not in leftovers
    assert not [f for f in leftovers if f.startswith(".staged-")], leftovers
