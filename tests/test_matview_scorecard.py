"""Incrementally-maintained corpus scorecard (sources/scorecard_ivm.py,
VERDICT r9 #4).

Properties proved, the matview.py discipline applied to the scorecard's
three grains:
- incremental == recompute: init on a base slice + apply an append
  delta must reproduce corpus_quality_scorecard's dashboard on the
  full corpus bit-for-bit (every count integer-exact; the JS fold sums
  the same doubles behind the same 6dp rounds);
- untouched source partitions are byte-stable across maintenance (a
  delta touching 2 of 20 sources rewrites 2 directories per grain);
- an empty delta is a no-op.
"""

import os

import pyspark.sql.functions as F
import pytest

from sparkify_datalake_spark.sources.load import load
from sparkify_datalake_spark.sources.matview import partition_files
from sparkify_datalake_spark.sources.scorecard_ivm import (
    scorecard_store_apply,
    scorecard_store_dashboard,
    scorecard_store_init,
)

SF_DIR = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture()
def docs(spark):
    df = load(spark, SF_DIR, "documents").cache()
    yield df
    df.unpersist()


@pytest.fixture()
def delta_sources(spark, docs):
    srcs = sorted(
        r["source"] for r in docs.select("source").distinct().collect()
    )
    return srcs[:2]


def test_incremental_equals_recompute(spark, docs, delta_sources, tmp_path):
    path = str(tmp_path / "sc")
    # append split: the delta is the newest half of two sources' docs
    med = docs.filter(F.col("source").isin(delta_sources)).agg(
        F.expr("percentile_approx(doc_id, 0.5)")
    ).collect()[0][0]
    is_delta = F.col("source").isin(delta_sources) & (
        F.col("doc_id") > int(med)
    )
    scorecard_store_init(spark, docs.filter(~is_delta), path)
    affected = scorecard_store_apply(spark, path, docs.filter(is_delta))
    assert affected == delta_sources

    from sparkify_datalake_spark.registry import queries

    live = queries()["corpus_quality_scorecard"](spark, SF_DIR)
    assert _rows(scorecard_store_dashboard(spark, path)) == _rows(live)


def test_untouched_source_partitions_byte_stable(
    spark, docs, delta_sources, tmp_path
):
    path = str(tmp_path / "sc")
    is_delta = F.col("source").isin(delta_sources) & (
        F.col("doc_id") % 7 == 0
    )
    scorecard_store_init(spark, docs.filter(~is_delta), path)
    before = {
        g: partition_files(os.path.join(path, g))
        for g in ("doc_stats", "token_counts", "gram_counts")
    }
    affected = scorecard_store_apply(spark, path, docs.filter(is_delta))
    assert affected == delta_sources
    touched = {f"source={s}" for s in delta_sources}
    for g, prior in before.items():
        after = partition_files(os.path.join(path, g))
        for part, files in prior.items():
            if part in touched:
                continue
            assert after[part] == files, f"{g}/{part} rewritten"


def test_empty_delta_is_noop(spark, docs, tmp_path):
    path = str(tmp_path / "sc")
    scorecard_store_init(spark, docs, path)
    before = partition_files(os.path.join(path, "doc_stats"))
    assert scorecard_store_apply(
        spark, path, docs.filter(F.lit(False))
    ) == []
    assert partition_files(os.path.join(path, "doc_stats")) == before
