"""Incrementally-maintained DAU/WAU store (sources/matview_events.py,
VERDICT r10 #7 — second consumer of the IVM merge contract).

Properties proved, mirroring test_matview_scorecard.py:
- incremental == recompute: init on an events prefix + apply the
  remaining events as an append delta reproduces events_dau_wau on the
  full table bit-for-bit (rolling DISTINCT folds from the maintained
  user_days grain, never from raw events);
- late-arriving events (a delta whose rows scatter across OLD days)
  merge into their days' partitions and still reproduce recompute —
  no watermark needed for correctness;
- untouched day partitions are byte-stable across maintenance;
- an empty delta is a no-op;
- re-delivered (duplicate) events are absorbed by the distinct merge.
"""

import os

import pyspark.sql.functions as F
import pytest

from sparkify_datalake_spark.sources.load import load
from sparkify_datalake_spark.sources.matview import partition_files
from sparkify_datalake_spark.sources.matview_events import (
    dau_store_apply,
    dau_store_dashboard,
    dau_store_init,
)

SF_DIR = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture()
def events(spark):
    df = load(spark, SF_DIR, "events").cache()
    yield df
    df.unpersist()


def _live(spark):
    from sparkify_datalake_spark.registry import queries

    return queries()["events_dau_wau"](spark, SF_DIR)


def test_incremental_equals_recompute_append_by_time(spark, events, tmp_path):
    # append split at the day grain (ts is TIMESTAMP_NTZ at fixture
    # scale — no numeric percentile over it): newest half of the
    # observed days arrives as the delta
    path = str(tmp_path / "du")
    dk = F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd")
    days = sorted(
        r[0] for r in events.select(dk.alias("dk")).distinct().collect()
    )
    is_delta = dk.isin(days[len(days) // 2:])
    dau_store_init(spark, events.filter(~is_delta), path)
    touched = dau_store_apply(spark, path, events.filter(is_delta))
    assert touched == days[len(days) // 2:]
    assert _rows(dau_store_dashboard(spark, path)) == _rows(_live(spark))


def test_late_events_merge_into_old_days(spark, events, tmp_path):
    # the delta scatters across ALL days (event_id % 7): every touched
    # partition is an already-materialized "old" day
    path = str(tmp_path / "du")
    is_delta = F.col("event_id") % 7 == 0
    dau_store_init(spark, events.filter(~is_delta), path)
    touched = dau_store_apply(spark, path, events.filter(is_delta))
    assert touched
    assert _rows(dau_store_dashboard(spark, path)) == _rows(_live(spark))


def test_untouched_day_partitions_byte_stable(spark, events, tmp_path):
    path = str(tmp_path / "du")
    days = sorted(
        r["dk"]
        for r in events.select(
            F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias(
                "dk"
            )
        ).distinct().collect()
    )
    delta_days = days[-2:]
    in_delta = F.date_format(
        F.date_trunc("day", "ts"), "yyyy-MM-dd"
    ).isin(delta_days)
    # the base still holds SOME rows of the delta days, so those
    # partitions exist before the merge and are genuinely rewritten
    is_delta = in_delta & (F.col("event_id") % 2 == 0)
    dau_store_init(spark, events.filter(~is_delta), path)
    before = partition_files(path)
    touched = dau_store_apply(spark, path, events.filter(is_delta))
    assert touched == delta_days
    after = partition_files(path)
    for part, files in before.items():
        if part in {f"d_key={d}" for d in delta_days}:
            continue
        assert after[part] == files, f"{part} rewritten"


def test_empty_delta_is_noop(spark, events, tmp_path):
    path = str(tmp_path / "du")
    dau_store_init(spark, events, path)
    before = partition_files(path)
    assert dau_store_apply(spark, path, events.filter(F.lit(False))) == []
    assert partition_files(path) == before


def test_redelivered_events_are_absorbed(spark, events, tmp_path):
    path = str(tmp_path / "du")
    dau_store_init(spark, events, path)
    # replaying a slice of already-ingested events must not change the
    # dashboard (distinct merge = set union)
    dau_store_apply(spark, path, events.filter(F.col("event_id") % 11 == 0))
    assert _rows(dau_store_dashboard(spark, path)) == _rows(_live(spark))
