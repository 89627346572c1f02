"""SCD2 dimension maintenance (sources/scd2.py): version chains close
and open correctly, unchanged updates are no-ops, and the as-of lookup
returns the version current at the fact's timestamp.
"""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from sparkify_datalake_spark.sources.scd2 import (
    scd2_apply,
    scd2_init,
    scd2_lookup_asof,
)

T0 = datetime(2024, 1, 1)
T1 = datetime(2024, 2, 1)
T2 = datetime(2024, 3, 1)


def _snap(spark, rows, ts):
    return spark.createDataFrame(
        [(k, seg, ts) for k, seg in rows],
        "custkey long, segment string, eff timestamp",
    )


def _dim0(spark):
    return scd2_init(
        _snap(spark, [(1, "BUILDING"), (2, "MACHINERY")], T0), "eff"
    )


def _chains(dim):
    return {
        (r["custkey"], r["segment"], r["valid_from"], r["valid_to"], r["is_current"])
        for r in dim.collect()
    }


def test_init_opens_version_one(spark):
    got = _chains(_dim0(spark))
    assert got == {
        (1, "BUILDING", T0, None, True),
        (2, "MACHINERY", T0, None, True),
    }


def test_change_closes_and_opens(spark):
    upd = _snap(spark, [(1, "FURNITURE"), (3, "HOUSEHOLD")], T1)
    got = _chains(
        scd2_apply(_dim0(spark), upd, "custkey", ["segment"], "eff")
    )
    assert got == {
        (1, "BUILDING", T0, T1, False),   # closed at the update ts
        (1, "FURNITURE", T1, None, True),  # new open version
        (2, "MACHINERY", T0, None, True),  # untouched
        (3, "HOUSEHOLD", T1, None, True),  # brand-new key
    }


def test_unchanged_update_is_noop(spark):
    upd = _snap(spark, [(1, "BUILDING"), (2, "MACHINERY")], T1)
    dim1 = scd2_apply(_dim0(spark), upd, "custkey", ["segment"], "eff")
    assert _chains(dim1) == _chains(_dim0(spark))


def test_two_batches_build_contiguous_chain(spark):
    dim1 = scd2_apply(
        _dim0(spark), _snap(spark, [(1, "FURNITURE")], T1),
        "custkey", ["segment"], "eff",
    )
    dim2 = scd2_apply(
        dim1, _snap(spark, [(1, "AUTOMOBILE")], T2),
        "custkey", ["segment"], "eff",
    )
    k1 = sorted(
        (r["valid_from"], r["valid_to"], r["is_current"], r["segment"])
        for r in dim2.filter(F.col("custkey") == 1).collect()
    )
    assert k1 == [
        (T0, T1, False, "BUILDING"),
        (T1, T2, False, "FURNITURE"),
        (T2, None, True, "AUTOMOBILE"),
    ]
    # exactly one current version per key, chain contiguous
    cur = dim2.filter("is_current").groupBy("custkey").count().collect()
    assert all(r["count"] == 1 for r in cur)


def test_null_attr_transitions_are_real_changes(spark):
    upd = spark.createDataFrame(
        [(1, None, T1)], "custkey long, segment string, eff timestamp"
    )
    dim1 = scd2_apply(_dim0(spark), upd, "custkey", ["segment"], "eff")
    assert (1, None, T1, None, True) in _chains(dim1)
    # NULL -> NULL is NOT a change
    dim2 = scd2_apply(
        dim1,
        spark.createDataFrame(
            [(1, None, T2)], "custkey long, segment string, eff timestamp"
        ),
        "custkey", ["segment"], "eff",
    )
    assert _chains(dim2) == _chains(dim1)


def test_backdated_update_rejected(spark):
    with pytest.raises(ValueError, match="effective_ts"):
        scd2_apply(
            _dim0(spark), _snap(spark, [(1, "FURNITURE")], T0),
            "custkey", ["segment"], "eff",
        )


def test_duplicate_key_batch_rejected(spark):
    # two rows for key 1 in one batch would open two is_current
    # versions; the guard must refuse before any merge happens
    upd = _snap(spark, [(1, "FURNITURE"), (1, "AUTOMOBILE")], T1)
    with pytest.raises(ValueError, match="duplicate keys"):
        scd2_apply(_dim0(spark), upd, "custkey", ["segment"], "eff")


def test_asof_lookup_picks_contemporary_version(spark):
    dim1 = scd2_apply(
        _dim0(spark), _snap(spark, [(1, "FURNITURE")], T1),
        "custkey", ["segment"], "eff",
    )
    facts = spark.createDataFrame(
        [
            (100, 1, datetime(2024, 1, 15)),  # during BUILDING
            (101, 1, datetime(2024, 2, 1)),   # exactly at the cut → new
            (102, 1, datetime(2024, 5, 1)),   # open current version
            (103, 9, datetime(2024, 5, 1)),   # unknown key → null enrich
        ],
        "fact_id long, custkey long, ts timestamp",
    )
    got = {
        r["fact_id"]: r["segment"]
        for r in scd2_lookup_asof(dim1, facts, "custkey", "ts").collect()
    }
    assert got == {
        100: "BUILDING",
        101: "FURNITURE",
        102: "FURNITURE",
        103: None,
    }


def test_streaming_cdc_builds_version_chain(spark, tmp_path):
    """Micro-batch CDC into an SCD2 dimension: a file-source stream
    drives foreachBatch(scd2_apply) against a parquet-persisted dim —
    the streaming half of the SCD2 contract (at scale: Kafka source,
    same sink logic; composes with the versioned table for time-travel
    over dimension history)."""
    import os

    dim_path = str(tmp_path / "dim")
    src = str(tmp_path / "src")
    chk = str(tmp_path / "chk")
    os.makedirs(src, exist_ok=True)
    schema = "custkey long, segment string, eff timestamp"

    _dim0(spark).write.parquet(dim_path)

    def apply_batch(batch_df, _batch_id):
        s = batch_df.sparkSession
        if batch_df.isEmpty():
            return
        dim = s.read.parquet(dim_path)
        new_dim = scd2_apply(
            dim, batch_df, "custkey", ["segment"], "eff"
        ).localCheckpoint()  # materialize before overwriting the input path
        new_dim.write.mode("overwrite").parquet(dim_path)

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", chk)
        .start()
    )
    try:
        _snap(spark, [(1, "FURNITURE")], T1).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        q.processAllAvailable()
        _snap(spark, [(1, "AUTOMOBILE"), (3, "HOUSEHOLD")], T2).coalesce(
            1
        ).write.mode("append").parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()

    got = _chains(spark.read.parquet(dim_path))
    assert got == {
        (1, "BUILDING", T0, T1, False),
        (1, "FURNITURE", T1, T2, False),
        (1, "AUTOMOBILE", T2, None, True),
        (2, "MACHINERY", T0, None, True),
        (3, "HOUSEHOLD", T2, None, True),
    }


def test_random_update_sequences_keep_invariants(spark):
    """Property test: under ANY sequence of update batches, the SCD2
    table keeps its structural invariants — exactly one current version
    per key, per-key version chains contiguous (each valid_to equals
    the next valid_from) and strictly forward, and the current segment
    always equals the last CHANGED value delivered for the key."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    keys = [1, 2, 3]
    segments = ["A", "B", "C", None]
    batch = st.dictionaries(
        st.sampled_from(keys), st.sampled_from(segments), max_size=3
    )

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(st.lists(batch, min_size=1, max_size=4))
    def run(batches):
        dim = scd2_init(
            _snap(spark, [(k, "INIT") for k in keys], T0), "eff"
        )
        expected_current = {k: "INIT" for k in keys}
        for i, b in enumerate(batches):
            if not b:
                continue
            ts = datetime(2024, 2 + i, 1)
            upd = spark.createDataFrame(
                [(k, seg, ts) for k, seg in b.items()],
                "custkey long, segment string, eff timestamp",
            )
            dim = scd2_apply(dim, upd, "custkey", ["segment"], "eff")
            # keep lineage bounded across iterations
            dim = dim.localCheckpoint()
            for k, seg in b.items():
                expected_current[k] = seg
        rows = dim.collect()
        by_key = {}
        for r in rows:
            by_key.setdefault(r["custkey"], []).append(r)
        assert set(by_key) == set(keys)
        for k, versions in by_key.items():
            cur = [r for r in versions if r["is_current"]]
            assert len(cur) == 1
            assert cur[0]["segment"] == expected_current[k]
            chain = sorted(versions, key=lambda r: r["valid_from"])
            for a, b2 in zip(chain, chain[1:]):
                assert a["valid_to"] == b2["valid_from"]  # contiguous
                assert a["valid_from"] < a["valid_to"]  # forward-only
            assert chain[-1]["valid_to"] is None

    run()
