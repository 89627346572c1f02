"""Structured Streaming runtime tests (SURVEY.md §2-J `test` rows).

Drives real readStream → watermark state → memory sink:
- stream_watermark_late: a row older than the watermark is dropped from
  an append-mode windowed aggregation.
- stream_stateful_dedup: dropDuplicatesWithinWatermark emits each
  event_id once across micro-batches.
"""

from __future__ import annotations

import datetime as dt

import pytest

from sparkify_datalake_spark.streaming import runtime


def _ts(minute: int, second: int = 0) -> dt.datetime:
    return dt.datetime(2024, 6, 1, 12, minute, second)


def test_watermark_drops_late_rows(spark, tmp_path):
    src = str(tmp_path / "src")
    chk = str(tmp_path / "chk")

    # Batch 1: window [12:00,12:10) gets 2 events; [12:20,12:30) one event
    # (advances max event time to 12:25 → watermark 12:15 after the batch).
    runtime.write_replay_batch(
        spark,
        src,
        [
            (1, _ts(1), 10, "view"),
            (2, _ts(5), 10, "view"),
            (3, _ts(25), 11, "view"),
        ],
        "b1",
    )
    query = runtime.run_to_memory(
        runtime.windowed_counts_stream(spark, src), "wm_counts", "append", chk
    )
    try:
        query.processAllAvailable()

        # Batch 2: one LATE row for [12:00,12:10) — window end 12:10 <=
        # watermark 12:15, so it must be dropped; plus a row at 12:45
        # advancing the watermark to 12:35 which closes both old windows.
        runtime.write_replay_batch(
            spark,
            src,
            [
                (4, _ts(6), 10, "view"),
                (5, _ts(45), 12, "view"),
            ],
            "b2",
        )
        query.processAllAvailable()

        result = {
            r["window_start"].minute: r["n_events"]
            for r in spark.sql("SELECT * FROM wm_counts").collect()
        }
        # Closed windows: [12:00,12:10) → 2 (late row 4 dropped),
        # [12:20,12:30) → 1. [12:40,...) is still open (not emitted).
        assert result.get(0) == 2, f"late row leaked into window 12:00: {result}"
        assert result.get(20) == 1
        assert 40 not in result
    finally:
        query.stop()


def test_stateful_dedup_within_watermark(spark, tmp_path):
    src = str(tmp_path / "src")
    chk = str(tmp_path / "chk")

    runtime.write_replay_batch(
        spark,
        src,
        [
            (100, _ts(0), 1, "click"),
            (101, _ts(1), 1, "click"),
            (100, _ts(2), 1, "click"),  # duplicate within batch
        ],
        "b1",
    )
    query = runtime.run_to_memory(
        runtime.dedup_stream(spark, src), "dedup_out", "append", chk
    )
    try:
        query.processAllAvailable()
        # duplicate again in a later micro-batch, still inside watermark
        runtime.write_replay_batch(
            spark,
            src,
            [
                (100, _ts(3), 1, "click"),
                (102, _ts(4), 1, "click"),
            ],
            "b2",
        )
        query.processAllAvailable()

        rows = spark.sql("SELECT event_id FROM dedup_out").collect()
        ids = sorted(r["event_id"] for r in rows)
        assert ids == [100, 101, 102], f"dedup failed: {ids}"
    finally:
        query.stop()


def test_stateful_running_counts_across_batches(spark, tmp_path):
    """applyInPandasWithState keeps per-key state across micro-batches."""
    src = str(tmp_path / "src")
    chk = str(tmp_path / "chk")

    runtime.write_replay_batch(
        spark,
        src,
        [
            (1, _ts(0), 1, "click"),
            (2, _ts(1), 1, "view"),
            (3, _ts(2), 2, "click"),
        ],
        "b1",
    )
    query = runtime.run_to_memory(
        runtime.running_counts_stream(spark, src), "run_counts", "update", chk
    )
    try:
        query.processAllAvailable()
        runtime.write_replay_batch(
            spark, src, [(9, _ts(3), 3, "click")], "b2"
        )
        query.processAllAvailable()

        # memory sink in update mode appends each emission; the LAST
        # emission per key carries the accumulated state.
        rows = spark.sql("SELECT * FROM run_counts").collect()
        latest = {}
        for r in rows:
            latest[r["event_type"]] = (r["n_events"], r["max_event_id"])
        assert latest["click"] == (3, 9), f"state not kept: {latest}"
        assert latest["view"] == (1, 2)
    finally:
        query.stop()


def test_stream_stream_join_with_time_bound(spark, tmp_path):
    """Purchases join clicks within 30 min; out-of-bound pairs excluded."""
    clicks_src = str(tmp_path / "clicks")
    purchases_src = str(tmp_path / "purchases")
    chk = str(tmp_path / "chk")

    runtime.write_replay_batch(
        spark,
        clicks_src,
        [
            (1, _ts(0), 7, "click"),    # matched by purchase at 12:10
            (2, _ts(5), 8, "click"),    # no purchase for this user
            (3, _ts(0), 9, "click"),    # purchase 40 min later → excluded
        ],
        "c1",
    )
    runtime.write_replay_batch(
        spark,
        purchases_src,
        [
            (100, _ts(10), 7, "purchase"),  # 10 min after click 1 → match
            (101, _ts(40), 9, "purchase"),  # 40 min after click 3 → no match
            (102, _ts(15), 6, "purchase"),  # user with no click
        ],
        "p1",
    )
    query = runtime.run_to_memory(
        runtime.click_purchase_join_stream(spark, clicks_src, purchases_src),
        "ss_join",
        "append",
        chk,
    )
    try:
        query.processAllAvailable()
        rows = spark.sql(
            "SELECT purchase_id, click_id FROM ss_join"
        ).collect()
        pairs = sorted((r["purchase_id"], r["click_id"]) for r in rows)
        assert pairs == [(100, 1)], f"wrong join pairs: {pairs}"
    finally:
        query.stop()


def test_stream_static_broadcast_enrich(spark, tmp_path):
    """Events enrich against a broadcast static dimension; unmatched
    users drop (inner join), and the plan carries no streaming state."""
    src = str(tmp_path / "src")
    chk = str(tmp_path / "chk")

    dim = spark.createDataFrame(
        [(10, "power"), (11, "casual")], "user_id long, segment string"
    )
    runtime.write_replay_batch(
        spark,
        src,
        [
            (1, _ts(1), 10, "view"),
            (2, _ts(2), 11, "click"),
            (3, _ts(3), 99, "view"),  # no dimension row → dropped
        ],
        "b1",
    )
    query = runtime.run_to_memory(
        runtime.stream_static_enrich(spark, src, dim),
        "enriched",
        "append",
        chk,
    )
    try:
        query.processAllAvailable()
        rows = {
            (r["event_id"], r["segment"])
            for r in spark.sql("SELECT * FROM enriched").collect()
        }
        assert rows == {(1, "power"), (2, "casual")}
        # broadcast, stateless: no state-store rows in the progress metrics
        progress = query.lastProgress
        assert all(
            (s.get("numRowsTotal") or 0) == 0
            for s in progress.get("stateOperators", [])
        )
    finally:
        query.stop()


def test_transform_with_state_running_stats(spark, tmp_path):
    """transformWithStateInPandas (typed-state successor API) keeps
    per-key ValueState across micro-batches — same semantics as the
    applyInPandasWithState twin above. Skips where google.protobuf
    (the state-server protocol dependency) is not installed."""
    from sparkify_datalake_spark.streaming import transform_state

    if not transform_state.transform_state_available():
        pytest.skip("google.protobuf not available in this environment")

    src = str(tmp_path / "src")
    chk = str(tmp_path / "chk")
    runtime.write_replay_batch(
        spark,
        src,
        [
            (1, _ts(0), 1, "click"),
            (2, _ts(1), 1, "view"),
            (3, _ts(2), 2, "click"),
        ],
        "b1",
    )
    query = runtime.run_to_memory(
        transform_state.per_type_running_stats_stream(spark, src),
        "tws_counts",
        "update",
        chk,
    )
    try:
        query.processAllAvailable()
        runtime.write_replay_batch(spark, src, [(9, _ts(3), 3, "click")], "b2")
        query.processAllAvailable()
        rows = spark.sql("SELECT * FROM tws_counts").collect()
        latest = {}
        for r in rows:
            latest[r["event_type"]] = (r["n_events"], r["max_event_id"])
        assert latest["click"] == (3, 9), f"state not kept: {latest}"
        assert latest["view"] == (1, 2)
    finally:
        query.stop()


def test_transform_with_state_gate_reports_clearly():
    """When protobuf is missing the operator must fail at call time with
    an actionable message, not a deep py4j stack."""
    from sparkify_datalake_spark.streaming import transform_state

    if transform_state.transform_state_available():
        pytest.skip("protobuf present — gate path not reachable")
    with pytest.raises(ImportError, match="protobuf"):
        transform_state.per_type_running_stats_stream(None, "/nonexistent")


def test_topology_runs_on_rate_source(spark, tmp_path):
    """Source seam (streaming/sources.py): the SAME windowed-counts
    topology that the replay tests drive also runs on the built-in rate
    source — proving the operators are transport-agnostic (production
    swaps in kafka_events_source the same way)."""
    import time

    from sparkify_datalake_spark.streaming.sources import rate_events_source

    chk = str(tmp_path / "chk_rate")
    df = runtime.windowed_counts_stream(
        spark, rate_events_source(rows_per_second=500)
    )
    assert [f.name for f in df.schema.fields] == ["window_start", "n_events"]
    query = runtime.run_to_memory(df, "rate_counts", "update", chk)
    try:
        # NOTE: never processAllAvailable() on a rate source — it only
        # returns when no new data is available, which an unbounded
        # generator never satisfies. Poll the sink instead.
        deadline = time.monotonic() + 60
        rows = []
        while time.monotonic() < deadline:
            rows = spark.sql("SELECT * FROM rate_counts").collect()
            if rows and sum(r["n_events"] for r in rows) >= 100:
                break
            time.sleep(0.5)
        assert rows, "rate source produced no windowed counts in 60s"
        assert all(r["n_events"] > 0 for r in rows)
        assert all(r["window_start"] is not None for r in rows)
    finally:
        query.stop()


def test_kafka_source_adapter_shape():
    """kafka_events_source is the documented production adapter; without
    the kafka package on the classpath, constructing the plan must fail
    at the source boundary (AnalysisException naming the data source),
    never partially run."""
    from pyspark.errors import AnalysisException

    from sparkify_datalake_spark.session import get_spark
    from sparkify_datalake_spark.streaming.sources import kafka_events_source

    provider = kafka_events_source("broker:9092", "events")
    with pytest.raises(AnalysisException):
        provider(get_spark("kafka-gate"))


def test_stream_stream_left_outer_null_pads_after_watermark(spark, tmp_path):
    """Unmatched clicks are emitted null-padded once the watermark
    passes their match bound — exactly once, not before."""
    clicks_src = str(tmp_path / "clicks")
    purchases_src = str(tmp_path / "purchases")
    chk = str(tmp_path / "chk")

    runtime.write_replay_batch(
        spark,
        clicks_src,
        [
            (1, _ts(0), 7, "click"),   # converts at 12:10
            (2, _ts(0), 8, "click"),   # never converts → null-padded
        ],
        "c1",
    )
    runtime.write_replay_batch(
        spark,
        purchases_src,
        [(100, _ts(10), 7, "purchase")],
        "p1",
    )
    query = runtime.run_to_memory(
        runtime.click_purchase_left_outer_stream(
            spark, clicks_src, purchases_src
        ),
        "ss_left",
        "append",
        chk,
    )
    try:
        query.processAllAvailable()
        early = {
            (r["click_id"], r["purchase_id"])
            for r in spark.sql("SELECT * FROM ss_left").collect()
        }
        # Matched pair may emit immediately; the unmatched click must NOT
        # be null-padded yet (watermark hasn't passed its bound).
        assert (2, None) not in early, f"null pad leaked early: {early}"

        # Advance both watermarks far past click 2's 30-min bound.
        runtime.write_replay_batch(
            spark, clicks_src, [(3, _ts(55), 9, "click")], "c2"
        )
        runtime.write_replay_batch(
            spark, purchases_src, [(101, _ts(55), 9, "purchase")], "p2"
        )
        query.processAllAvailable()

        rows = [
            (r["click_id"], r["purchase_id"])
            for r in spark.sql("SELECT * FROM ss_left").collect()
        ]
        assert sorted(
            (c, p) for c, p in rows if c in (1, 2)
        ) == [(1, 100), (2, None)], f"wrong outer result: {rows}"
        assert rows.count((2, None)) == 1, "null pad must emit exactly once"
    finally:
        query.stop()


def test_session_window_merges_across_microbatches(spark, tmp_path):
    """The §2-J session-window runtime twin (VERDICT r4 #4 / r5 #3):
    a later micro-batch's event landing INSIDE an open session's window
    must MERGE into it (one session, extended end), not start a second
    one — and the merged session is emitted exactly once, append-mode,
    only after the watermark passes its end."""
    src = str(tmp_path / "src")
    chk = str(tmp_path / "chk")

    # Batch 1: user 10 at 12:00 and 12:04 → one open session
    # [12:00, 12:14) in state (nothing emitted: watermark 11:54).
    runtime.write_replay_batch(
        spark,
        src,
        [(1, _ts(0), 10, "view"), (2, _ts(4), 10, "view")],
        "b1",
    )
    df = runtime.session_counts_stream(spark, src)
    assert [f.name for f in df.schema.fields] == [
        "user_id", "session_start", "session_end", "n_events",
    ]
    query = runtime.run_to_memory(df, "sess_counts", "append", chk)
    try:
        query.processAllAvailable()
        assert spark.sql("SELECT * FROM sess_counts").count() == 0

        # Batch 2: user 10 at 12:12 — inside [12:00, 12:14), so it must
        # merge and extend the session to [12:00, 12:22); user 99 at
        # 13:00 advances the watermark to 12:50, closing user 10's
        # session (user 99's own stays open and must NOT be emitted).
        runtime.write_replay_batch(
            spark,
            src,
            [
                (3, _ts(12), 10, "view"),
                (4, dt.datetime(2024, 6, 1, 13, 0), 99, "view"),
            ],
            "b2",
        )
        query.processAllAvailable()

        rows = spark.sql("SELECT * FROM sess_counts").collect()
        assert len(rows) == 1, (
            f"expected ONE merged session, got {rows} — a second row "
            f"means the 12:12 event started a new session instead of "
            f"merging across micro-batches"
        )
        r = rows[0]
        assert r["user_id"] == 10
        assert r["n_events"] == 3
        assert r["session_start"] == _ts(0)
        assert r["session_end"] == _ts(22), (
            f"merge must extend the end to last event + gap: {r}"
        )
    finally:
        query.stop()


def test_session_topology_runs_on_rate_source(spark, tmp_path):
    """Source seam for the session topology: the SAME
    session_counts_stream plan runs on the built-in rate source. With
    rows/s=500 and 100 users, each user's inter-arrival (~200 ms)
    exceeds a 100 ms gap, so sessions close continuously and the
    append-mode sink fills without replay files."""
    import time

    from sparkify_datalake_spark.streaming.sources import rate_events_source

    chk = str(tmp_path / "chk_rate_sess")
    df = runtime.session_counts_stream(
        spark,
        rate_events_source(rows_per_second=500),
        gap="100 milliseconds",
        watermark="0 seconds",
    )
    query = runtime.run_to_memory(df, "rate_sess", "append", chk)
    try:
        deadline = time.monotonic() + 60
        rows = []
        while time.monotonic() < deadline:
            rows = spark.sql("SELECT * FROM rate_sess").collect()
            if len(rows) >= 20:
                break
            time.sleep(0.5)
        assert len(rows) >= 20, "rate source closed no sessions in 60s"
        assert all(r["n_events"] >= 1 for r in rows)
        assert all(r["session_end"] > r["session_start"] for r in rows)
    finally:
        query.stop()
