"""Spark 4 ``transformWithStateInPandas`` operator (SURVEY §2-J addendum).

The successor to ``applyInPandasWithState`` (runtime.py:80): typed state
variables (ValueState/ListState/MapState) resolved from a handle instead
of one opaque tuple, an explicit processor lifecycle (init/handleInputRows/
close), event-time or processing-time timers, and mandatory RocksDB state
backend — the arbitrary-stateful API Spark is consolidating on.

Environment gate: the transformWithState state-server protocol talks
protobuf between the JVM and the Python driver worker; this container
ships no ``google.protobuf``, so the operator raises a clear error at
call time when the dependency is missing and its test skips. The code
path itself is the real API wiring and runs wherever protobuf exists
(any standard Spark 4 cluster image).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def transform_state_available() -> bool:
    """True when the protobuf dependency the state server needs exists."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def per_type_running_stats_stream(
    spark: SparkSession, src_path: str
) -> DataFrame:
    """Per-event_type running (count, max_event_id) via a typed
    StatefulProcessor — the transformWithStateInPandas twin of
    runtime.running_counts_stream, same output schema so the runtime
    test can assert identical results across the two APIs.

    The processor keeps ONE ValueState per key; state lives in RocksDB
    (required by this operator family), which at 100 TB is the point:
    state spills to disk per-partition instead of being bounded by
    executor heap like the HDFS-backed default.
    """
    if not transform_state_available():
        raise ImportError(
            "transformWithStateInPandas needs google.protobuf for its "
            "state-server protocol; install protobuf (present on standard "
            "Spark 4 images) to use this operator"
        )

    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    from sparkify_datalake_spark.streaming.runtime import EVENT_SCHEMA

    # Self-contained class (no module-level helpers): pickles by value,
    # so the foreign-cwd Python workers never import this package.
    class RunningStats(StatefulProcessor):
        def init(self, handle):
            self.state = handle.getValueState("agg", "n long, max_id long")

        def handleInputRows(self, key, rows, timerValues):
            got = self.state.get()
            n, max_id = got if got is not None else (0, -1)
            for pdf in rows:
                n += len(pdf)
                max_id = max(max_id, int(pdf["event_id"].max()))
            self.state.update((n, max_id))
            yield pd.DataFrame(
                {
                    "event_type": [key[0]],
                    "n_events": [n],
                    "max_event_id": [max_id],
                }
            )

        def close(self):
            pass

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER
    )
    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_path)
    )
    return stream.groupBy("event_type").transformWithStateInPandas(
        RunningStats(),
        outputStructType="event_type string, n_events long, max_event_id long",
        outputMode="Update",
        timeMode="None",
    )
