"""Slowly-changing-dimension type-2 maintenance (SURVEY §2-A lakehouse
family): full-history dimension tables where every attribute change
closes the old version and opens a new one, so facts can always join
the version that was current AT their event time.

Pure DataFrame transformation: the caller persists the result through
whatever table layer it uses (overwrite_partitions_dynamic, the
versioned table, or a plain write). Keeping the merge logic independent
of storage is what lets the same op back both a batch re-dimension job
and a foreachBatch CDC stream.

Scale notes (100 TB facts, large-but-dimension-sized dim): every join
here is keyed on the dimension key. History rows are never touched —
only current rows of CHANGED keys rewrite, so per-batch cost is
O(changed keys), not O(history). The changed-key frame is typically
tiny (a day's CDC) and broadcasts; the dimension side shuffles at most
once. The as-of fact join this table serves is join_asof / a range
join on (key, valid_from, valid_to).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SCD2_COLS = ["valid_from", "valid_to", "is_current"]


def scd2_init(snapshot: DataFrame, ts_col: str) -> DataFrame:
    """Open version 1 for every row of an initial dimension snapshot.

    `ts_col` (a timestamp column in the snapshot) becomes valid_from;
    valid_to is open (null) and everything is current.
    """
    return snapshot.select(
        *[c for c in snapshot.columns if c != ts_col],
        F.col(ts_col).alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )


def _any_attr_differs(tracked: list[str]) -> Column:
    # null-safe inequality on every tracked attribute: NULL→value and
    # value→NULL are real changes, NULL→NULL is not
    return ~reduce(
        Column.__and__,
        [F.col(f"u.{c}").eqNullSafe(F.col(f"c.{c}")) for c in tracked],
    )


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    key: str,
    tracked: list[str],
    ts_col: str,
) -> DataFrame:
    """Apply one update batch to an SCD2 dimension; returns the new table.

    `dim` carries (key, *tracked, valid_from, valid_to, is_current);
    `updates` carries (key, *tracked, ts_col). For each update whose
    tracked attributes differ (null-safely) from the key's current
    version — or whose key is new — the current version closes at the
    update's timestamp and a new open version begins there. Updates
    identical to the current version are no-ops (idempotent re-delivery
    of an unchanged snapshot adds zero versions). Same preconditions as
    upsert_by_key: one row per key per batch (dedupe to latest
    upstream), and batch timestamps move forward — an effective_ts at
    or before the key's current valid_from would create a zero- or
    negative-length version, so it is rejected loudly. Both
    preconditions are ENFORCED here, not just documented: a duplicate
    key would close the current version once but open several
    is_current rows, silently breaking the exactly-one-current
    invariant downstream as-of joins rely on.
    """
    dup = (
        updates.groupBy(key)
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") > 1)
    )
    if not dup.isEmpty():
        k = dup.select(key).limit(5).collect()
        raise ValueError(
            f"scd2_apply: duplicate keys in update batch "
            f"{[r[0] for r in k]} — dedupe to the latest row per key "
            f"upstream before applying"
        )
    hist = dim.filter(~F.col("is_current"))
    cur = dim.filter(F.col("is_current"))
    u, c = updates.alias("u"), cur.alias("c")
    joined = u.join(c, F.col(f"u.{key}") == F.col(f"c.{key}"), "left")
    changed = joined.filter(
        F.col(f"c.{key}").isNull() | _any_attr_differs(tracked)
    )
    bad = changed.filter(
        F.col(f"c.{key}").isNotNull()
        & (F.col(f"u.{ts_col}") <= F.col("c.valid_from"))
    )
    if not bad.isEmpty():
        k = bad.select(f"u.{key}").limit(5).collect()
        raise ValueError(
            f"scd2_apply: effective_ts not after current valid_from for "
            f"keys {[r[0] for r in k]}"
        )
    # per-batch state is O(changed keys): close exactly those current
    # rows, open their replacements, pass everything else through
    changed_keys = changed.select(
        F.col(f"u.{key}").alias(key), F.col(f"u.{ts_col}").alias("__close_ts")
    ).localCheckpoint()
    closed = (
        cur.join(F.broadcast(changed_keys), key)
        .withColumn("valid_to", F.col("__close_ts"))
        .withColumn("is_current", F.lit(False))
        .drop("__close_ts")
    )
    opened = changed.select(
        *[F.col(f"u.{c2}").alias(c2) for c2 in [key, *tracked]],
        F.col(f"u.{ts_col}").alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    untouched_cur = cur.join(F.broadcast(changed_keys), key, "left_anti")
    cols = [key, *tracked, *_SCD2_COLS]
    return (
        hist.select(cols)
        .unionByName(untouched_cur.select(cols))
        .unionByName(closed.select(cols))
        .unionByName(opened.select(cols))
    )


def scd2_lookup_asof(dim: DataFrame, facts: DataFrame, key: str, ts_col: str) -> DataFrame:
    """Enrich facts with the dimension version current AT the fact's
    timestamp: version valid_from ≤ ts < valid_to (open-ended current
    versions match everything from valid_from on).

    This is the consumption contract SCD2 exists for — a range join on
    (key, validity interval); Spark plans it as a broadcast/sort-merge
    join with a range residual, and at scale the dimension side is the
    small one (broadcast), so facts never shuffle.
    """
    d = dim.alias("d")
    f_ = facts.alias("f")
    return f_.join(
        F.broadcast(d),
        (F.col(f"f.{key}") == F.col(f"d.{key}"))
        & (F.col(f"f.{ts_col}") >= F.col("d.valid_from"))
        & (
            F.col("d.valid_to").isNull()
            | (F.col(f"f.{ts_col}") < F.col("d.valid_to"))
        ),
        "left",
    ).drop(F.col(f"d.{key}"))
