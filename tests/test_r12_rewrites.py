"""Round-12 rewrite guards: invariants the oracle sweep can't see.

The r12 optimizations are all output-identical (hash-pinned by the
oracle sweep); these tests pin the INTERNAL invariants the rewrites
introduced, on adversarial inputs the fixtures don't contain.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_dq_constraints_fk_join_survives_duplicate_dim_keys(spark):
    """dq_constraints now counts FK orphans via a LEFT join against the
    DISTINCT dim keys (one fact scan instead of agg + anti-join). A
    duplicate dim key must neither fan out the fact rows (which would
    corrupt every other counter) nor change the orphan count."""
    orders = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 99)], ["o_orderkey", "o_custkey"]
    )
    cust = spark.createDataFrame(
        [(10,), (10,), (20,)], ["c_custkey"]
    )  # duplicate PK on purpose
    keys = cust.select("c_custkey").distinct()
    j = orders.join(
        F.broadcast(keys), orders.o_custkey == keys.c_custkey, "left"
    )
    row = j.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(
            F.when(F.col("c_custkey").isNull(), 1).otherwise(0)
        ).alias("orphan"),
    ).collect()[0]
    assert row["n_rows"] == 3  # no fan-out from the duplicate key
    assert row["orphan"] == 1  # only custkey 99 is an orphan


def test_rewritten_queries_stay_single_action(spark, sf_dir):
    """The r12 job-count rewrites must never silently regain a
    driver-side build action (eager checkpoint, collect, createDataFrame
    broadcast): plan construction alone schedules ZERO Spark jobs for
    the single-action rewrites (the VERDICT r10 #5 guard, applied to
    the queries this round restructured)."""
    from sparkify_datalake_spark.registry import queries

    qs = queries()
    tracker = spark.sparkContext.statusTracker()
    for name in [
        "ts_periodogram",
        "stat_friedman",
        "dq_constraints",
        "events_cooccurrence_pmi",
        "text_bigram_surprisal",
        "text_zipf_fit",
    ]:
        qs[name](spark, sf_dir)  # warm relation cache (schema read job)
        before = set(tracker.getJobIdsForGroup(None) or [])
        qs[name](spark, sf_dir)
        after = set(tracker.getJobIdsForGroup(None) or [])
        assert after == before, f"{name} schedules jobs at plan build"


def test_friedman_array_midranks_match_window_formula(spark):
    """stat_friedman's per-block array midranks (#less + #leq + 1)/2
    must equal the former rank() + (tie_count − 1)/2 window on a block
    with every tie shape (all-distinct, pair tie, triple tie)."""
    from pyspark.sql import Window

    rows = [(1, 5), (2, 3), (3, 3), (4, 3), (5, 9), (6, 9), (7, 1)]
    df = spark.createDataFrame(rows, ["dow", "cnt"])
    w_rank = Window.orderBy("cnt")
    w_tie = Window.partitionBy("cnt")
    expected = {
        r["dow"]: r["r"]
        for r in df.select(
            "dow",
            (
                F.rank().over(w_rank)
                + (F.count(F.lit(1)).over(w_tie) - 1) / 2.0
            ).alias("r"),
        ).collect()
    }
    blk = df.agg(
        F.collect_list(F.struct("dow", "cnt")).alias("bc")
    )

    def _less(e):
        return F.size(F.filter("bc", lambda x: x["cnt"] < e["cnt"]))

    def _leq(e):
        return F.size(F.filter("bc", lambda x: x["cnt"] <= e["cnt"]))

    got_rows = blk.select(
        F.explode(
            F.transform(
                "bc",
                lambda e: F.struct(
                    e["dow"].alias("dow"),
                    ((_less(e) + _leq(e) + 1) / 2.0).alias("r"),
                    (
                        (_leq(e) - _less(e)) * (_leq(e) - _less(e)) - 1
                    ).alias("tt"),
                ),
            )
        ).alias("x")
    ).select("x.*")
    got = {r["dow"]: r["r"] for r in got_rows.collect()}
    assert got == expected
    # tie term: Σ(t³−t) per block — ties are {3:3, 9:2} → (27−3)+(8−2)
    tie = got_rows.agg(F.sum("tt").alias("s")).collect()[0]["s"]
    assert tie == (27 - 3) + (8 - 2)
