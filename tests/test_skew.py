"""Skew handling under a genuinely skewed key distribution (VERDICT r3
next-round item #7).

The salted-join/two-phase-agg machinery (join_skew_salted,
agg_salted_twophase, win_ntile_twophase) is hash-checked for
correctness on the uniform fixtures, but uniformity never exercises the
*reason* those plans exist. This file generates a Zipf-ish corpus where
ONE key owns half the rows (the celebrity-key profile) and proves, with
deterministic partition-level evidence rather than flaky wall-clock
assertions:

1. the naive hash partitioning really does wedge one reducer (the hot
   key's entire mass lands in a single partition);
2. salting really does spread that mass (max partition shrinks by ~the
   salt factor);
3. AQE's skew-join splitting engages on the naive plan when thresholds
   are at production-shaped values (the executed plan says ``skew=true``).

Wall-clock margins are REPORTED to stderr / BENCH.md, not asserted —
this VM's CPU steal makes timing assertions flaky, while partition
balance is exact.
"""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

N_ROWS = 1_000_000
N_COLD_KEYS = 50_000
SALTS = 16


@pytest.fixture(scope="module")
def skewed(spark):
    """Deterministic Zipf-ish fact frame: key 0 owns ~50% of rows, the
    rest spread uniformly over 50k cold keys."""
    df = (
        spark.range(N_ROWS)
        .select(
            F.when(F.pmod("id", 2) == 0, F.lit(0))
            .otherwise(F.pmod(F.xxhash64("id"), F.lit(N_COLD_KEYS)))
            .alias("key"),
            F.col("id").alias("value"),
        )
        .persist()
    )
    df.count()
    yield df
    df.unpersist()


def _partition_sizes(df):
    return [
        r["n"]
        for r in df.groupBy(F.spark_partition_id().alias("p"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    ]


def test_naive_hash_partitioning_wedges_one_reducer(skewed):
    sizes = _partition_sizes(skewed.repartition(32, "key"))
    # the hot key's entire ~500k-row mass is in exactly one partition
    assert max(sizes) >= N_ROWS * 0.45
    assert max(sizes) > 10 * (sum(sizes) / len(sizes))


def test_salting_spreads_the_hot_key(skewed):
    # 64 salts into 32 partitions: the hot key's ~500k rows shatter into
    # ~8k-row buckets; the max partition then carries a few colliding
    # buckets over the ~15k cold baseline (measured deterministic values:
    # naive max 516k → salted max 63k, an 8.2× rebalance). The bound is
    # the conservative half of that.
    salted = skewed.withColumn(
        "salt", F.pmod(F.xxhash64("value"), F.lit(64))
    )
    sizes = _partition_sizes(salted.repartition(32, "key", "salt"))
    naive_max = max(_partition_sizes(skewed.repartition(32, "key")))
    assert max(sizes) <= naive_max / 4, (
        f"salted max {max(sizes)} vs naive max {naive_max}"
    )


def test_aqe_splits_skewed_sortmerge_join(spark, skewed):
    """With production-shaped thresholds scaled to fixture bytes, AQE
    must mark the hot partition skewed and split it (skew=true in the
    executed SMJ node) — the no-code-change half of the skew playbook
    that join_skew_salted complements for single-key extremes."""
    dim = spark.range(N_COLD_KEYS).select(
        F.col("id").alias("key"), (F.col("id") * 2).alias("attr")
    )
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "256KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "256KB",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        # collect() drives THIS DataFrame's QueryExecution — count()/noop
        # writes build a different QE whose final adaptive plan is not
        # visible on `joined` (isFinalPlan would stay false). The filter
        # references BOTH sides so Catalyst cannot push it below the
        # join: the shuffle carries the full skewed mass, while the
        # driver-side collect stays ~1/97th of it.
        joined = skewed.join(dim, "key").filter(
            F.pmod(F.col("value") + F.col("attr"), F.lit(97)) == 0
        )
        n = len(joined.collect())
        assert 0 < n < N_ROWS // 48
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


@pytest.mark.slow
def test_salted_aggregation_wall_margin_reported(spark, skewed, capsys):
    """Two-phase salted agg vs naive agg on the hot-key corpus, single
    reducer forced (shuffle.partitions left alone but AQE coalescing
    can't help a single hot KEY) — wall times reported for BENCH.md;
    only a sanity bound is asserted (salted not slower than 3× naive)."""

    def timeit(df):
        best = float("inf")
        for _ in range(2):
            t0 = time.monotonic()
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.monotonic() - t0)
        return best

    heavy = F.sha2(F.concat_ws("-", "key", "value"), 256)
    naive = skewed.groupBy("key").agg(
        F.count(F.lit(1)).alias("n"),
        F.max(heavy).alias("h"),
    )
    salted = (
        skewed.withColumn("salt", F.pmod(F.xxhash64("value"), F.lit(SALTS)))
        .groupBy("key", "salt")
        .agg(F.count(F.lit(1)).alias("pn"), F.max(heavy).alias("ph"))
        .groupBy("key")
        .agg(F.sum("pn").alias("n"), F.max("ph").alias("h"))
    )
    t_naive, t_salted = timeit(naive), timeit(salted)
    with capsys.disabled():
        print(
            f"\n[skew-bench] naive={t_naive:.2f}s salted={t_salted:.2f}s "
            f"(hot key 50% of {N_ROWS} rows, {SALTS} salts)"
        )
    assert t_salted <= 3 * t_naive
