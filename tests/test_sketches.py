"""Sketch-aggregate error bounds (SURVEY §2-D addenda, round 3).

Sketches are rows-only in the driver check (no DuckDB twin by design);
these tests supply the missing rigor: the approximate answer must sit
within the sketch's documented error of the exact twin computed by the
same engine.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkify_datalake_spark.registry import queries
from sparkify_datalake_spark.sources.load import load


def test_approx_percentile_within_bound_of_exact(spark, sf_dir):
    approx = {
        r["l_returnflag"]: r
        for r in queries()["agg_approx_percentile"](spark, sf_dir).collect()
    }
    exact = {
        r["l_returnflag"]: r
        for r in queries()["agg_percentile"](spark, sf_dir).collect()
    }
    assert set(approx) == set(exact)
    for flag, a in approx.items():
        e = exact[flag]
        # accuracy=10000 ⇒ rank error ≤ 0.01% of the group; on the
        # integer-grained quantity column that is at most one grid step,
        # and the sketch returns a real element vs the exact form's
        # interpolated value — allow one unit of quantity, 2% of price
        for c in ("qty_p25", "qty_p50", "qty_p75"):
            assert abs(a[c] - e[c]) <= 1.0, (flag, c, a[c], e[c])
        assert abs(a["price_p90"] - e["price_p90"]) <= 0.02 * e["price_p90"]


def test_hll_estimate_within_bound_of_exact(spark, sf_dir):
    est = {
        r["o_orderstatus"]: r["approx_customers"]
        for r in queries()["agg_hll_distinct"](spark, sf_dir).collect()
    }
    exact = {
        r["o_orderstatus"]: r["n_customers"]
        for r in queries()["agg_count_distinct"](spark, sf_dir).collect()
    }
    assert set(est) == set(exact)
    for status, e in est.items():
        # lgK=12 ⇒ relative standard error ≈ 1.6%; 5% is > 3σ
        assert abs(e - exact[status]) <= max(0.05 * exact[status], 2), (
            status,
            e,
            exact[status],
        )


def test_hll_union_merge_matches_direct_build(spark, sf_dir):
    """Merging fine-grained sketches must estimate like building the
    coarse sketch directly — the property that makes
    sketch-per-partition warehouse rollups sound. Equality is exact in
    sparse mode (small cardinalities); once sketches go dense the union
    path (HLL_8 accumulator → target-type coercion) can differ by a few
    registers, so the bound is 2% relative — far inside lgK=12's 3σ."""
    merged = {
        r["o_orderstatus"]: r["approx_customers"]
        for r in queries()["agg_hll_union"](spark, sf_dir).collect()
    }
    direct = {
        r["o_orderstatus"]: r["approx_customers"]
        for r in queries()["agg_hll_distinct"](spark, sf_dir).collect()
    }
    assert set(merged) == set(direct)
    for status, m in merged.items():
        assert abs(m - direct[status]) <= max(0.02 * direct[status], 2), (
            status,
            m,
            direct[status],
        )


def test_hll_sketch_column_is_mergeable_binary(spark, sf_dir):
    """The sketch itself is a binary column a warehouse can persist and
    re-merge later — union of two disjoint halves covers the whole."""
    orders = load(spark, sf_dir, "orders")
    halves = orders.withColumn(
        "half", (F.col("o_orderkey") % 2).cast("int")
    ).groupBy("half").agg(
        F.hll_sketch_agg(F.col("o_custkey"), F.lit(12)).alias("sketch")
    )
    total = halves.agg(
        F.hll_sketch_estimate(
            F.hll_union_agg(F.col("sketch"), F.lit(False))
        ).alias("n")
    ).collect()[0]["n"]
    whole = orders.agg(
        F.hll_sketch_estimate(
            F.hll_sketch_agg(F.col("o_custkey"), F.lit(12))
        ).alias("n")
    ).collect()[0]["n"]
    assert abs(total - whole) <= max(0.02 * whole, 2), (total, whole)


def test_cms_estimates_bounded_and_never_undercount(spark, sf_dir):
    """CMS invariants: est ≥ true count for every probe (min of
    overcounting cells can never undercount), and with width=2048 /
    depth=5 over a fixture-sized corpus the overcount stays within
    εN = (e/width)·N."""
    import math

    from sparkify_datalake_spark.operators import aggregates as A

    orders = load(spark, sf_dir, "orders")
    n = orders.count()
    true = {
        r["o_custkey"]: r["cnt"]
        for r in orders.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("o_custkey") < 20)
        .collect()
    }
    est = {
        r["o_custkey"]: r["est_count"]
        for r in queries()["agg_cms_counts"](spark, sf_dir).collect()
    }
    assert set(est) == set(true)
    eps_n = math.e / A._CMS_WIDTH * n
    for k, t in true.items():
        assert est[k] >= t, f"CMS undercounted key {k}: {est[k]} < {t}"
        assert est[k] <= t + eps_n, f"CMS overcount beyond εN for {k}"


def test_cms_merges_by_summing_cells(spark, sf_dir):
    """Sketches over disjoint slices merged by cell-sum must equal the
    sketch built over the union — the mergeability contract that lets
    per-day sketches roll up without fact re-scans."""
    from sparkify_datalake_spark.operators import aggregates as A

    orders = load(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    lo = orders.filter(F.col("o_orderkey") % 2 == 0)
    hi = orders.filter(F.col("o_orderkey") % 2 == 1)
    merged = (
        A.cms_build(lo, "o_custkey")
        .unionAll(A.cms_build(hi, "o_custkey"))
        .groupBy("d", "w")
        .agg(F.sum("cnt").alias("cnt"))
    )
    whole = A.cms_build(orders, "o_custkey")
    diff = merged.join(whole, ["d", "w"], "full").filter(
        F.coalesce(merged["cnt"], F.lit(0))
        != F.coalesce(whole["cnt"], F.lit(0))
    )
    assert diff.count() == 0


def test_kmv_prefilter_retains_the_k_minima(spark, sf_dir):
    """The KMV scale-path pre-filter (prefix16·n ≤ 4k·65536) must be
    invisible: the estimate must equal the one from an unfiltered
    bottom-k. Rebuilds the naive sketch inline and compares per group."""
    from pyspark.sql import Window
    from sparkify_datalake_spark.operators.aggregates import (
        _KMV_K,
        _KMV_SCALE,
    )

    got = {
        r["grp"]: r
        for r in queries()["agg_kmv_distinct"](spark, sf_dir).collect()
    }
    ev = load(spark, sf_dir, "events")
    base = ev.select(
        F.col("event_type").alias("grp"),
        "user_id",
        F.col("ts").cast("date").cast("string").alias("d"),
    )
    grain = base.unionByName(
        base.select(F.lit("__all__").alias("grp"), "user_id", "d")
    )
    dist = grain.distinct().select(
        "grp",
        F.md5(
            F.concat_ws(
                "#", F.lit("kmv"), F.col("user_id").cast("string"), F.col("d")
            )
        ).alias("hx"),
    )
    w = Window.partitionBy("grp").orderBy("hx")
    naive = (
        dist.select("grp", "hx", F.row_number().over(w).alias("rn"))
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n_true"),
            F.max(
                F.when(
                    F.col("rn") == _KMV_K,
                    F.expr("conv(substring(hx, 1, 12), 16, 10)").cast("long"),
                )
            ).alias("vk"),
        )
        .collect()
    )
    assert set(got) == {r["grp"] for r in naive}
    for r in naive:
        g = got[r["grp"]]
        assert g["true_distinct"] == r["n_true"]
        if r["n_true"] < _KMV_K:
            assert g["est_distinct"] == float(r["n_true"])
        else:
            expect = round((_KMV_K - 1) * float(_KMV_SCALE) / r["vk"], 2)
            assert g["est_distinct"] == expect, (r["grp"], g, expect)
        # KMV error bound: SD ≈ n/sqrt(k−2); assert within 5 SDs
        sd = r["n_true"] / (_KMV_K - 2) ** 0.5
        assert abs(g["est_distinct"] - r["n_true"]) <= 5 * sd


def test_kmv_prefilter_boundary_across_cardinalities(spark):
    """The prefix16 pre-filter must retain the k minima for ANY group
    cardinality, not just the fixture's — the cut starts biting above
    n = 4k (=256), so sweep cardinalities spanning that boundary with
    synthetic keys and compare filtered vs naive bottom-k directly."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F
    from sparkify_datalake_spark.operators.aggregates import _KMV_K

    for n in (100, 300, 1000, 5000):
        base = spark.range(n).select(
            F.md5(F.concat_ws("#", F.lit("bound"), F.col("id"))).alias("hx")
        )
        w = Window.orderBy("hx")
        naive = (
            base.select("hx", F.row_number().over(w).alias("rn"))
            .filter(F.col("rn") <= _KMV_K)
            .agg(F.max("hx").alias("kth"))
            .first()["kth"]
        )
        survivors = base.filter(
            F.expr("conv(substring(hx, 1, 4), 16, 10)").cast("long")
            * F.lit(n)
            <= F.lit(4 * _KMV_K * 65536)
        )
        filt = (
            survivors.select("hx", F.row_number().over(w).alias("rn"))
            .filter(F.col("rn") <= _KMV_K)
            .agg(F.max("hx").alias("kth"), F.count(F.lit(1)).alias("c"))
            .first()
        )
        assert filt["c"] == min(_KMV_K, n), (n, filt["c"])
        assert filt["kth"] == naive, (n, filt["kth"], naive)
