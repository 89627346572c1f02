"""Scaling exponents beyond sf0.1 for the heavy hitters (VERDICT r3
item #3): convert the "near-linear at 100 TB" design arguments into
fitted curves.

A deterministic sf0.1-shaped probe fixture is generated under /tmp at
1× and 8× (tools/gen_probe_fixture.py — seed-pinned, reused across
runs), and each op's wall time is fitted to t ∝ n^e between the two
points. Near-linear ops must stay under e ≤ 1.45 (true quadratic would
read e = 2.0; the gap is the noise budget for this VM's CPU steal —
each point is min-of-2). `sim_knn_graph` is quadratic BY DESIGN (exact
kNN over all pairs, blocked); it gets the documented-quadratic bound
instead. Measured exponents are printed for BENCH.md.
"""

from __future__ import annotations

import math
import time

import pytest

from sparkify_datalake_spark.registry import queries

sys_path_marker = True  # tools/ import resolved via conftest's repo root

_SMALL_SCALE = 1.0
_LARGE_SCALE = 8.0
_DIR_SMALL = "/tmp/sparkify_probe_x1_v2"
_DIR_LARGE = "/tmp/sparkify_probe_x8_v2"

# op → (driving table, exponent bound, repeats)
_PROBES = {
    "dedup_near_verified": ("documents", 1.45, 2),
    "mm_dedup_phash": ("documents", 1.45, 2),
    "mine_basket_pairs": ("lineitem", 1.45, 2),
    "graph_user_pagerank": ("events", 1.45, 2),
    # wedge-join ops: users scale WITH events in this fixture (constant
    # average degree), so Σ deg² grows ~linearly in nodes; the explicit
    # shuffle-width fix (graph.py) is what keeps the fan-out stage
    # parallel enough to track that
    "graph_link_prediction": ("events", 1.45, 2),
    "graph_triangle_count": ("events", 1.45, 2),
    # exact all-pairs kNN: O(n²) work by design, blocked into bounded
    # GEMM tasks — document the quadratic, don't pretend it's linear
    "sim_knn_graph": ("embeddings", 2.3, 2),
}


@pytest.fixture(scope="module")
def probe_dirs(spark):
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
    from gen_probe_fixture import generate

    return (
        generate(spark, _DIR_SMALL, _SMALL_SCALE),
        generate(spark, _DIR_LARGE, _LARGE_SCALE),
    )


def _wall(spark, name: str, sf_dir: str, repeats: int) -> float:
    fn = queries()[name]
    best = float("inf")
    for _ in range(repeats):
        t0 = time.monotonic()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.monotonic() - t0)
    return best


@pytest.mark.slow
@pytest.mark.parametrize("name", sorted(_PROBES))
def test_scaling_exponent(spark, probe_dirs, name, capsys):
    table, bound, repeats = _PROBES[name]
    small_dir, large_dir = probe_dirs
    t_small = _wall(spark, name, small_dir, repeats)
    t_large = _wall(spark, name, large_dir, repeats)
    n_ratio = _LARGE_SCALE / _SMALL_SCALE
    # fixed overhead (scheduler floor) deflates the exponent at the
    # small point; that bias is conservative for catching quadratics
    exponent = math.log(max(t_large, 1e-3) / max(t_small, 1e-3)) / math.log(
        n_ratio
    )
    with capsys.disabled():
        print(
            f"\n[scale-probe] {name}: {t_small:.2f}s → {t_large:.2f}s "
            f"at {n_ratio:.0f}× {table} ⇒ exponent {exponent:.2f} "
            f"(bound {bound})"
        )
    assert exponent <= bound, (
        f"{name}: exponent {exponent:.2f} exceeds {bound} "
        f"({t_small:.2f}s → {t_large:.2f}s for {n_ratio}× {table})"
    )


@pytest.mark.slow
def test_adversarial_mega_template_cap_holds(spark, probe_dirs, capsys):
    """Adversarial dedup probe (VERDICT r4 #6 / r6 #6): plant a
    degenerate mega-template family — 5k docs sharing one template,
    each with a unique 1-token suffix, so they land in a handful of
    band buckets — on top of the 8× corpus, and prove from measured
    bucket sizes that (a) uncapped, the family alone makes the verify
    stage quadratic (tens of millions of candidate pairs), (b) the
    mega-bucket cap keeps the ACTUAL candidate set sub-quadratic
    (bounded per-doc), and (c) recall on NORMAL near-dup groups — 600
    planted 3-member control groups, each over its own rare vocabulary
    — is untouched with the mega family present: the cap only
    sacrifices the degenerate family, which the exact/block dedup
    ladder catches anyway (its members are ~95%-identical).

    The control groups are planted by THIS test rather than reusing
    the fixture's id%20 groups because the probe fixture's 30-word
    vocab is itself degenerate at 8×: long word-salad docs converge on
    the same near-full-vocab token SET, so the fixture's own hot
    buckets get capped and its groups are not a clean recall control
    (measured 0.26 group recall at 8× with or without a plant — a
    fixture property, not a cap failure)."""
    from pyspark.sql import functions as F

    from sparkify_datalake_spark.operators.text import (
        _MAX_BUCKET,
        dedup_verified_frame,
        minhash_band_buckets,
    )

    _, large_dir = probe_dirs
    fixture = spark.read.parquet(f"{large_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    n_fixture = fixture.count()

    template = " ".join(
        f"tmplword{i} common{i % 5}" for i in range(20)
    )  # 25 distinct tokens
    n_mega = 5_000
    mega = spark.range(n_mega).select(
        (F.col("id") + 10_000_000).alias("doc_id"),
        F.concat(
            F.lit(template + " uniq"), F.col("id").cast("string")
        ).alias("text"),
    )
    # 600 control groups × 3 members: group g owns 30 tokens nobody
    # else uses; members differ by one unique token (J ≈ 30/32 = 0.94).
    n_groups = 600
    group_vocab = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(0), F.lit(29)),
            lambda j: F.concat(
                F.lit("g"),
                F.col("gid").cast("string"),
                F.lit("w"),
                j.cast("string"),
            ),
        ),
    )
    control = (
        spark.range(n_groups * 3)
        .select(
            (F.col("id") + 20_000_000).alias("doc_id"),
            (F.col("id") / 3).cast("long").alias("gid"),
            F.col("id").alias("member"),
        )
        .select(
            "doc_id",
            "gid",
            F.concat(
                group_vocab,
                F.lit(" m"),
                F.col("member").cast("string"),
            ).alias("text"),
        )
    )
    corpus = fixture.unionByName(mega).unionByName(
        control.select("doc_id", "text")
    )

    # Measured bucket-size distribution = the quadratic threat, exactly.
    sizes = (
        minhash_band_buckets(corpus)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("bn"))
        .select(
            F.sum(
                F.when(
                    F.col("bn") > _MAX_BUCKET,
                    F.col("bn") * (F.col("bn") - 1) / 2,
                ).otherwise(0)
            ).alias("dropped_pairs"),
            F.sum(
                F.when(
                    F.col("bn") <= _MAX_BUCKET,
                    F.col("bn") * (F.col("bn") - 1) / 2,
                ).otherwise(0)
            ).alias("kept_pairs_ub"),
        )
        .collect()[0]
    )
    dropped, kept_ub = sizes["dropped_pairs"], sizes["kept_pairs_ub"]
    with capsys.disabled():
        print(
            f"\n[adversarial-probe] {n_fixture + n_mega} docs: cap drops "
            f"{dropped / 1e6:.1f}M would-be pairs, keeps ≤ "
            f"{kept_ub / 1e3:.0f}k (cap={_MAX_BUCKET})"
        )
    # (a) the plant is genuinely adversarial: uncapped, the verify join
    # would see >20M pairs from the mega buckets alone (~8 bands ×
    # ~4.3k-doc dominant buckets ≈ 70M).
    assert dropped > 20_000_000
    # (b) capped, the candidate set is bounded-per-doc (sub-quadratic):
    # the small-bucket pair upper bound stays under ~22 pairs/doc.
    assert kept_ub < 1_000_000, f"cap failed to bound candidates: {kept_ub}"

    # (c) recall on the rare-vocab control groups with the mega family
    # present: a group counts as recalled when all 3 members share one
    # representative.
    rep = dedup_verified_frame(corpus)
    merged_groups = (
        rep.join(control.select("doc_id", "gid"), "doc_id")
        .groupBy("gid")
        .agg(F.countDistinct("rep_id").alias("n_reps"))
    )
    found = merged_groups.count()
    n_merged = merged_groups.filter(F.col("n_reps") == 1).count()
    recall = n_merged / n_groups
    with capsys.disabled():
        print(
            f"[adversarial-probe] control-group recall with mega family: "
            f"{n_merged}/{n_groups} = {recall:.3f}"
        )
    assert found == n_groups
    assert recall >= 0.95, (
        f"mega-template plant degraded normal-group recall: {recall:.3f}"
    )
