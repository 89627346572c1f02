"""Graph operators: connected components as a public API (SURVEY §2
round-2 addendum).

The propagation engine behind dedup_near generalizes to any graph — this
module exposes it for arbitrary edge lists and node-bucket memberships
(entity resolution, identity stitching, cluster assignment), plus one
registered query over an events-derived co-presence graph.

Scale notes (100 TB): hash-to-min with pointer jumping is the standard
CC-on-Spark shape — per iteration two shuffles of (node, bucket, label)
triples and one small self-join of the label map; iterations are
O(log diameter) and the map is checkpointed between rounds. No GraphX
(RDD-based, no Python API) and no driver-side graph: everything stays a
DataFrame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkify_datalake_spark.registry import query
from sparkify_datalake_spark.sources.load import load


_PROP_MAX_ITERS = 20


def _propagate_min_labels(
    buckets: DataFrame, fixed_iters: int | None = None
) -> DataFrame:
    """Hash-to-min label propagation over a (doc_id, bucket) graph.

    Iterates bucket-min → doc-min passes until the rep map stops
    changing (cheap isEmpty on the changed-rows join of two
    checkpointed maps), capped at _PROP_MAX_ITERS. Reps only decrease,
    so "no row changed" is exact convergence. Each converging iteration
    also pointer-jumps (rep ← rep(rep) — reps are doc_ids, so the map
    composes with itself): min labels travel one graph hop per
    bucket-pass but chain depth HALVES per jump, so convergence is
    O(log diameter) instead of O(diameter) — measured 9 → 5 iterations
    on the sf0.1 verified-dedup graph. Each iteration localCheckpoints
    the new map — at cluster scale that is persist/checkpoint between
    iterations, standard for iterative graph algorithms; a fixed
    iteration count (the old behavior, kept as fixed_iters for tests,
    without jumping) under-converges on deep cluster chains.
    """
    doc_rep = (
        buckets.groupBy("doc_id")
        .agg(F.min("doc_id").alias("rep"))
        .localCheckpoint()
    )
    for _ in range(fixed_iters if fixed_iters is not None else _PROP_MAX_ITERS):
        bucket_rep = (
            buckets.join(doc_rep, "doc_id")
            .groupBy("bucket")
            .agg(F.min("rep").alias("brep"))
        )
        half = (
            buckets.join(bucket_rep, "bucket")
            .groupBy("doc_id")
            .agg(F.min("brep").alias("rep"))
        )
        if fixed_iters is None:
            lookup = half.select(
                F.col("doc_id").alias("rep"), F.col("rep").alias("rep2")
            )
            half = half.join(lookup, "rep", "left").select(
                "doc_id", F.coalesce("rep2", "rep").alias("rep")
            )
        # The changed-flag rides inside the frame and the checkpoint is
        # LAZY: the convergence count below is the action that both
        # materializes the checkpoint and counts changed rows — ONE
        # scheduled job per iteration instead of the former two (eager
        # checkpoint job + isEmpty probe job). Per-iteration lineage
        # truncation itself is non-negotiable here: the pointer-jump
        # self-join doubles the plan each pass without it.
        new_rep = (
            half.join(doc_rep.withColumnRenamed("rep", "prev"), "doc_id")
            .select(
                "doc_id", "rep", (F.col("rep") != F.col("prev")).alias("chg")
            )
            .localCheckpoint(eager=False)
        )
        if fixed_iters is None:
            n_changed = new_rep.where("chg").count()
            doc_rep = new_rep.select("doc_id", "rep")
            if n_changed == 0:
                break
        else:
            doc_rep = new_rep.select("doc_id", "rep")
    return doc_rep


def connected_components_from_edges(edges: DataFrame) -> DataFrame:
    """Connected components of an undirected edge list.

    edges: DataFrame with long columns (src, dst). Returns (node,
    component) where component is the minimum node id in the component.
    Isolated self-loops are fine; nodes absent from edges are absent
    from the output (union self-edges first if every node must appear).
    """
    eid = F.concat_ws("#", "src", "dst")
    bipartite = (
        edges.select(F.col("src").alias("doc_id"), eid.alias("bucket"))
        .union(edges.select(F.col("dst").alias("doc_id"), eid.alias("bucket")))
        .localCheckpoint()
    )
    rep = _propagate_min_labels(bipartite)
    return rep.select(
        F.col("doc_id").alias("node"), F.col("rep").alias("component")
    )


def connected_components_from_buckets(memberships: DataFrame) -> DataFrame:
    """Components of a node-bucket bipartite graph: nodes sharing any
    bucket are connected (the LSH-bucket / shared-attribute shape —
    skips pair materialization entirely, so a hot bucket costs O(size),
    not O(size²))."""
    rep = _propagate_min_labels(
        memberships.select(
            F.col("node").alias("doc_id"), "bucket"
        ).localCheckpoint()
    )
    return rep.select(
        F.col("doc_id").alias("node"), F.col("rep").alias("component")
    )


@query("graph_user_components")
def graph_user_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Identity-stitching demo: users co-present in the same
    (event_type, hour) bucket belong to one component.

    The entity-resolution shape: shared attributes (device id, email
    hash, session cookie — here the co-presence bucket) connect
    records; components are the resolved entities. Bucket membership
    feeds propagation directly — hot buckets never materialize pairs.
    Rows-only (iterative); pytest cross-checks against a pure-Python
    union-find on the same memberships.
    """
    ev = load(spark, sf_dir, "events")
    memberships = ev.select(
        F.col("user_id").alias("node"),
        F.concat_ws(
            "#", "event_type", F.date_trunc("hour", "ts").cast("string")
        ).alias("bucket"),
    ).distinct()
    return connected_components_from_buckets(memberships)
