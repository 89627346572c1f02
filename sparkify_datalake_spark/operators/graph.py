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

from sparkify_datalake_spark.operators.text import _propagate_min_labels
from sparkify_datalake_spark.registry import query
from sparkify_datalake_spark.sources.load import load


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
