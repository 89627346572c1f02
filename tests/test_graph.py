"""Connected-components API tests: edge-list and bucket-membership
variants cross-checked against a pure-Python union-find."""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkify_datalake_spark.operators.graph import (
    connected_components_from_buckets,
    connected_components_from_edges,
    graph_user_components,
)
from sparkify_datalake_spark.sources.load import load


class _UF:
    def __init__(self):
        self.p = {}

    def find(self, x):
        self.p.setdefault(x, x)
        while self.p[x] != x:
            self.p[x] = self.p[self.p[x]]
            x = self.p[x]
        return x

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.p[max(ra, rb)] = min(ra, rb)


def _canonical(uf, nodes):
    return {n: uf.find(n) for n in nodes}


def test_components_from_edges_matches_union_find(spark):
    edges = [(1, 2), (2, 3), (10, 11), (20, 20), (3, 4), (11, 12)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: r["component"]
        for r in connected_components_from_edges(df).collect()
    }
    uf = _UF()
    for a, b in edges:
        uf.union(a, b)
    want = _canonical(uf, {x for e in edges for x in e})
    assert got == want
    assert got[4] == 1 and got[12] == 10 and got[20] == 20


def test_user_components_match_union_find(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    memberships = (
        ev.select(
            F.col("user_id").alias("node"),
            F.concat_ws(
                "#", "event_type", F.date_trunc("hour", "ts").cast("string")
            ).alias("bucket"),
        )
        .distinct()
        .collect()
    )
    uf = _UF()
    by_bucket: dict[str, list[int]] = {}
    for r in memberships:
        by_bucket.setdefault(r["bucket"], []).append(r["node"])
    for nodes in by_bucket.values():
        for other in nodes[1:]:
            uf.union(nodes[0], other)
    want = _canonical(uf, {r["node"] for r in memberships})
    got = {
        r["node"]: r["component"]
        for r in graph_user_components(spark, sf_dir).collect()
    }
    assert got == want
