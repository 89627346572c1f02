"""Convergence of the hash-to-min label propagation behind dedup_near.

The hand-built corpus is a bucket chain doc0–doc1–…–doc9 (each bucket
links two consecutive docs): single-linkage says everything is one
cluster with rep 0, but min labels travel only one link per iteration,
so any small fixed iteration count under-converges — exactly the 100 TB
failure mode the convergence check exists for.
"""

from __future__ import annotations

from sparkify_datalake_spark.operators.text import _propagate_min_labels


def _chain_buckets(spark, n_docs: int):
    rows = []
    for i in range(n_docs - 1):
        rows.append((i, i * 1000))
        rows.append((i + 1, i * 1000))
    return spark.createDataFrame(rows, "doc_id long, bucket long")


def test_propagation_converges_on_deep_chain(spark):
    buckets = _chain_buckets(spark, 10)
    reps = {r["doc_id"]: r["rep"] for r in _propagate_min_labels(buckets).collect()}
    assert len(reps) == 10
    assert set(reps.values()) == {0}


def test_fixed_three_iterations_under_converge(spark):
    """The pre-convergence behavior (3 fixed passes) gets this wrong —
    proving the chain corpus actually discriminates."""
    buckets = _chain_buckets(spark, 10)
    fixed = {
        r["doc_id"]: r["rep"]
        for r in _propagate_min_labels(buckets, fixed_iters=3).collect()
    }
    assert set(fixed.values()) != {0}


def test_propagation_keeps_disjoint_clusters_apart(spark):
    """Two disjoint chains must not merge: reps are per-component minima."""
    left = _chain_buckets(spark, 4)
    right = [(i, 7_000_000 + i * 1000) for i in range(100, 104)] + [
        (i + 1, 7_000_000 + i * 1000) for i in range(100, 103)
    ]
    buckets = left.union(
        left.sparkSession.createDataFrame(right, "doc_id long, bucket long")
    )
    reps = {r["doc_id"]: r["rep"] for r in _propagate_min_labels(buckets).collect()}
    assert all(reps[i] == 0 for i in range(4))
    assert all(reps[i] == 100 for i in range(100, 104))


def test_dedup_near_verified_refines_lsh_clusters(spark, sf_dir):
    """Verified edges are a subset of LSH-bucket edges, so the verified
    clustering must refine dedup_near's (never merge across its
    clusters), and converged reps must be per-component minima."""
    from collections import defaultdict

    from sparkify_datalake_spark.registry import queries

    qs = queries()
    ver = {
        r["doc_id"]: r["rep_id"]
        for r in qs["dedup_near_verified"](spark, sf_dir).collect()
    }
    lsh = {
        r["doc_id"]: r["rep_id"]
        for r in qs["dedup_near"](spark, sf_dir).collect()
    }
    assert set(ver) == set(lsh)
    assert all(rep <= d for d, rep in ver.items())
    assert all(ver[rep] == rep for rep in ver.values())  # reps are fixpoints
    groups = defaultdict(list)
    for d, rep in ver.items():
        groups[rep].append(d)
    for ds in groups.values():
        assert len({lsh[d] for d in ds}) == 1, "verified merged across LSH clusters"
