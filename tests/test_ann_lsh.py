"""Banded ANN-LSH index contract (operators/similarity.py ann_lsh_*).

The driver fixture's embeddings are near-isotropic (its global top-10
cosines sit barely above the background distribution), so recall there
is a property of the data, not the index. These tests measure the
index's real contract on a PLANTED corpus — a seed-pinned Gaussian
cloud with genuine near-duplicates (cos ≈ 0.95) of the probe vector,
the structure real embedding corpora have:

- recall: the planted neighbors dominate the exact top-k and the index
  must recover ≥ 80% of them;
- selectivity: the candidate set must stay ≪ 10% of the corpus;
- invariance: banding parameters change WHICH candidates, never the
  exactness of the re-rank (scores match brute force on the overlap).
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from sparkify_datalake_spark.operators.similarity import (
    ann_lsh_candidates,
    ann_lsh_topk,
)

N_VECS = 4000
N_PLANTED = 12
DIM = 64
SEED = 20260814


@pytest.fixture(scope="module")
def planted(spark):
    """Seed-pinned corpus: N_VECS random vectors + N_PLANTED near-dups
    of vec 0 (target + 15% noise → cos ≈ 0.95)."""
    rng = np.random.default_rng(SEED)
    base = rng.standard_normal((N_VECS, DIM))
    target = base[0]
    noise = rng.standard_normal((N_PLANTED, DIM)) * 0.15
    planted_rows = target / np.linalg.norm(target) + noise / np.sqrt(DIM)
    x = np.vstack([base, planted_rows])
    ids = np.arange(len(x))
    df = spark.createDataFrame(
        [(int(i), [float(v) for v in row]) for i, row in zip(ids, x)],
        "vec_id long, embedding array<double>",
    ).repartition(8)
    df.persist()
    df.count()
    yield df
    df.unpersist()


def _brute_topk(df, k):
    t = df.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("t")
    )
    from sparkify_datalake_spark.operators.similarity import _dot, _norm

    cos = _dot("embedding", "t") / (_norm("embedding") * _norm("t"))
    return (
        df.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(t))
        .select("vec_id", F.round(cos, 6).alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
        .limit(k)
    )


def test_planted_neighbors_dominate_exact_topk(planted):
    """Sanity on the fixture itself: the exact top-N_PLANTED are
    (mostly) the planted near-duplicates, with cos well above noise."""
    top = _brute_topk(planted, N_PLANTED).collect()
    planted_ids = set(range(N_VECS, N_VECS + N_PLANTED))
    hits = sum(1 for r in top if r["vec_id"] in planted_ids)
    assert hits >= N_PLANTED - 1, f"fixture broken: {hits}/{N_PLANTED}"
    assert min(r["cos_sim"] for r in top[:hits]) > 0.8


def test_recall_at_least_80pct(planted):
    brute = {r["vec_id"] for r in _brute_topk(planted, 10).collect()}
    ann = {
        r["vec_id"]
        for r in ann_lsh_topk(planted, target_id=0, k=10).collect()
    }
    recall = len(ann & brute) / len(brute)
    assert recall >= 0.8, f"recall {recall:.2f} < 0.8"


def test_candidate_fraction_well_under_10pct(planted):
    n_cand = ann_lsh_candidates(planted, target_id=0).count()
    frac = n_cand / (N_VECS + N_PLANTED)
    assert frac < 0.10, f"candidate fraction {frac:.3f} ≥ 10%"
    # and the bound is not vacuous — the probe does see candidates
    assert n_cand >= N_PLANTED


def test_multi_probe_widens_candidates_monotonically(planted):
    base = ann_lsh_candidates(planted, target_id=0).count()
    probed = ann_lsh_candidates(
        planted, target_id=0, multi_probe_bits=1
    ).count()
    assert probed >= base


def test_rerank_scores_exact_on_overlap(planted):
    """The index changes WHICH rows are scored, never their score:
    cos_sim for any candidate equals the brute-force value."""
    brute = {
        r["vec_id"]: r["cos_sim"]
        for r in _brute_topk(planted, 50).collect()
    }
    ann = ann_lsh_topk(planted, target_id=0, k=10).collect()
    for r in ann:
        if r["vec_id"] in brute:
            assert r["cos_sim"] == brute[r["vec_id"]]
