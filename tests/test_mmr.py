"""MMR rerank twin: the applyInPandas greedy kernel must agree with a
pure-Python recomputation on the same pool, and actually diversify
(mean pairwise similarity of the MMR set below the plain top-k's)."""

from __future__ import annotations

import duckdb
import numpy as np
import pytest

from sparkify_datalake_spark.registry import queries


def _pool(sf_dir, n=50):
    con = duckdb.connect()
    rows = con.execute(
        f"""
        WITH t AS (SELECT embedding FROM
                   read_parquet('{sf_dir}/embeddings.parquet')
                   WHERE vec_id = 0)
        SELECT e.vec_id, e.embedding,
          round(list_sum(list_transform(range(1, 65),
                i -> CAST(e.embedding[i] AS DOUBLE)
                     * CAST(t.embedding[i] AS DOUBLE)))
            / (sqrt(list_sum(list_transform(e.embedding,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
               * sqrt(list_sum(list_transform(t.embedding,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 6)
            AS rel
        FROM read_parquet('{sf_dir}/embeddings.parquet') e, t
        WHERE e.vec_id <> 0
        ORDER BY rel DESC, e.vec_id LIMIT {n}
        """
    ).fetchall()
    con.close()
    return rows


def _mmr_python(rows, lam=0.7, k=10):
    ids = [r[0] for r in rows]
    vecs = np.asarray([np.asarray(r[1], dtype=np.float64) for r in rows])
    rels = [r[2] for r in rows]
    norms = np.sqrt((vecs * vecs).sum(axis=1))
    sims = np.round((vecs @ vecs.T) / np.outer(norms, norms), 6)
    selected, out = [], []
    for step in range(min(k, len(rows))):
        best, best_score, best_maxsim = None, None, None
        for i in range(len(rows)):
            if i in selected:
                continue
            maxsim = max((sims[i][j] for j in selected), default=0.0)
            score = round(lam * rels[i] - (1 - lam) * maxsim, 6)
            if best is None or score > best_score:
                best, best_score, best_maxsim = i, score, maxsim
        selected.append(best)
        out.append((step + 1, ids[best], rels[best], best_maxsim,
                    best_score))
    return out


def test_mmr_matches_python_twin(spark, sf_dir):
    got = sorted(
        (
            (r["rank"], r["vec_id"], r["relevance"],
             r["max_sim_to_prior"], r["mmr_score"])
            for r in queries()["sim_mmr_rerank"](spark, sf_dir).collect()
        )
    )
    want = sorted(_mmr_python(_pool(sf_dir)))
    assert len(got) == 10
    for g, w in zip(got, want):
        assert g[0] == w[0] and g[1] == w[1]
        for a, b in zip(g[2:], w[2:]):
            assert a == pytest.approx(b, abs=1e-6)


def test_mmr_diversifies_vs_plain_topk(spark, sf_dir):
    rows = _pool(sf_dir)
    mmr_ids = [r[1] for r in _mmr_python(rows)]
    plain_ids = [r[0] for r in rows[:10]]
    by_id = {r[0]: np.asarray(r[1], dtype=np.float64) for r in rows}

    def mean_pairwise(ids):
        sims = []
        for i, a in enumerate(ids):
            for b in ids[i + 1:]:
                va, vb = by_id[a], by_id[b]
                sims.append(
                    float(va @ vb)
                    / (np.linalg.norm(va) * np.linalg.norm(vb))
                )
        return sum(sims) / len(sims)

    assert mean_pairwise(mmr_ids) < mean_pairwise(plain_ids), (
        "MMR must reduce redundancy vs plain top-k"
    )
