"""embed_pca (operators/similarity.py): the distributed Gram-matrix
PCA must agree with direct in-memory NumPy PCA, and the spectrum must
satisfy its invariants."""

from __future__ import annotations

import numpy as np
import pytest

from sparkify_datalake_spark.registry import queries
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def spectrum(spark):
    rows = queries()["embed_pca"](spark, SF_DIR).collect()
    return [(r["component"], r["explained_var"]) for r in rows]


def test_matches_direct_numpy_pca(spark, spectrum):
    import duckdb

    raw = duckdb.sql(
        f"SELECT embedding FROM read_parquet('{SF_DIR}/embeddings.parquet')"
    ).fetchall()
    x = np.stack([np.array(r[0], dtype=np.float64) for r in raw])
    xc = x - x.mean(axis=0)
    cov = (xc.T @ xc) / (len(x) - 1)
    evals = np.linalg.eigvalsh(cov)[::-1]
    ratios = evals / evals.sum()
    for k, got in spectrum:
        assert got == pytest.approx(float(ratios[k]), abs=2e-6), k


def test_spectrum_invariants(spectrum):
    vals = [v for _, v in spectrum]
    assert len(vals) == 8
    assert all(0.0 <= v <= 1.0 for v in vals)
    assert vals == sorted(vals, reverse=True)
    assert sum(vals) <= 1.0 + 1e-9
