"""Local DuckDB-oracle mirror over every registered hash query (SURVEY §5.2).

Runs at sf0.001 by default (fast); set SPARK_GRAFT_TEST_SF_DIR to
/root/testdata/sf0.01 for the pre-submit pass. Also smoke-runs the
rows-only queries (no oracle) to assert they execute and return rows.
"""

from __future__ import annotations

import pytest

from sparkify_datalake_spark.registry import oracle_sql, queries
from tests.conftest import SF_DIR
from tests.oracle_utils import compare, duck_connect

ALL_QUERIES = queries()
ALL_ORACLES = oracle_sql()
HASH_NAMES = sorted(ALL_ORACLES)
ROWS_ONLY_NAMES = sorted(set(ALL_QUERIES) - set(ALL_ORACLES))


@pytest.fixture(scope="module")
def duck():
    con = duck_connect(SF_DIR)
    yield con
    con.close()


@pytest.mark.parametrize("name", HASH_NAMES)
def test_hash_query_matches_oracle(spark, duck, sf_dir, name):
    errors = compare(
        spark, duck, ALL_QUERIES[name], ALL_ORACLES[name], sf_dir, name
    )
    assert not errors, f"{name}: " + " | ".join(errors)


@pytest.mark.parametrize("name", ROWS_ONLY_NAMES)
def test_rows_only_query_runs(spark, sf_dir, name):
    df = ALL_QUERIES[name](spark, sf_dir)
    assert len(df.columns) > 0
    assert df.count() >= 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    rows = e.entry(spark).collect()
    assert len(rows) > 0


def test_sim_ivf_topk_recall_vs_brute_force(spark, sf_dir):
    """IVF-probed ANN must recover most of the exact top-10 (deterministic
    on the fixtures: fixed init, fixed iterations, float64 math)."""
    from sparkify_datalake_spark.registry import queries

    qs = queries()
    ivf = [r["vec_id"] for r in qs["sim_ivf_topk"](spark, sf_dir).collect()]
    brute = [
        r["vec_id"] for r in qs["sim_cosine_topk"](spark, sf_dir).collect()
    ]
    assert len(ivf) == 10
    assert len(set(ivf) & set(brute)) >= 7


def test_sim_pq_topk_recall_vs_brute_force(spark, sf_dir):
    """PQ+ADC with exact re-rank must recover most of the exact top-10
    (deterministic: fixed sample init, fixed iterations, float64)."""
    from sparkify_datalake_spark.registry import queries

    qs = queries()
    pq = [r["vec_id"] for r in qs["sim_pq_topk"](spark, sf_dir).collect()]
    brute = [
        r["vec_id"] for r in qs["sim_cosine_topk"](spark, sf_dir).collect()
    ]
    assert len(pq) == 10
    assert len(set(pq) & set(brute)) >= 7


def test_sim_ivf_pq_topk_recall_vs_brute_force(spark, sf_dir):
    """Composed IVF+PQ (partition-pruned ADC + exact re-rank) must
    recover most of the exact top-10 — bounded like the standalone
    tiers; misses can only come from IVF's nprobe pruning, since the
    retuned PQ sketch re-ranks at recall 1.0 (ANN_CURVES_x64.json)."""
    from sparkify_datalake_spark.registry import queries

    qs = queries()
    ann = [
        r["vec_id"] for r in qs["sim_ivf_pq_topk"](spark, sf_dir).collect()
    ]
    brute = [
        r["vec_id"] for r in qs["sim_cosine_topk"](spark, sf_dir).collect()
    ]
    assert len(ann) == 10
    assert len(set(ann) & set(brute)) >= 7
