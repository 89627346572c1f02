"""Determinism guard for rows-only queries (SURVEY §7.2).

Hash-checked queries get engine-vs-engine equality for free; the
rows-only class (sketches, ANN, iterative propagation, stubbed media)
has no oracle, so its weakest property is run-to-run stability — an
operator that returns different rows on re-execution can't be trusted
at all. Every rows-only query must produce IDENTICAL row multisets on
two executions in one session (fresh DataFrames both times: this
re-runs the full plan, it does not hit a cache).
"""

from __future__ import annotations

import pytest

from sparkify_datalake_spark.registry import oracle_sql, queries


def _rows_only_names():
    qs = queries()
    return sorted(set(qs) - set(oracle_sql()))


def _collect_sorted(spark, name, sf_dir):
    df = queries()[name](spark, sf_dir)
    return sorted(tuple(str(x) for x in row) for row in df.collect())


@pytest.mark.parametrize("name", _rows_only_names())
def test_rows_only_query_is_rerun_stable(spark, sf_dir, name):
    first = _collect_sorted(spark, name, sf_dir)
    second = _collect_sorted(spark, name, sf_dir)
    assert first == second, (
        f"{name} is not deterministic across reruns "
        f"({len(first)} vs {len(second)} rows; first diff: "
        f"{next((a, b) for a, b in zip(first, second) if a != b) if len(first) == len(second) else 'row-count'})"
    )
    assert len(first) > 0, f"{name} returned no rows"
