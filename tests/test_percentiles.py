"""Unit rigor for the sketch-bracketed exact percentile engine
(operators/percentiles.py).

The five registry queries built on it are hash-checked against DuckDB
at the driver's sf0.01; these tests pin the helper itself on adversarial
shapes the TPC-H-ish tables never produce: heavy ties, single-row
groups, extreme p (0 and 1, where the band widens to ±inf because the
sketch endpoint is not guaranteed to be the true min/max), multi-column
sharing, a group whose second column is all-null, and the global
(no-group) form. The reference is numpy's linear interpolation — the
same ``v_lo + (v_hi − v_lo)·frac`` arithmetic as DuckDB quantile_cont.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from sparkify_datalake_spark.operators.percentiles import (
    exact_percentiles,
    exact_percentiles_multi,
)


def _np_quantile_cont(vals, p):
    a = np.asarray(sorted(vals), dtype="float64")
    pos = (len(a) - 1) * p
    lo, hi = math.floor(pos), math.ceil(pos)
    return a[lo] + (a[hi] - a[lo]) * (pos - lo)


@pytest.fixture(scope="module")
def messy(spark):
    rows = []
    rng = np.random.RandomState(7)
    # group a: 1000 continuous values; group b: heavy ties (only 3
    # distinct values); group c: a single row; group d: two rows.
    for v in rng.uniform(-50.0, 150.0, 1000):
        rows.append(("a", float(v)))
    for v in rng.choice([1.0, 2.0, 7.5], 500):
        rows.append(("b", float(v)))
    rows.append(("c", 42.0))
    rows += [("d", 10.0), ("d", 20.0)]
    return spark.createDataFrame(rows, "g string, v double"), {
        g: [v for gg, v in rows if gg == g] for g in "abcd"
    }


def test_matches_numpy_interpolation(messy):
    df, by_group = messy
    specs = [(0.25, "q25"), (0.5, "q50"), (0.9, "q90")]
    got = {
        r["g"]: r for r in exact_percentiles(df, ["g"], "v", specs).collect()
    }
    assert set(got) == set("abcd")
    for g, vals in by_group.items():
        for p, name in specs:
            assert got[g][name] == pytest.approx(
                _np_quantile_cont(vals, p), abs=1e-12
            ), (g, name)


def test_extreme_p_is_exact_min_max(messy):
    df, by_group = messy
    got = {
        r["g"]: r
        for r in exact_percentiles(
            df, ["g"], "v", [(0.0, "lo"), (1.0, "hi")]
        ).collect()
    }
    for g, vals in by_group.items():
        assert got[g]["lo"] == pytest.approx(min(vals), abs=0.0)
        assert got[g]["hi"] == pytest.approx(max(vals), abs=0.0)


def test_single_row_group_returns_value(messy):
    df, _ = messy
    got = {
        r["g"]: r
        for r in exact_percentiles(df, ["g"], "v", [(0.37, "x")]).collect()
    }
    assert got["c"]["x"] == 42.0
    # two-row group: interpolation between the two values
    assert got["d"]["x"] == pytest.approx(10.0 + 10.0 * 0.37, abs=1e-12)


def test_global_no_group(messy):
    df, by_group = messy
    all_vals = [v for vs in by_group.values() for v in vs]
    row = exact_percentiles(df, [], "v", [(0.5, "med")]).collect()
    assert len(row) == 1
    assert row[0]["med"] == pytest.approx(
        _np_quantile_cont(all_vals, 0.5), abs=1e-12
    )
    assert row[0].asDict().keys() == {"med"}


def test_multi_column_shared_scan_and_all_null_column(spark):
    rows = [("x", float(i), float(100 - i)) for i in range(100)]
    rows += [("y", float(i), None) for i in range(50)]
    df = spark.createDataFrame(rows, "g string, u double, w double")
    out = {
        r["g"]: r
        for r in exact_percentiles_multi(
            df,
            ["g"],
            [
                ("u", [(0.5, "u_med")]),
                ("w", [(0.25, "w_q1")]),
            ],
        ).collect()
    }
    assert out["x"]["u_med"] == pytest.approx(49.5)
    assert out["x"]["w_q1"] == pytest.approx(
        _np_quantile_cont([100.0 - i for i in range(100)], 0.25)
    )
    assert out["y"]["u_med"] == pytest.approx(24.5)
    assert out["y"]["w_q1"] is None  # all-null column in that group


def test_nulls_ignored_and_empty_groups_absent(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", None), ("a", 3.0), ("b", None)],
        "g string, v double",
    )
    got = exact_percentiles(df, ["g"], "v", [(0.5, "m")]).collect()
    assert {r["g"]: r["m"] for r in got} == {"a": 2.0}
