"""Holt forecast twin: the applyInPandas kernel must agree with a plain
Python recomputation of the recursion, and beat (or at worst match) the
naive random-walk one-step baseline in-sample — a forecast whose MAE
loses to 'predict yesterday' is mis-implemented.
"""

from __future__ import annotations

import datetime

import duckdb
import pytest

from sparkify_datalake_spark.registry import queries


def _holt(ys, alpha=0.5, beta=0.3, horizon=7):
    level, trend = ys[0], ys[1] - ys[0]
    abs_err = 0.0
    for y in ys[1:]:
        abs_err += abs(y - (level + trend))
        new_level = alpha * y + (1 - alpha) * (level + trend)
        trend = beta * (new_level - level) + (1 - beta) * trend
        level = new_level
    fc = [level + h * trend for h in range(1, horizon + 1)]
    return fc, abs_err / (len(ys) - 1)


def test_holt_forecast_matches_python_twin(spark, sf_dir):
    rows = queries()["ts_forecast_holt"](spark, sf_dir).collect()
    con = duckdb.connect()
    series = {}
    for et, y in con.execute(
        f"""SELECT event_type, count(*) FROM '{sf_dir}/events.parquet'
        GROUP BY event_type, CAST(ts AS DATE)
        ORDER BY event_type, CAST(ts AS DATE)"""
    ).fetchall():
        series.setdefault(et, []).append(float(y))
    naive_mae = {
        et: sum(
            abs(b - a) for a, b in zip(ys, ys[1:])
        ) / (len(ys) - 1)
        for et, ys in series.items()
    }
    con.close()
    by_type = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    assert set(by_type) == set(series)
    for et, got in by_type.items():
        fc, mae = _holt(series[et])
        got = sorted(got, key=lambda r: r["d"])
        assert len(got) == 7
        for r, want in zip(got, fc):
            assert r["forecast"] == pytest.approx(want, abs=1e-6)
        assert got[0]["fit_mae"] == pytest.approx(mae, abs=1e-6)
        # Holt tracks level+trend; random-walk tracks level only.
        assert got[0]["fit_mae"] <= naive_mae[et] * 1.10, (
            f"{et}: Holt MAE {got[0]['fit_mae']} vs naive "
            f"{naive_mae[et]} — smoother is mis-implemented"
        )


def _holt_winters(ys, alpha=0.5, beta=0.3, gamma=0.3, m=7, horizon=7):
    mean1 = sum(ys[:m]) / m
    mean2 = sum(ys[m : 2 * m]) / m
    level, trend = mean1, (mean2 - mean1) / m
    season = [ys[i] - mean1 for i in range(m)]
    abs_err, n_err = 0.0, 0
    for t in range(m, len(ys)):
        abs_err += abs(ys[t] - (level + trend + season[t % m]))
        n_err += 1
        new_level = alpha * (ys[t] - season[t % m]) + (1 - alpha) * (
            level + trend
        )
        trend = beta * (new_level - level) + (1 - beta) * trend
        season[t % m] = gamma * (ys[t] - new_level) + (1 - gamma) * season[
            t % m
        ]
        level = new_level
    n = len(ys)
    fc = [
        level + h * trend + season[(n + h - 1) % m]
        for h in range(1, horizon + 1)
    ]
    return fc, abs_err / n_err


def test_holt_winters_matches_python_twin(spark, sf_dir):
    rows = queries()["ts_forecast_holt_winters"](spark, sf_dir).collect()
    con = duckdb.connect()
    raw = {}
    for et, d, y in con.execute(
        f"""SELECT event_type, CAST(ts AS DATE), count(*)
        FROM '{sf_dir}/events.parquet'
        GROUP BY event_type, CAST(ts AS DATE)
        ORDER BY event_type, CAST(ts AS DATE)"""
    ).fetchall():
        raw.setdefault(et, []).append((d, float(y)))
    con.close()
    # Mirror the kernel's dense-calendar reindex: zero-fill missing days
    # so positional t % m stays phase-locked to the calendar.
    series = {}
    for et, pairs in raw.items():
        by_day = dict(pairs)
        d0, d1 = pairs[0][0], pairs[-1][0]
        series[et] = [
            by_day.get(d0 + datetime.timedelta(days=i), 0.0)
            for i in range((d1 - d0).days + 1)
        ]
    by_type = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    assert set(by_type) == set(series)
    for et, got in by_type.items():
        ys = series[et]
        got = sorted(got, key=lambda r: r["d"])
        assert len(got) == 7
        if len(ys) < 14:
            assert all(r["fit_mae"] is None for r in got)
            continue
        fc, mae = _holt_winters(ys)
        for r, want in zip(got, fc):
            assert r["forecast"] == pytest.approx(want, abs=1e-6)
        assert got[0]["fit_mae"] == pytest.approx(mae, abs=1e-6)
        # one-step MAE must stay in the league of the cheap baselines
        # (random walk and seasonal-naive): a smoother losing BADLY to
        # both is mis-implemented. The fixture's daily counts carry no
        # real weekly signal (ts_stl_strength measures F_seasonal ~ 0
        # and would route AWAY from HW here), so HW pays variance for
        # the unused seasonal parameters: measured worst ratio across
        # types/SFs is 1.43 -- the bound pins "in the league", not
        # "wins on seasonality-free data".
        rw = sum(abs(b - a) for a, b in zip(ys, ys[1:])) / (len(ys) - 1)
        sn = sum(
            abs(ys[t] - ys[t - 7]) for t in range(7, len(ys))
        ) / (len(ys) - 7)
        assert got[0]["fit_mae"] <= min(rw, sn) * 1.6, (
            f"{et}: HW MAE {got[0]['fit_mae']} vs rw {rw} / snaive {sn}"
        )
