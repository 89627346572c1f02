"""Semantic cross-checks for text/growth operators whose oracle is
weaker than hash (text_compression_ratio is rows-only — DuckDB has no
zlib) or whose hash check can't see an internal identity
(events_growth_accounting's ledger must balance against DAU).
"""

from __future__ import annotations

import zlib

import duckdb
import pytest

from sparkify_datalake_spark.registry import queries


def test_compression_ratio_matches_plain_python(spark, sf_dir):
    """The mapInPandas kernel must agree with a trivial driver-side
    zlib recomputation: same level-6 zlib, same per-source averages.
    """
    got = {
        r["source"]: r
        for r in queries()["text_compression_ratio"](spark, sf_dir)
        .collect()
    }
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT source, text FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    con.close()
    per = {}
    for source, text in docs:
        raw = (text or "").encode("utf-8")
        ratio = len(zlib.compress(raw, 6)) / max(len(raw), 1)
        per.setdefault(source, []).append(ratio)
    assert set(per) == set(got)
    for source, ratios in per.items():
        row = got[source]
        assert row["n_docs"] == len(ratios)
        assert row["avg_ratio"] == pytest.approx(
            sum(ratios) / len(ratios), abs=1e-6
        )
        assert row["min_ratio"] == pytest.approx(min(ratios), abs=1e-6)
        assert row["max_ratio"] == pytest.approx(max(ratios), abs=1e-6)
        assert row["n_template_suspect"] == sum(
            1 for r in ratios if r < 0.4
        )


def test_growth_accounting_ledger_balances_against_dau(spark, sf_dir):
    """DAU(d) − DAU(d−1) must equal net_change(d) for every interior
    day: retained(d) + churned(d) partitions yesterday's actives, and
    new + retained + resurrected partitions today's. A misattributed
    churn day or a censoring bug breaks the ledger even when both
    engines agree on the (shared) arithmetic.
    """
    rows = sorted(
        queries()["events_growth_accounting"](spark, sf_dir).collect(),
        key=lambda r: r["d"],
    )
    con = duckdb.connect()
    dau = dict(
        con.execute(
            f"""SELECT CAST(ts AS DATE) AS d, count(DISTINCT user_id)
            FROM '{sf_dir}/events.parquet' GROUP BY 1"""
        ).fetchall()
    )
    con.close()
    for r in rows:
        assert (
            r["n_new"] + r["n_retained"] + r["n_resurrected"]
            == dau[r["d"]]
        ), f"DAU partition broken on {r['d']}"
    for prev, cur in zip(rows, rows[1:]):
        assert cur["net_change"] == dau[cur["d"]] - dau[prev["d"]], (
            f"ledger identity broken on {cur['d']}"
        )


def test_payload_entropy_matches_plain_python(spark, sf_dir):
    """The byte-entropy kernel must agree with a trivial driver-side
    recomputation over the same UTF-8 payloads."""
    import math

    got = {
        r["source"]: r
        for r in queries()["mm_payload_entropy"](spark, sf_dir).collect()
    }
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT source, text FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    con.close()
    per = {}
    for source, text in docs:
        raw = (text or "").encode("utf-8")
        if not raw:
            per.setdefault(source, []).append(0.0)
            continue
        freq = {}
        for b in raw:
            freq[b] = freq.get(b, 0) + 1
        ent = -sum(
            (c / len(raw)) * math.log2(c / len(raw))
            for c in freq.values()
        )
        per.setdefault(source, []).append(ent)
    assert set(per) == set(got)
    for source, ents in per.items():
        row = got[source]
        assert row["n_docs"] == len(ents)
        assert row["avg_entropy"] == pytest.approx(
            sum(ents) / len(ents), abs=1e-6
        )
        assert row["min_entropy"] == pytest.approx(min(ents), abs=1e-6)
        assert row["max_entropy"] == pytest.approx(max(ents), abs=1e-6)
