"""Dominance-definition twin for mine_skyline_orders.

The registered query (and its oracle) computes the 2-D skyline with the
single-pass sorted-running-max formulation; this test pins that
formulation to the textbook dominance DEFINITION — a brute-force
NOT-EXISTS over every pair — on the sf0.001 fixture, where the
quadratic check is affordable. If the two ever disagree, the fast
formulation (not the definition) is wrong.
"""

from __future__ import annotations

import duckdb

SF_DIR = "/root/testdata/sf0.001"

_BRUTE = f"""
WITH o AS (
  SELECT o_totalprice AS p, CAST(o_orderdate AS DATE) AS d
  FROM read_parquet('{SF_DIR}/orders.parquet')
),
pts AS (SELECT DISTINCT p, d FROM o),
sky AS (
  SELECT p, d FROM pts a
  WHERE NOT EXISTS (
    SELECT 1 FROM pts b
    WHERE b.p <= a.p AND b.d >= a.d AND (b.p < a.p OR b.d > a.d)
  )
)
SELECT s.p, s.d, count(*) AS n
FROM sky s JOIN o ON o.p = s.p AND o.d = s.d
GROUP BY 1, 2
"""


def test_skyline_matches_bruteforce_dominance(spark):
    from sparkify_datalake_spark.registry import queries

    fast = {
        (r["o_totalprice"], r["skyline_date"], r["n_orders"])
        for r in queries()["mine_skyline_orders"](spark, SF_DIR).collect()
    }
    brute = {
        (p, d, n) for p, d, n in duckdb.connect().execute(_BRUTE).fetchall()
    }
    assert fast == brute
    assert len(fast) > 0
