"""Local mirror of the driver's DuckDB-oracle comparison (SURVEY.md §3.3).

Compares a Spark query result against its DuckDB oracle SQL over the same
Parquet files: row count, sorted column names, and an order-insensitive
multiset of canonicalized rows (columns sorted by name — mirroring the
driver's sort-columns-then-hash scheme).
"""

from __future__ import annotations

import datetime
import math
from decimal import Decimal

import duckdb

from sparkify_datalake_spark.sources.load import TABLES


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def canon(v):
    """Canonical string for one value (both engines' Python types)."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            return "0"  # fold -0.0 into 0
        return repr(v)
    if isinstance(v, Decimal):
        return f"dec:{v.normalize()}"
    if isinstance(v, datetime.datetime):
        return "ts:" + v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return "d:" + v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{canon(x)}" for k, x in sorted(v.items())) + "}"
    if isinstance(v, bytes):
        return "b:" + v.hex()
    return f"{type(v).__name__}:{v}"


def normalize(rows: list[tuple], cols: list[str]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(canon(r[i]) for i in order) for r in rows)


def run_spark(spark, fn, sf_dir):
    df = fn(spark, sf_dir)
    cols = [c.lower() for c in df.columns]
    rows = [tuple(r) for r in df.collect()]
    return rows, cols


def run_duck(con, sql):
    cur = con.execute(sql)
    cols = [d[0].lower() for d in cur.description]
    rows = cur.fetchall()
    return rows, cols


def compare(spark, con, fn, sql, sf_dir, name="query"):
    s_rows, s_cols = run_spark(spark, fn, sf_dir)
    d_rows, d_cols = run_duck(con, sql)
    errors = []
    if sorted(s_cols) != sorted(d_cols):
        errors.append(f"columns differ: spark={sorted(s_cols)} duck={sorted(d_cols)}")
    if len(s_rows) != len(d_rows):
        errors.append(f"row counts differ: spark={len(s_rows)} duck={len(d_rows)}")
    if not errors:
        sn, dn = normalize(s_rows, s_cols), normalize(d_rows, d_cols)
        if sn != dn:
            diffs = [
                (a, b) for a, b in zip(sn, dn) if a != b
            ][:5]
            errors.append(
                f"values differ; first diffs (spark vs duck): {diffs}"
            )
    return errors
