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
    return rows, cols, df.schema


def run_duck(con, sql):
    cur = con.execute(sql)
    cols = [d[0].lower() for d in cur.description]
    rows = cur.fetchall()
    return rows, cols


def _value_kind(rows, idx):
    """'int' / 'float' / None for one column, from actual values."""
    has_null = False
    kind = None
    for r in rows:
        v = r[idx]
        if v is None:
            has_null = True
        elif isinstance(v, bool):
            return None, has_null
        elif isinstance(v, float):
            kind = "float"
        elif isinstance(v, int) and kind is None:
            kind = "int"
        else:
            if not isinstance(v, (int, float)):
                return None, has_null
    return kind, has_null


# DuckDB type name → the pandas dtype kind its .df() conversion produces.
# HUGEINT/UHUGEINT/DECIMAL land as float64 — THE trap: Spark int64 vs
# oracle float64 breaks the driver's value hash.
_DUCK_INT_TYPES = {
    "TINYINT", "SMALLINT", "INTEGER", "BIGINT",
    "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT",
}
_DUCK_FLOAT_TYPES = {"FLOAT", "DOUBLE", "HUGEINT", "UHUGEINT"}


def duck_pandas_kinds(con, sql) -> dict[str, str | None]:
    """Column → pandas-kind mapping from DESCRIBE (binder-only: the
    query is planned, not executed — no second full run per oracle)."""
    kinds = {}
    for name, typ, *_ in con.execute(f"DESCRIBE {sql}").fetchall():
        t = typ.upper()
        if t in _DUCK_INT_TYPES:
            kinds[name.lower()] = "int"
        elif t in _DUCK_FLOAT_TYPES or t.startswith("DECIMAL"):
            kinds[name.lower()] = "float"
        else:
            kinds[name.lower()] = None
    return kinds


def driver_trap_errors(schema, s_rows, s_cols, duck_kinds):
    """Mirror the grading driver's pandas-based hasher failure modes.

    1. Array/map/struct output columns crash the driver's canonicalizer
       (TypeError: unhashable numpy.ndarray in sort_values) — confirmed
       red on agg_maxby_collect in round 1.
    2. A DuckDB HUGEINT (bare integer sum) lands in pandas as float64
       while Spark emits int64 — value hash breaks on 9924 vs 9924.0 —
       confirmed red on filter_null_semantics in round 1.
    """
    from pyspark.sql.types import ArrayType, MapType, StructType

    errors = []
    complex_cols = [
        f.name
        for f in schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    if complex_cols:
        errors.append(
            f"complex-typed output columns {complex_cols} would crash the "
            "driver hasher — project array_join/to_json strings instead"
        )
    for i, c in enumerate(s_cols):
        s_kind, s_null = _value_kind(s_rows, i)
        d_kind = duck_kinds.get(c)
        if s_kind and d_kind and s_kind != d_kind and not s_null:
            errors.append(
                f"column {c!r}: spark values are {s_kind} but the oracle "
                f"lands in pandas as {d_kind} (HUGEINT/coercion trap) — "
                "CAST the oracle expression to BIGINT/DOUBLE to match"
            )
    return errors


def compare(spark, con, fn, sql, sf_dir, name="query"):
    s_rows, s_cols, s_schema = run_spark(spark, fn, sf_dir)
    d_rows, d_cols = run_duck(con, sql)
    duck_kinds = duck_pandas_kinds(con, sql)
    errors = driver_trap_errors(s_schema, s_rows, s_cols, duck_kinds)
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
