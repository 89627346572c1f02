"""Property-based Spark↔DuckDB semantics-drift probes (SURVEY §5.6).

Each example draws a batch of random values, pushes the batch through
the same scalar expressions in Spark SQL and DuckDB, and compares under
the §7.2 rounding discipline. This is the cheap way to catch dialect
drift (round half-up vs half-even, regex corners, date-part off-by-one)
that the fixture corpus happens not to exercise.

Examples are batched (one Spark job per example, 64 values each) and
example counts kept small — a Spark round-trip is ~100 ms.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

finite_doubles = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
)
# tokens in the Java∩RE2-safe, quote-free ascii subset
tokens = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyz0123456789 _-", min_size=0, max_size=24
)


@pytest.fixture(scope="module")
def ddb():
    return duckdb.connect()


def _spark_rows(spark, values, sql_exprs: str, typ: str):
    df = spark.createDataFrame([(v,) for v in values], f"x {typ}")
    df.createOrReplaceTempView("prop_t")
    return [tuple(r) for r in spark.sql(
        f"SELECT {sql_exprs} FROM prop_t"
    ).collect()]


def _duck_rows(ddb, values, sql_exprs: str, typ: str):
    ddb.execute("DROP TABLE IF EXISTS prop_t")
    ddb.execute(f"CREATE TABLE prop_t (x {typ})")
    ddb.executemany("INSERT INTO prop_t VALUES (?)", [(v,) for v in values])
    return [tuple(r) for r in ddb.execute(
        f"SELECT {sql_exprs} FROM prop_t"
    ).fetchall()]


@given(st.lists(finite_doubles, min_size=1, max_size=64))
@settings(**_SETTINGS)
def test_math_functions_agree(spark, ddb, xs):
    # libm-backed fns rounded to 6dp; exact fns compared raw
    exprs = (
        "round(abs(x), 6), ceil(x), floor(x), "
        "round(sqrt(abs(x)), 6), round(exp(least(abs(x), 20.0) * -1), 6), "
        "round(ln(abs(x) + 1.0), 6)"
    )
    assert sorted(_spark_rows(spark, xs, exprs, "double")) == sorted(
        _duck_rows(ddb, xs, exprs, "DOUBLE")
    )


@given(st.lists(tokens, min_size=1, max_size=64))
@settings(**_SETTINGS)
def test_string_functions_agree(spark, ddb, ss):
    exprs = (
        "upper(x), lower(x), trim(x), length(x), "
        "substring(x, 1, 5), replace(x, 'a', 'z'), reverse(x)"
    )
    assert sorted(_spark_rows(spark, ss, exprs, "string")) == sorted(
        _duck_rows(ddb, ss, exprs, "VARCHAR")
    )


@given(st.lists(tokens, min_size=1, max_size=64))
@settings(**_SETTINGS)
def test_regex_safe_subset_agrees(spark, ddb, ss):
    # patterns restricted to the Java∩RE2-safe subset per SURVEY §2-H
    sp = _spark_rows(
        spark, ss,
        "regexp_extract(x, '[a-z]+', 0), x rlike '^[0-9]'", "string",
    )
    du = _duck_rows(
        ddb, ss,
        "coalesce(regexp_extract(x, '[a-z]+', 0), ''), "
        "regexp_matches(x, '^[0-9]')", "VARCHAR",
    )
    assert sorted(sp) == sorted(du)


@given(st.lists(st.integers(min_value=0, max_value=40000), min_size=1,
                max_size=64))
@settings(**_SETTINGS)
def test_date_parts_agree(spark, ddb, days):
    # dates via epoch-day offsets: covers leap years, month ends, y2k
    exprs_spark = (
        "year(d), month(d), day(d), dayofweek(d), "
        "date_format(last_day(d), 'yyyy-MM-dd')"
    )
    df_vals = [(int(d),) for d in days]
    spark_df = spark.createDataFrame(df_vals, "n int")
    spark_df.createOrReplaceTempView("prop_d")
    sp = [tuple(r) for r in spark.sql(
        "SELECT " + exprs_spark + " FROM "
        "(SELECT date_add(DATE '1970-01-01', n) AS d FROM prop_d)"
    ).collect()]
    ddb.execute("DROP TABLE IF EXISTS prop_d")
    ddb.execute("CREATE TABLE prop_d (n INTEGER)")
    ddb.executemany("INSERT INTO prop_d VALUES (?)", df_vals)
    # Spark dayofweek: Sun=1..Sat=7; DuckDB dayofweek: Sun=0..Sat=6
    du = [tuple(r) for r in ddb.execute(
        "SELECT year(d), month(d), day(d), dayofweek(d) + 1, "
        "strftime(last_day(d), '%Y-%m-%d') FROM "
        "(SELECT DATE '1970-01-01' + n AS d FROM prop_d)"
    ).fetchall()]
    assert sorted(sp) == sorted(du)


# ---------------------------------------------------------------------------
# Pure-Python properties of engine kernels (no Spark session needed for
# the reference model; one batch evaluation per example set).


def _morton_py(a: int, b: int, bits: int) -> int:
    z = 0
    for i in range(bits):
        z |= ((a >> i) & 1) << (2 * i)
        z |= ((b >> i) & 1) << (2 * i + 1)
    return z


@settings(deadline=None, max_examples=20,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=(1 << 16) - 1),
            st.integers(min_value=0, max_value=(1 << 16) - 1),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_z_value_matches_reference_interleave(spark, pairs):
    """The codegen Morton expression must equal the bit-twiddling
    reference for arbitrary 16-bit coordinates (bijectivity follows)."""
    from pyspark.sql import functions as F

    from sparkify_datalake_spark.sources.zorder import z_value

    df = spark.createDataFrame(pairs, "a long, b long")
    got = [
        r["z"]
        for r in df.select(
            z_value(F.col("a"), F.col("b")).alias("z")
        ).collect()
    ]
    want = [_morton_py(a, b, 16) for a, b in pairs]
    assert got == want


@settings(deadline=None, max_examples=10,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    st.lists(
        st.integers(min_value=-1000, max_value=1000),
        min_size=1,
        max_size=200,
    )
)
def test_cms_never_undercounts_any_key(spark, keys):
    """CMS lower-bound invariant under arbitrary key multisets: the
    estimate for EVERY distinct key is ≥ its true count."""
    from collections import Counter

    from pyspark.sql import functions as F  # noqa: F401

    from sparkify_datalake_spark.operators.aggregates import (
        cms_build,
        cms_estimate,
    )

    df = spark.createDataFrame([(k,) for k in keys], "k long")
    cms = cms_build(df, "k")
    probes = df.distinct()
    est = {
        r["k"]: r["est_count"]
        for r in cms_estimate(cms, probes, "k").collect()
    }
    true = Counter(keys)
    for k, t in true.items():
        assert est[k] >= t, (k, est[k], t)


def test_surrogate_keys_unique_and_stable(spark):
    """fn_surrogate_key must mint collision-free, rerun-stable keys —
    the two properties monotonically_increasing_id cannot promise."""
    from sparkify_datalake_spark.registry import queries

    q = queries()["fn_surrogate_key"]
    df1 = q(spark, "/root/testdata/sf0.001")
    n = df1.count()
    assert df1.select("sk_int").distinct().count() == n
    assert df1.select("sk_hex").distinct().count() == n
    # stable across runs (new plan, same values)
    r1 = sorted((r["c_custkey"], r["sk_int"]) for r in df1.collect())
    r2 = sorted(
        (r["c_custkey"], r["sk_int"])
        for r in q(spark, "/root/testdata/sf0.001").collect()
    )
    assert r1 == r2


def test_band_lookup_covers_every_order_exactly_once(spark):
    """join_band_lookup's lead-derived edges must partition the price
    line: per-bucket min/max intervals drop tie-straddling values
    (9/15000 measured before the fix); exactly-once coverage is the
    band-join contract."""
    from sparkify_datalake_spark.registry import queries

    sf = "/root/testdata/sf0.001"
    df = queries()["join_band_lookup"](spark, sf)
    n_orders = spark.read.parquet(f"{sf}/orders.parquet").count()
    assert df.count() == n_orders
    assert df.select("o_orderkey").distinct().count() == n_orders


def test_ztest_degenerate_arms_yield_null_z(spark, tmp_path):
    # 64x-probe regression: when every user converts, the pooled rate
    # is 1.0 and the z denominator is sqrt(0) — the query must return
    # a NULL z statistic (DuckDB's division-by-zero semantics), not
    # raise ANSI DIVIDE_BY_ZERO
    import datetime

    from sparkify_datalake_spark.registry import queries

    rows = [
        (i, datetime.datetime(2024, 1, 1, 0, 0, i % 60), i % 97,
         "purchase", 500.0, "{}")
        for i in range(400)
    ]
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string"
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    out = queries()["stat_abtest_ztest"](spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["rate_a"] == 1.0 and r["rate_b"] == 1.0
    assert r["z_stat"] is None
