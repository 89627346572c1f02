"""Determinism helpers shared by all hash-checked queries (SURVEY.md §7.2).

Floating-point aggregation is order-dependent; under Spark's parallel
partial aggregation the summation order differs run-to-run and from
DuckDB's. The discipline: aggregate money/measure columns in DECIMAL
(exact, order-independent), round, then emit DOUBLE so both engines agree
bit-for-bit and schema-wise (raw decimal sums get different precision:
Spark DECIMAL(28,2) vs DuckDB DECIMAL(38,2)).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dec2(col: Column | str, precision: int = 12) -> Column:
    """Cast a 2dp-decimal-valued double column to exact DECIMAL.

    Fixture money/measure columns are 2dp decimals stored as doubles
    (verified: max |x - round(x,2)| == 0), so this cast is exact and
    engine-agnostic. Products of such decimals stay exact — NEVER multiply
    in double then cast, the double→decimal rounding near .005 boundaries
    differs between Spark (HALF_UP on the exact binary expansion) and
    DuckDB (scaled multiply) and drifts sums by cents.
    """
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({precision},2)")


def dec_sum_exact(col: Column, alias: str, scale: int = 2) -> Column:
    """Sum an already-exact decimal expression → rounded double."""
    return F.round(F.sum(col), scale).cast("double").alias(alias)


def dec_sum(col: Column | str, alias: str, scale: int = 2) -> Column:
    """Exact decimal sum emitted as rounded double.

    Oracle-side equivalent:
    ``CAST(round(sum(CAST(x AS DECIMAL(18,2))), 2) AS DOUBLE) AS alias``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.round(F.sum(c.cast(f"decimal(18,{scale})")), scale)
        .cast("double")
        .alias(alias)
    )


def dec_avg(col: Column | str, alias: str) -> Column:
    """Order-independent average: exact decimal sum → double ÷ count, 4dp.

    Oracle-side equivalent:
    ``round(CAST(sum(CAST(x AS DECIMAL(18,2))) AS DOUBLE) / count(x), 4)``.
    The division happens on identical IEEE doubles in both engines, so the
    result is bit-identical.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.round(
        F.sum(c.cast("decimal(18,2)")).cast("double") / F.count(c), 4
    ).alias(alias)


def round6(col: Column, alias: str) -> Column:
    """6dp rounding for derived doubles (cosine, norms, geomeans)."""
    return F.round(col, 6).alias(alias)


def cents_long(col: Column | str, dp: int = 2) -> Column:
    """A 2dp money double as exact integer hundredths (long).

    The fast path for money PRODUCTS on the hot full-scan aggregates:
    Spark's Decimal multiply always routes through java.math.BigDecimal
    (~2 multiplies/row ≈ 0.9 s over sf0.1 lineitem, measured), while
    long×long codegens to imuls. Only for expressions whose integer
    magnitude stays under ~1e18 per row; pair with ``unit_sum`` so the
    ACCUMULATION still happens in decimal(28,0) (order-independent,
    overflow-safe at any scale).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * (10**dp)).cast("long")


def unit_sum(
    col: Column, pow10: int, alias: str, scale: int = 2
) -> Column:
    """Exact sum of integer-unit money → one rescale/round per GROUP.

    Accumulates the long units in decimal(28,0) (compact-long adds
    until ~1e18, exact at any scale), divides by 10^pow10 once on the
    per-group result, rounds and emits double — the q1_pricing_summary
    discipline, shared so every full-scan money aggregate can use it.
    """
    return (
        F.round(
            F.sum(col.cast("decimal(28,0)")).cast("decimal(38,6)")
            / F.lit(10**pow10),
            scale,
        )
        .cast("double")
        .alias(alias)
    )


def unit_avg(
    col: Column | str, count_col: Column | str, alias: str,
    pow10: int = 2, dp: int = 4,
) -> Column:
    """Average from integer-unit partial sums, oracle-bit-identical.

    ``round(CAST(sum(dec) AS DOUBLE) / n, dp)`` on the oracle side:
    the exact decimal quotient sum/10^pow10 is formed FIRST (decimal
    division by a power of ten is exact at scale 6 ≥ the unit scale),
    cast to double (one correct rounding of the same rational the
    oracle rounds), then divided by the count in IEEE double — both
    engines perform the identical double division, so the result is
    bit-stable without re-deriving the oracle's sum(decimal) shape.
    """
    c = F.col(col) if isinstance(col, str) else col
    n = F.col(count_col) if isinstance(count_col, str) else count_col
    tot = (
        F.sum(c.cast("decimal(28,0)")).cast("decimal(38,6)")
        / F.lit(10**pow10)
    ).cast("double")
    return F.round(tot / F.sum(n), dp).alias(alias)


# Oracle SQL fragments mirroring the helpers above (keep in sync).
def sql_dec2(expr: str, precision: int = 12) -> str:
    return f"CAST({expr} AS DECIMAL({precision},2))"


def sql_dec_sum_exact(expr: str, alias: str, scale: int = 2) -> str:
    return f"CAST(round(sum({expr}), {scale}) AS DOUBLE) AS {alias}"


def sql_dec_sum(expr: str, alias: str, scale: int = 2) -> str:
    return (
        f"CAST(round(sum(CAST(({expr}) AS DECIMAL(18,{scale}))), {scale}) "
        f"AS DOUBLE) AS {alias}"
    )


def sql_dec_avg(expr: str, alias: str) -> str:
    return (
        f"round(CAST(sum(CAST(({expr}) AS DECIMAL(18,2))) AS DOUBLE) "
        f"/ count({expr}), 4) AS {alias}"
    )
