"""Distributed exact interpolated percentiles via sketch-bracketed
selection.

Spark's built-in exact ``percentile``/``median`` is an object-hash
aggregate: every partition builds a value→count map and the maps MERGE
on one reducer task per group. With few groups and a large,
high-cardinality value column (5 priorities × millions of distinct
prices), the merge runs 5-way on a 32-core box and dominates the query
(measured 50 s for ``agg_percentile`` at the 64× probe vs ~8 s for
this plan) — the same single-task-per-group collapse a naive
``Window.partitionBy(g).orderBy(v)`` rank would hit. At 100 TB it is a
straight scale-killer.

This module computes the SAME exact linear-interpolated percentile
(the ``quantile_cont`` contract pinned by ``agg_percentile``) with two
fully-parallel scans and only KB-sized shuffles:

1. **Bracket scan**: per group, ``approx_percentile(v, p ± 10ε, 1/ε)``
   (Greenwald–Khanna, mergeable partials, map-side) yields a value
   band GUARANTEED to contain the exact target ranks: the sketch's
   rank error is ≤ εn, the probes sit 10εn away, so the band's true
   rank span covers [k−8εn, k+8εn] ∋ {k_lo, k_hi}. The exact group
   count n (same scan) turns each p into its two order statistics
   ``k_lo/k_hi = floor/ceil((n−1)p)+1`` and interpolation fraction.
   The band frame re-enters the selection scan as a broadcast join —
   never a driver collect — so the whole query stays one lazy plan.
2. **Selection scan**: re-scan, bucketing every row per spec into a
   single sort key: ``−inf`` below the band (these collapse to one
   below-count row per task — the rank offset), the row's own value
   inside the band (≈ 20εn rows per spec, ~2 % of input at ε=1e-3),
   ``+inf`` above. A windowed cumulative count over those tiny
   per-(group, spec) slices — thousands of rows, not millions —
   locates the values at ranks k_lo and k_hi exactly; the −inf
   sentinel folds the below-count into the same cumulative sum, so no
   second aggregate or join is needed.
3. Interpolate ``v_lo + (v_hi − v_lo)·frac`` — the arithmetic DuckDB's
   ``quantile_cont`` uses, so rounded results stay hash-identical to
   the oracle. A loud ``assert_true`` guards the band-coverage
   invariant (a pick landing on a ±inf sentinel or null means the
   sketch violated its error bound): the query fails instead of
   returning a silently-wrong quantile.

The plan shuffles O(groups·specs·εn) rows against the input's O(n),
and every phase is partial-aggregated map-side — the shape survives
1000 executors unchanged, which the object-hash merge cannot. Multiple
value columns share the two scans (``exact_percentiles_multi``):
``agg_percentile``'s four quantiles over two columns cost one bracket
scan + one selection scan total.

Implementation notes that earned their keep at the 64× probe:
- The input is deliberately NOT checkpointed: re-reading a pruned
  vectorized parquet scan measured 2× faster than re-reading a
  row-format checkpoint of the same columns (callers whose input is a
  derived frame — a window, a join — SHOULD checkpoint it themselves,
  as events_inter_arrival does).
- Sketch accuracy 1000 is deliberate: the sketch then costs the same
  as a plain count scan (1.7 s on 38M rows) where 10000 costs 2.5×,
  and the wider band still shuffles only ~20εn rows per spec.
- Groups smaller than ``_N_MIN`` bypass the sketch band (±inf bounds):
  below ~223 values the probe margin (10εn ranks) can be under the
  2-rank spread between k_lo's and k_hi's guarantees (n=2, p=0.25
  reproduces the miss — the coverage assert caught it).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["exact_percentiles", "exact_percentiles_multi"]

# GK sketch accuracy: rank error ≤ n/_ACCURACY; probes sit 10× the
# error bound from p, giving band coverage with 8× slack.
_ACCURACY = 1_000
_MARGIN = 10.0 / _ACCURACY
# Minimum group size for the sketch band to be trustworthy: 9εn ≥ 2
# needs n ≥ 223 at ε=1e-3; 1000 adds 4× slack. Smaller groups use ±inf
# bounds and aggregate all their (few) values.
_N_MIN = 1_000

_INF = float("inf")


def exact_percentiles(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    specs: Sequence[tuple[float, str]],
    counts: Sequence[tuple[str, str]] | None = None,
) -> DataFrame:
    """Exact interpolated percentiles of ``value_col`` per group.

    ``specs`` is a list of ``(p, out_name)`` with 0 ≤ p ≤ 1. Returns a
    DataFrame of ``group_cols`` + one double column per ``out_name``
    (null group keys are not supported — callers group on non-null
    dimension columns; values must be finite). Groups with no non-null
    value are absent from the output, matching ``quantile_cont`` under
    GROUP BY.
    """
    return exact_percentiles_multi(
        df, group_cols, [(value_col, specs)], counts=counts
    )


def exact_percentiles_multi(
    df: DataFrame,
    group_cols: Sequence[str],
    col_specs: Sequence[tuple[str, Sequence[tuple[float, str]]]],
    counts: Sequence[tuple[str, str]] | None = None,
) -> DataFrame:
    """Exact percentiles for several value columns in two shared scans.

    ``col_specs`` maps each value column to its ``(p, out_name)`` list;
    output column order follows the flattened spec order. A group row
    appears when ANY column has a non-null value; a column's outputs
    are null for groups where that column is all-null (same as
    ``quantile_cont`` under GROUP BY with joined per-column frames).

    ``counts`` optionally maps value columns to output column names
    carrying that column's per-group NON-NULL count (``count(v)``
    semantics). The count rides FREE on the selection pass — every
    row of a spec contributes to exactly one contrib slice, so the
    per-spec Σcnt in the final fold is already the column's row count
    — sparing callers (feat_robust_scaler's former shape) a third
    full scan + join just for ``n``.
    """
    g = list(group_cols)
    dummy = not g
    if dummy:  # global percentile: constant group, dropped at the end
        df = df.withColumn("__g", F.lit(1))
        g = ["__g"]

    vcols = [c for c, _ in col_specs]
    vals = df.select(
        *g,
        *[
            F.col(c).cast("double").alias(f"__v{ci}")
            for ci, c in enumerate(vcols)
        ],
    )
    any_nonnull = F.col("__v0").isNotNull()
    for ci in range(1, len(vcols)):
        any_nonnull = any_nonnull | F.col(f"__v{ci}").isNotNull()
    vals = vals.where(any_nonnull)

    # Bracket scan: per column, the exact count + one probe pair per p.
    aggs: list[Column] = []
    for ci, (_, specs) in enumerate(col_specs):
        probes: list[float] = []
        for p, _ in specs:
            probes.append(max(float(p) - _MARGIN, 0.0))
            probes.append(min(float(p) + _MARGIN, 1.0))
        aggs.append(F.count(F.col(f"__v{ci}")).alias(f"__n{ci}"))
        aggs.append(
            F.expr(
                f"approx_percentile(__v{ci},"
                f" array({', '.join(map(repr, probes))}), {_ACCURACY})"
            ).alias(f"__qs{ci}")
        )
    stats = vals.groupBy(*g).agg(*aggs)

    # One band row per (group, spec), carrying the rank targets and
    # interpolation fraction through the whole pipeline (constants per
    # spec, so they ride the group-by keys — no re-join later). Probe
    # values widen to ±inf when the probe clamped at 0/1 (the sketch
    # endpoint is not guaranteed to be the true min/max) or the group
    # is too small for the margin guarantee.
    band_structs: list[Column] = []
    names: list[str] = []
    for ci, (_, specs) in enumerate(col_specs):
        for si, (p, name) in enumerate(specs):
            p = float(p)
            i = len(names)
            names.append(str(name))
            small = F.col(f"__n{ci}") < _N_MIN
            lo = (
                F.lit(-_INF)
                if p - _MARGIN <= 0.0
                else F.when(small, F.lit(-_INF)).otherwise(
                    F.col(f"__qs{ci}").getItem(2 * si)
                )
            )
            hi = (
                F.lit(_INF)
                if p + _MARGIN >= 1.0
                else F.when(small, F.lit(_INF)).otherwise(
                    F.col(f"__qs{ci}").getItem(2 * si + 1)
                )
            )
            pos = (F.col(f"__n{ci}") - F.lit(1)).cast("double") * F.lit(p)
            band_structs.append(
                F.struct(
                    F.lit(i).alias("__i"),
                    F.lit(ci).alias("__c"),
                    lo.alias("__a"),
                    hi.alias("__b"),
                    (F.floor(pos) + 1).alias("__k_lo"),
                    (F.ceil(pos) + 1).alias("__k_hi"),
                    (pos - F.floor(pos).cast("double")).alias("__frac"),
                )
            )
    bands = (
        stats.select(*g, F.explode(F.array(*band_structs)).alias("__band"))
        .select(*g, "__band.*")
        .where(F.col("__a").isNotNull() & F.col("__b").isNotNull())
    )

    # Selection scan: row × spec fan-out is map-side only; the partial
    # aggregate collapses below-band rows onto the −inf sentinel (one
    # row per task × spec) and in-band values onto their distinct-value
    # counts before any shuffle. Above-band rows collapse onto +inf.
    j = vals.join(F.broadcast(bands), g)
    vsel: Column = F.col("__v0")
    for ci in range(1, len(vcols)):
        vsel = F.when(F.col("__c") == ci, F.col(f"__v{ci}")).otherwise(vsel)
    j = j.withColumn("__vs", vsel).where(F.col("__vs").isNotNull())
    key = (
        F.when(F.col("__vs") < F.col("__a"), F.lit(-_INF))
        .when(F.col("__vs") > F.col("__b"), F.lit(_INF))
        .otherwise(F.col("__vs"))
    )
    contrib = j.groupBy(
        *g,
        "__i",
        "__k_lo",
        "__k_hi",
        "__frac",
        key.alias("__bv"),
    ).agg(F.count(F.lit(1)).alias("__cnt"))

    # The −inf sentinel sorts first, so the running count over each
    # tiny (group, spec) slice IS the global rank at each value.
    w_cum = (
        Window.partitionBy(*g, "__i")
        .orderBy("__bv")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    ranked = contrib.withColumn("__cum", F.sum("__cnt").over(w_cum))

    # Rank picks: a PARTITION-LOCAL aggregate — the grouping keys
    # extend the window's (g, __i) partitioning, so Catalyst inserts
    # no exchange, and the hot per-row work stays TWO narrow min
    # buffers (a wide per-spec conditional fold here was measured ~2×
    # slower at the 64× probe: 16+ CASE buffers per ranked row push
    # the window+aggregate stage out of whole-stage codegen). __n
    # (Σcnt over the slice) rides along for the free per-column
    # counts. The slice row count is the spec's total row count.
    picked = ranked.groupBy(*g, "__i", "__k_lo", "__k_hi", "__frac").agg(
        F.min(
            F.when(F.col("__cum") >= F.col("__k_lo"), F.col("__bv"))
        ).alias("__v_lo"),
        F.min(
            F.when(F.col("__cum") >= F.col("__k_hi"), F.col("__bv"))
        ).alias("__v_hi"),
        F.sum("__cnt").alias("__n"),
    )
    # Coverage invariant, loudly enforced: a null pick means the
    # band's total rank mass fell short of a target; a ±inf pick means
    # the target rank sat outside the band. assert_true yields NULL
    # when the invariant holds, so the coalesce is arithmetic
    # identity. (A spec with NO rows — its value column all-null in
    # this group — has no picked row at all and correctly folds to a
    # null output below.)
    ok = (
        F.col("__v_lo").isNotNull()
        & F.col("__v_hi").isNotNull()
        & (F.col("__v_lo") > F.lit(-_INF))
        & (F.col("__v_hi") < F.lit(_INF))
    )
    guard = F.coalesce(
        F.assert_true(
            ok, F.lit("exact_percentiles: sketch band missed target rank")
        ).cast("double"),
        F.lit(0.0),
    )
    interp = (
        F.col("__v_lo")
        + (F.col("__v_hi") - F.col("__v_lo")) * F.col("__frac")
        + guard
    )
    per = picked.select(*g, "__i", interp.alias("__val"), "__n")

    # Tail FUSED: the former pivot-groupBy is one conditional
    # aggregation over the ≤ groups×specs picked rows straight to the
    # per-group output row (one less tiny exchange + stage per engine
    # invocation, and every consumer pays the engine 1–2×).
    spec_aggs: list[Column] = [
        F.max(F.when(F.col("__i") == i, F.col("__val"))).alias(str(name))
        for i, name in enumerate(names)
    ]
    if counts:
        # First spec index of each value column: every row of a spec
        # lands in exactly one contrib slice, so Σcnt over the spec is
        # the column's non-null row count — no extra scan.
        first_spec: dict[str, int] = {}
        i = 0
        for c, specs in col_specs:
            first_spec.setdefault(c, i)
            i += len(specs)
        for c, out_name in counts:
            i0 = first_spec[c]
            spec_aggs.append(
                F.coalesce(
                    F.max(
                        F.when(F.col("__i") == i0, F.col("__n"))
                    ),
                    F.lit(0),
                )
                .cast("long")
                .alias(str(out_name))
            )
    out = per.groupBy(*g).agg(*spec_aggs)
    if dummy:
        out = out.drop("__g")
    return out
