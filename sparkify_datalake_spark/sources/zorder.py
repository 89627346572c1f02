"""Z-order (Morton-curve) clustered writes for multi-column file
skipping (SURVEY §2-A lakehouse addendum; the public Delta
OPTIMIZE ZORDER BY / Iceberg sort-order feature re-expressed as plain
Spark ops).

Why it matters at 100 TB: Parquet readers skip row groups / files whose
footer min-max doesn't intersect the filter. A single-column sort makes
ONE column's per-file ranges tight and leaves every other column's
ranges spanning the whole domain — so filters on the second column skip
nothing. Interleaving the bits of both columns' ranks (the Morton
z-value) and range-partitioning + sorting by it gives every file a
small bounding BOX: filters on EITHER column skip most files
(tests/test_zorder.py measures both layouts' footer stats and asserts
the skip-rate difference).

Everything is JVM-side codegen: the bit interleave is a fold of
shift/AND/OR expressions — no UDF; the write is one
``repartitionByRange`` shuffle (sampling the z-value) + an in-partition
sort, exactly what a sorted write costs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

_BITS = 16  # bits per dimension (32-bit z-values for 2-D)


def _scale_to_bits(c: Column, lo: Column, hi: Column, bits: int) -> Column:
    """Affine-map a numeric column into the integer grid [0, 2^bits)."""
    span = F.when(hi > lo, (hi - lo).cast("double")).otherwise(F.lit(1.0))
    frac = (c.cast("double") - lo.cast("double")) / span
    grid = F.floor(frac * ((1 << bits) - 1)).cast("long")
    return F.greatest(F.lit(0), F.least(F.lit((1 << bits) - 1), grid))


def z_value(a: Column, b: Column, bits: int = _BITS) -> Column:
    """Interleave the low `bits` bits of two grid coordinates.

    Bit i of `a` lands at position 2i, bit i of `b` at 2i+1 — the
    classic Morton code. Built as a sum of shifted masked bits: 2×bits
    codegen terms, constant-folded per row, no Python involved.
    """
    out = F.lit(0).cast("long")
    for i in range(bits):
        abit = F.shiftright(a, i).bitwiseAND(F.lit(1))
        bbit = F.shiftright(b, i).bitwiseAND(F.lit(1))
        out = out + F.shiftleft(abit, 2 * i) + F.shiftleft(bbit, 2 * i + 1)
    return out


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    n_files: int = 8,
    bits: int = _BITS,
) -> None:
    """Write `df` as `n_files` Parquet files clustered on the z-curve
    of (col_a, col_b).

    One tiny stats pass finds each column's domain (broadcast back as a
    1-row frame — at cluster scale this is a metadata read); the write
    itself is one range shuffle on the z-value plus an in-partition
    sort, so consecutive z-ranges land in the same file and every
    file's (col_a, col_b) bounding box is small.
    """
    stats = df.agg(
        F.min(col_a).alias("a_lo"),
        F.max(col_a).alias("a_hi"),
        F.min(col_b).alias("b_lo"),
        F.max(col_b).alias("b_hi"),
    )
    ga = _scale_to_bits(F.col(col_a), F.col("a_lo"), F.col("a_hi"), bits)
    gb = _scale_to_bits(F.col(col_b), F.col("b_lo"), F.col("b_hi"), bits)
    (
        df.crossJoin(F.broadcast(stats))
        .withColumn("_z", z_value(ga, gb, bits))
        .drop("a_lo", "a_hi", "b_lo", "b_hi")
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def file_column_bounds(path: str, cols: list[str]) -> list[dict]:
    """Per-file [min, max] footer statistics for the given columns —
    what a skipping reader consults. Pure pyarrow metadata reads (no
    Spark job, no data pages)."""
    import os

    import pyarrow.parquet as pq

    out = []
    for fname in sorted(os.listdir(path)):
        if not fname.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, fname)).metadata
        bounds: dict = {"file": fname}
        if md.num_row_groups == 0:  # empty part file: no stats
            out.append(bounds)
            continue
        for ci in range(md.num_columns):
            col = md.row_group(0).column(ci).path_in_schema
            if col not in cols:
                continue
            lo, hi = None, None
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(ci).statistics
                if st is None or not st.has_min_max:
                    lo, hi = None, None
                    break  # any stats-less row group voids the file bound
                lo = st.min if lo is None else min(lo, st.min)
                hi = st.max if hi is None else max(hi, st.max)
            if lo is not None:
                bounds[col] = (lo, hi)
        out.append(bounds)
    return out


def files_matching(
    bounds: list[dict], col: str, lo, hi
) -> int:
    """How many files a [lo, hi] filter on `col` must read (bounding-
    box intersection — the reader's skipping decision; a file without
    stats for `col` is conservatively counted as read)."""
    return sum(
        1
        for b in bounds
        if col not in b or not (b[col][1] < lo or b[col][0] > hi)
    )


def pruned_read(
    spark: SparkSession, path: str, col: str, lo, hi
) -> DataFrame:
    """Read only the files whose footer [min,max] for `col` intersects
    [lo, hi], then re-apply the filter for exactness.

    This is the engine-side half of the z-order story: the metadata
    pass costs O(files) footer reads (no data pages, no Spark job) and
    the scan touches only surviving files — on a z-ordered table a
    range filter on EITHER clustered column reads a fraction of the
    data. Equivalent to what Delta/Iceberg do with their stats
    manifests; here the stats come straight from Parquet footers.
    """
    import os

    bounds = file_column_bounds(path, [col])
    keep = [
        os.path.join(path, b["file"])
        for b in bounds
        if col not in b or not (b[col][1] < lo or b[col][0] > hi)
    ]
    if not keep:
        # preserve schema on an empty result
        return spark.read.parquet(path).filter(F.lit(False))
    return spark.read.parquet(*keep).filter(
        (F.col(col) >= F.lit(lo)) & (F.col(col) <= F.lit(hi))
    )
