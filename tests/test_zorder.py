"""Z-order clustered writes (sources/zorder.py): the multi-column
file-skipping property, measured from real Parquet footer statistics."""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkify_datalake_spark.sources import zorder as Z

N_FILES = 8


def _grid_df(spark):
    # 64×64 grid of (x, y) — uniform 2-D domain where linear sort is
    # provably bad for the second column
    return spark.range(64 * 64).select(
        (F.col("id") % 64).alias("x"),
        (F.col("id") / 64).cast("long").alias("y"),
        F.col("id").alias("payload"),
    )


def test_z_value_is_morton_interleave(spark):
    rows = spark.range(1).select(
        Z.z_value(F.lit(0b101), F.lit(0b011), bits=3).alias("z")
    ).collect()
    # a=101, b=011 → bits a0..a2 at even positions, b0..b2 at odd:
    # z = a0 + 2*b0 + 4*a1 + 8*b1 + 16*a2 + 32*b2 = 1+2+0+8+16+0 = 27
    assert rows[0]["z"] == 27


def test_zorder_files_have_small_bounding_boxes(spark, tmp_path):
    df = _grid_df(spark)
    zpath = str(tmp_path / "zord")
    lpath = str(tmp_path / "linear")
    Z.write_zordered(df, zpath, "x", "y", n_files=N_FILES)
    (
        df.repartitionByRange(N_FILES, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(lpath)
    )
    zb = Z.file_column_bounds(zpath, ["x", "y"])
    lb = Z.file_column_bounds(lpath, ["x", "y"])
    assert len(zb) == N_FILES and len(lb) == N_FILES

    def avg_span(bounds, col):
        return sum(b[col][1] - b[col][0] + 1 for b in bounds) / len(bounds)

    # N files must tile the same 64×64 grid either way, so total AREA
    # cannot improve — what z-order buys is span BALANCE: the linear
    # layout leaves y spanning the whole domain in every file (span 64,
    # zero skip potential), the z-curve bounds both dimensions at
    # quadrant scale. Assert y collapses ≥2× while x stays bounded
    # below the full domain.
    # (averages, not maxima: a range-partition cut that crosses a
    # z-quadrant boundary legitimately gives ONE file a wide span in
    # one dimension)
    assert avg_span(lb, "y") == 64.0
    assert avg_span(zb, "y") < 32.0, [b["y"] for b in zb]
    assert avg_span(zb, "x") < 48.0, [b["x"] for b in zb]


def test_zorder_skips_files_on_both_columns(spark, tmp_path):
    df = _grid_df(spark)
    zpath = str(tmp_path / "zord")
    lpath = str(tmp_path / "linear")
    Z.write_zordered(df, zpath, "x", "y", n_files=N_FILES)
    (
        df.repartitionByRange(N_FILES, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(lpath)
    )
    zb = Z.file_column_bounds(zpath, ["x", "y"])
    lb = Z.file_column_bounds(lpath, ["x", "y"])
    # filter on the PRIMARY sort column: both layouts skip
    assert Z.files_matching(lb, "x", 0, 7) <= 2
    assert Z.files_matching(zb, "x", 0, 7) <= N_FILES // 2
    # filter on the SECONDARY column: linear layout reads EVERY file,
    # z-order reads at most half
    assert Z.files_matching(lb, "y", 0, 7) == N_FILES
    assert Z.files_matching(zb, "y", 0, 7) <= N_FILES // 2


def test_zordered_write_preserves_data(spark, tmp_path):
    df = _grid_df(spark)
    zpath = str(tmp_path / "zord")
    Z.write_zordered(df, zpath, "x", "y", n_files=N_FILES)
    back = spark.read.parquet(zpath)
    assert back.count() == 64 * 64
    assert back.select(F.sum("payload")).collect()[0][0] == sum(
        range(64 * 64)
    )
    assert set(back.columns) == {"x", "y", "payload"}


def test_pruned_read_matches_full_scan_and_reads_fewer_files(
    spark, tmp_path
):
    df = _grid_df(spark)
    zpath = str(tmp_path / "zord")
    Z.write_zordered(df, zpath, "x", "y", n_files=N_FILES)
    pruned = Z.pruned_read(spark, zpath, "y", 0, 7)
    full = spark.read.parquet(zpath).filter("y >= 0 and y <= 7")
    assert sorted(r["payload"] for r in pruned.collect()) == sorted(
        r["payload"] for r in full.collect()
    )
    # the pruned plan must scan fewer files than the table holds
    n_scanned = len(pruned.inputFiles())
    assert 0 < n_scanned <= N_FILES // 2, n_scanned
    # empty intersection returns an empty frame with the right schema
    empty = Z.pruned_read(spark, zpath, "y", 1000, 2000)
    assert empty.count() == 0 and set(empty.columns) == {
        "x", "y", "payload",
    }
