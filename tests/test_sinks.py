"""Sink round-trip tests (SURVEY.md §2-A rows sink_parquet_partitioned,
sink_csv_json_roundtrip; §2.1 surrogate-id coverage)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkify_datalake_spark.sources.load import load
from sparkify_datalake_spark.sources import sinks


def test_parquet_partitioned_roundtrip(spark, sf_dir, tmp_path):
    orders = load(spark, sf_dir, "orders")
    out = str(tmp_path / "orders_by_status")
    sinks.write_partitioned_parquet(orders, out, ["o_orderstatus"])

    back = sinks.read_partitioned_parquet(spark, out)
    expected = {
        r["o_orderstatus"]: r["n"]
        for r in orders.groupBy("o_orderstatus").agg(F.count("*").alias("n")).collect()
    }
    actual = {
        r["o_orderstatus"]: r["n"]
        for r in back.groupBy("o_orderstatus").agg(F.count("*").alias("n")).collect()
    }
    assert actual == expected
    # partition pruning: a filter on the partition column reads one directory
    plan = back.filter(F.col("o_orderstatus") == "F")._jdf.queryExecution().executedPlan().toString()
    assert "o_orderstatus" in plan
    pruned = back.filter(F.col("o_orderstatus") == "F").count()
    assert pruned == expected["F"]


def test_parquet_partition_directories(spark, sf_dir, tmp_path):
    import os

    orders = load(spark, sf_dir, "orders")
    out = str(tmp_path / "dirs")
    sinks.write_partitioned_parquet(orders, out, ["o_orderstatus"])
    dirs = {d for d in os.listdir(out) if d.startswith("o_orderstatus=")}
    statuses = {r[0] for r in orders.select("o_orderstatus").distinct().collect()}
    assert dirs == {f"o_orderstatus={s}" for s in statuses}


def test_csv_json_roundtrip(spark, sf_dir, tmp_path):
    region = load(spark, sf_dir, "region")
    schema = region.schema
    expected = sorted(tuple(r) for r in region.collect())

    csv_path = str(tmp_path / "region_csv")
    sinks.write_csv(region, csv_path)
    csv_back = sinks.read_csv(spark, csv_path, schema)
    assert csv_back.schema == schema
    assert sorted(tuple(r) for r in csv_back.collect()) == expected

    json_path = str(tmp_path / "region_json")
    sinks.write_json(region, json_path)
    json_back = sinks.read_json(spark, json_path, schema)
    assert json_back.schema == schema
    assert sorted(tuple(r) for r in json_back.collect()) == expected


def test_xml_roundtrip(spark, sf_dir, tmp_path):
    """Spark 4 built-in XML source (SPARK-44265): schema-locked
    round-trip, same contract as the CSV/JSON pair — completing the
    format matrix (parquet / ORC / CSV / JSON / XML)."""
    nation = load(spark, sf_dir, "nation")
    schema = nation.schema
    expected = sorted(tuple(r) for r in nation.collect())

    xml_path = str(tmp_path / "nation_xml")
    sinks.write_xml(nation, xml_path)
    back = sinks.read_xml(spark, xml_path, schema)
    assert back.schema == schema
    assert sorted(tuple(r) for r in back.collect()) == expected


def test_surrogate_id_distinct(spark, sf_dir):
    """monotonically_increasing_id: nondeterministic values, but always
    distinct and non-null (reference's songplay_id pattern)."""
    orders = load(spark, sf_dir, "orders")
    with_id = orders.withColumn("sid", F.monotonically_increasing_id())
    n = with_id.count()
    assert with_id.select("sid").distinct().count() == n
    assert with_id.filter(F.col("sid").isNull()).count() == 0


def test_bucketed_join_is_shuffle_free(spark, sf_dir, tmp_path):
    """Two tables bucketed on the join key join with no Exchange."""
    from sparkify_datalake_spark.sources.load import load
    from sparkify_datalake_spark.sources.sinks import write_bucketed_table

    write_bucketed_table(
        load(spark, sf_dir, "orders"), "b_orders", "o_orderkey", 8,
        str(tmp_path / "b_orders"),
    )
    write_bucketed_table(
        load(spark, sf_dir, "lineitem"), "b_lineitem", "l_orderkey", 8,
        str(tmp_path / "b_lineitem"),
    )
    threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        li, orders = spark.table("b_lineitem"), spark.table("b_orders")
        joined = li.join(orders, li.l_orderkey == orders.o_orderkey)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, "bucketed join must not shuffle"
        assert "SortMergeJoin" in plan
        assert "Bucketed: true" in plan
        # and it still returns the right rows
        n = joined.count()
        li0 = load(spark, sf_dir, "lineitem")
        orders0 = load(spark, sf_dir, "orders")
        expected = li0.join(
            orders0, li0.l_orderkey == orders0.o_orderkey
        ).count()
        assert n == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_json_permissive_quarantines_corrupt_rows(spark, tmp_path):
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from sparkify_datalake_spark.sources.sinks import read_json_permissive

    src = tmp_path / "in.json"
    src.write_text(
        '{"id": 1, "name": "ok"}\n'
        "{bad json line\n"
        '{"id": 2, "name": "also ok"}\n'
        '{"id": "not-a-number", "name": "type-mismatch"}\n'
    )
    schema = StructType(
        [StructField("id", LongType()), StructField("name", StringType())]
    )
    df = read_json_permissive(spark, str(src), schema).cache()
    good = df.filter(df._corrupt_record.isNull())
    bad = df.filter(df._corrupt_record.isNotNull())
    assert sorted(r["id"] for r in good.collect()) == [1, 2]
    # both the syntax error and the type mismatch are quarantined whole
    assert bad.count() == 2
    assert all(r["id"] is None for r in bad.collect())
    df.unpersist()


def test_sorted_write_tightens_rowgroup_stats(spark, sf_dir, tmp_path):
    """write_sorted_parquet must produce near-disjoint per-file key
    ranges (the parquet-footer property scan pruning feeds on), where
    an unsorted write leaves every file spanning the whole domain."""
    import glob

    import pyarrow.parquet as pq

    from sparkify_datalake_spark.sources.load import load
    from sparkify_datalake_spark.sources.sinks import write_sorted_parquet

    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    flat = str(tmp_path / "flat")
    sorted_ = str(tmp_path / "sorted")
    orders.repartition(4).write.parquet(flat)
    write_sorted_parquet(orders, sorted_, ["o_custkey"], n_files=4)

    def span_sum(path):
        total = 0
        for f in glob.glob(f"{path}/*.parquet"):
            md = pq.read_metadata(f)
            for rg in range(md.num_row_groups):
                col = md.row_group(rg).column(1)  # o_custkey
                st = col.statistics
                total += st.max - st.min
        return total

    lo, hi = orders.agg(
        F.min("o_custkey"), F.max("o_custkey")
    ).collect()[0]
    domain = hi - lo
    # unsorted: every file spans ~the whole domain (≥2 domains total);
    # sorted: the 4 ranges partition the domain (≈1 domain total)
    assert span_sum(flat) >= 2 * domain
    assert span_sum(sorted_) <= 1.1 * domain


def test_observed_write_collects_qc_on_the_write_job(spark, tmp_path):
    """df.observe metrics ride the write action — no second scan; the
    counters must match what a (deliberately re-scanning) check finds."""
    from pyspark.sql import functions as F

    from sparkify_datalake_spark.operators.pipeline import observed_write

    df = spark.range(100).select(
        F.col("id"),
        F.when(F.col("id") % 10 == 0, None)
        .otherwise(F.col("id").cast("double"))
        .alias("v"),
    )
    out = str(tmp_path / "qc_out")
    metrics = observed_write(
        df, out, {"v_max": F.max("v")}
    )
    assert metrics["n_rows"] == 100
    assert metrics["n_null_v"] == 10
    assert metrics["n_null_id"] == 0
    assert metrics["v_max"] == 99.0
    back = spark.read.parquet(out)
    assert back.count() == 100
    assert back.filter("v IS NULL").count() == 10


def test_orc_roundtrip_with_pushdown(spark, sf_dir, tmp_path):
    """ORC round-trips the orders table and its reader honors filter
    pushdown + column pruning like the Parquet path."""
    from sparkify_datalake_spark.sources.load import load
    from sparkify_datalake_spark.sources.sinks import read_orc, write_orc

    orders = load(spark, sf_dir, "orders")
    path = str(tmp_path / "orders_orc")
    write_orc(orders, path)
    back = read_orc(spark, path)
    assert back.count() == orders.count()
    assert back.schema == orders.schema
    filtered = back.filter("o_orderstatus = 'F'").select(
        "o_orderkey", "o_orderstatus"
    )
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "o_orderstatus" in plan
    assert "ReadSchema: struct<o_orderkey:bigint,o_orderstatus:string>" \
        in plan
    assert filtered.count() == orders.filter("o_orderstatus = 'F'").count()


def test_star_etl_layout_and_byte_stability(spark, sf_dir):
    """pipeline_star_etl (SURVEY §2 round 8): the partitioned star sink
    must (a) lay out one directory per event_date with exactly one
    data file each (repartition-by-key + sortWithinPartitions), and
    (b) be BYTE-stable across reruns — same partition dirs, same
    per-partition content hashes — because every stage is a
    deterministic function of the input (md5 keys, total sort, no
    timestamps/uuids in the data path). Quarantine must have kept the
    corrupt shard out of the star."""
    import hashlib
    import os

    from sparkify_datalake_spark.registry import queries

    q = queries()["pipeline_star_etl"]
    base = os.path.join(
        "/tmp/sparkify_star_etl",
        os.path.basename(os.path.normpath(sf_dir)),
    )
    fact_dir = os.path.join(base, "fact_events")

    def layout():
        out = {}
        for d in sorted(os.listdir(fact_dir)):
            if not d.startswith("event_date="):
                continue
            files = sorted(
                f
                for f in os.listdir(os.path.join(fact_dir, d))
                if f.endswith(".parquet")
            )
            hashes = tuple(
                hashlib.md5(
                    open(os.path.join(fact_dir, d, f), "rb").read()
                ).hexdigest()
                for f in files
            )
            out[d] = (len(files), hashes)
        return out

    first_rows = sorted(tuple(r) for r in q(spark, sf_dir).collect())
    first = layout()
    assert first, "no event_date= partition dirs written"
    assert all(n == 1 for n, _ in first.values()), (
        "expected exactly one data file per partition dir: "
        f"{ {d: n for d, (n, _) in first.items() if n != 1} }"
    )

    second_rows = sorted(tuple(r) for r in q(spark, sf_dir).collect())
    second = layout()
    assert first == second, "rerun changed partition layout or bytes"
    assert first_rows == second_rows

    # the corrupt shard was quarantined, not loaded: no NULL event_ids
    back = spark.read.parquet(fact_dir)
    assert back.filter("event_id IS NULL").count() == 0
