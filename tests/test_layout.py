"""Clustered parquet layout: row-group min/max pruning must actually
narrow the scan (runtime metric, not just plan text)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sample_data_pipeline_project_spark.plans.introspect import scan_output_rows
from sample_data_pipeline_project_spark.sources.catalog import load_table
from sample_data_pipeline_project_spark.sources.layout import write_clustered


def test_clustered_layout_prunes_row_groups(spark, tmp_path):
    e = load_table(spark, "/root/testdata/sf0.01", "events").select(
        "event_id", "user_id", "value"
    )
    # Small row groups so a 10k-row table has many prunable units.
    # (runtime spark.conf.set("spark.hadoop.*") does NOT reach the
    # parquet writer — set the live hadoopConfiguration instead)
    hc = spark.sparkContext._jsc.hadoopConfiguration()
    hc.set("parquet.block.size", str(16 * 1024))
    try:
        e.repartition(4).write.mode("overwrite").parquet(str(tmp_path / "arrival"))
        write_clustered(e, str(tmp_path / "clustered"), ["user_id"], num_files=4)
    finally:
        hc.unset("parquet.block.size")

    def rows_read(path):
        df = spark.read.parquet(path).filter(F.col("user_id") == 7)
        # metrics live on THIS plan object — execute it, not a derived count
        assert len(df.collect()) > 0
        return scan_output_rows(df)

    arrival = rows_read(str(tmp_path / "arrival"))
    clustered = rows_read(str(tmp_path / "clustered"))
    # arrival order: every row group spans the key domain -> no pruning.
    # clustered: only the row group(s) containing user 7 are read.
    assert clustered < arrival / 2, (clustered, arrival)


def test_clustered_layout_same_results(spark, tmp_path):
    e = load_table(spark, "/root/testdata/sf0.01", "events").select(
        "event_id", "user_id", "value"
    )
    write_clustered(e, str(tmp_path / "c2"), ["user_id", "event_id"])
    back = spark.read.parquet(str(tmp_path / "c2"))
    assert back.count() == e.count()
    a = {r["event_id"] for r in e.filter("user_id = 3").collect()}
    b = {r["event_id"] for r in back.filter("user_id = 3").collect()}
    assert a == b


def test_zorder_prunes_on_both_columns(spark, tmp_path):
    """Z-ordered layout must narrow the scan for predicates on EITHER
    interleaved column — the property a single-column sort cannot give."""
    from sample_data_pipeline_project_spark.sources.layout import write_zordered

    e = (
        load_table(spark, "/root/testdata/sf0.01", "events")
        .select(
            "event_id",
            "user_id",
            F.dayofyear("ts").alias("day_no"),
        )
    )
    hc = spark.sparkContext._jsc.hadoopConfiguration()
    hc.set("parquet.block.size", str(16 * 1024))
    try:
        e.repartition(4).write.mode("overwrite").parquet(str(tmp_path / "arr"))
        write_zordered(e, str(tmp_path / "zo"), ["user_id", "day_no"], num_files=2)
    finally:
        hc.unset("parquet.block.size")

    def rows_read(path, cond):
        df = spark.read.parquet(path).filter(cond)
        assert len(df.collect()) > 0
        return scan_output_rows(df)

    for cond in (F.col("user_id") == 7, F.col("day_no") == 15):
        arr = rows_read(str(tmp_path / "arr"), cond)
        zo = rows_read(str(tmp_path / "zo"), cond)
        assert zo < arr, (str(cond), zo, arr)


def test_zorder_value_interleaves_bits(spark):
    from sample_data_pipeline_project_spark.sources.layout import zorder_value

    rows = spark.createDataFrame(
        [(0b101, 0b011)], "a long, b long"
    ).select(zorder_value(["a", "b"], bits=3).alias("z")).collect()
    # a bits -> even positions, b bits -> odd: a=101, b=011 ->
    # z = b2 a2 b1 a1 b0 a0 = 0 1 1 0 1 1 = 0b011011
    assert rows[0]["z"] == 0b011011
