"""Partition-hygiene helpers (operators/partitioning.py, rounds 11/12)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sample_data_pipeline_project_spark.operators.partitioning import (
    checkpoint_capped,
    widen,
)


def test_checkpoint_capped_preserves_rows_and_caps_reads(spark):
    # a deliberately over-partitioned tiny frame: the checkpoint must
    # materialize it, and downstream reads must see <= core-count
    # partitions (the frame is far below the per-task byte budget)
    df = spark.range(0, 1000).repartition(64).withColumn(
        "v", F.col("id") * 2
    )
    out = checkpoint_capped(df)
    assert out.rdd.getNumPartitions() <= max(
        1, spark.sparkContext.defaultParallelism
    )
    rows = {(r["id"], r["v"]) for r in out.collect()}
    assert rows == {(i, 2 * i) for i in range(1000)}


def test_checkpoint_capped_storage_level_roundtrip(spark):
    from pyspark import StorageLevel

    df = spark.range(0, 100).repartition(16)
    out = checkpoint_capped(df, StorageLevel.DISK_ONLY)
    assert out.count() == 100


def test_widen_is_noop_on_plans_with_exchanges(spark):
    # an aggregated frame has an Exchange: widen() must NOT probe .rdd
    # (that would execute the shuffle at construction time) and must
    # return the frame unchanged
    agg = spark.range(0, 100).groupBy((F.col("id") % 10).alias("k")).count()
    assert widen(agg) is agg


def test_widen_widens_single_partition_scan_frames(spark):
    narrow = spark.range(0, 100).coalesce(1)
    out = widen(narrow)
    target = max(1, spark.sparkContext.defaultParallelism)
    assert out.rdd.getNumPartitions() == target
    assert out.count() == 100
