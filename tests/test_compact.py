"""Small-file compaction: data parity, file-count reduction, partition
layout preservation, and snapshot-committed (atomic) compaction."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from sample_data_pipeline_project_spark.sources.compact import (
    compact_dir,
    compact_snapshot,
)
from sample_data_pipeline_project_spark.sources.snapshots import (
    snapshot_read,
    snapshot_write,
)


def _n_parquet(path):
    return sum(
        f.endswith(".parquet") and not f.startswith(".")
        for _, _, fs in os.walk(path)
        for f in fs
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_compact_dir_reduces_files_keeps_rows(spark, tmp_path):
    path = str(tmp_path / "frag")
    df = spark.range(10_000).withColumn("v", F.col("id") * 2)
    df.repartition(32).write.parquet(path)
    assert _n_parquet(path) == 32
    before = _rows(spark.read.parquet(path))

    report = compact_dir(spark, path, target_bytes=1 << 30)
    assert len(report) == 1 and report[0]["files_before"] == 32
    assert report[0]["files_after"] == 1
    assert _n_parquet(path) == 1
    assert _rows(spark.read.parquet(path)) == before


def test_compact_dir_respects_target_size(spark, tmp_path):
    path = str(tmp_path / "sized")
    spark.range(50_000).withColumn("v", F.rand(7)).repartition(16).write.parquet(path)
    files = [
        os.path.join(d, f)
        for d, _, fs in os.walk(path)
        for f in fs
        if f.endswith(".parquet")
    ]
    total = sum(os.path.getsize(f) for f in files)
    target = total // 3  # should pack into ceil(total/target)=4 files at most
    compact_dir(spark, path, target_bytes=target)
    n = _n_parquet(path)
    assert 2 <= n <= 4
    assert spark.read.parquet(path).count() == 50_000


def test_compact_dir_partitioned_per_leaf(spark, tmp_path):
    path = str(tmp_path / "part")
    df = spark.range(8_000).withColumn("p", (F.col("id") % 4).cast("int"))
    df.repartition(8).write.partitionBy("p").parquet(path)
    assert _n_parquet(path) > 4
    before = _rows(spark.read.parquet(path).select("id", "p"))

    report = compact_dir(spark, path, target_bytes=1 << 30)
    assert len(report) == 4  # one compaction per partition leaf
    assert _n_parquet(path) == 4
    after_df = spark.read.parquet(path)
    # partition column still directory-encoded and readable
    assert set(after_df.columns) == {"id", "p"}
    assert _rows(after_df.select("id", "p")) == before


def test_compact_dir_noop_when_already_compact(spark, tmp_path):
    path = str(tmp_path / "compacted")
    spark.range(1000).coalesce(1).write.parquet(path)
    assert compact_dir(spark, path, target_bytes=1 << 30) == []
    assert _n_parquet(path) == 1


def test_compact_snapshot_commits_new_version(spark, tmp_path):
    path = str(tmp_path / "snap")
    for i in range(5):
        snapshot_write(
            spark.range(i * 100, (i + 1) * 100).repartition(4), path, mode="append"
        )
    frag = snapshot_read(spark, path)
    assert len(frag.inputFiles()) == 20
    before = _rows(frag)

    out = compact_snapshot(spark, path, target_bytes=1 << 30)
    assert out["files_before"] == 20 and out["files_after"] == 1
    assert _rows(snapshot_read(spark, path)) == before  # latest == compacted
    # time travel still works: version 5 (pre-compaction) is intact
    assert _rows(snapshot_read(spark, path, 5)) == before
