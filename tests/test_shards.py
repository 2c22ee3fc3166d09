"""Training-shard writer: determinism across runs, balance under skew,
partition pruning on read, seed independence."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from sample_data_pipeline_project_spark.sources.shards import (
    read_shard,
    write_training_shards,
)


def _shard_contents(spark, path):
    out = {}
    df = spark.read.parquet(path)
    for r in df.collect():
        out.setdefault(r["shard"], set()).add(r["id"])
    return out


def test_reruns_are_identical(spark, tmp_path):
    df = spark.range(5_000).withColumn("v", F.col("id") * 7)
    p1, p2 = str(tmp_path / "a"), str(tmp_path / "b")
    write_training_shards(df, p1, key="id", n_shards=8, seed=42)
    # different partitioning of the same data must not change placement
    write_training_shards(df.repartition(17), p2, key="id", n_shards=8, seed=42)
    assert _shard_contents(spark, p1) == _shard_contents(spark, p2)


def test_union_of_shards_is_input_and_balanced(spark, tmp_path):
    path = str(tmp_path / "s")
    write_training_shards(spark.range(10_000), path, key="id", n_shards=10)
    contents = _shard_contents(spark, path)
    assert len(contents) == 10
    all_ids = set().union(*contents.values())
    assert all_ids == set(range(10_000))
    sizes = sorted(len(v) for v in contents.values())
    assert sizes[0] > 800 and sizes[-1] < 1200  # xxhash64 keeps shards even


def test_seed_changes_permutation(spark, tmp_path):
    df = spark.range(2_000)
    p1, p2 = str(tmp_path / "e0"), str(tmp_path / "e1")
    write_training_shards(df, p1, key="id", n_shards=4, seed=0)
    write_training_shards(df, p2, key="id", n_shards=4, seed=1)
    assert _shard_contents(spark, p1) != _shard_contents(spark, p2)


def test_one_file_per_shard_and_pruned_read(spark, tmp_path):
    path = str(tmp_path / "f")
    write_training_shards(spark.range(1_000), path, key="id", n_shards=4)
    for k in range(4):
        d = os.path.join(path, f"shard={k}")
        files = [f for f in os.listdir(d) if f.endswith(".parquet")]
        assert len(files) == 1
    one = read_shard(spark, path, 2)
    # partition pruning: the shard predicate lands in PartitionFilters
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert "shard" in plan.split("PartitionFilters", 1)[1].split("]", 1)[0]
    assert one.count() > 0


def test_within_shard_order_is_deterministic(spark, tmp_path):
    df = spark.range(3_000)
    p1, p2 = str(tmp_path / "o1"), str(tmp_path / "o2")
    write_training_shards(df, p1, key="id", n_shards=2, seed=9)
    write_training_shards(df.repartition(13), p2, key="id", n_shards=2, seed=9)
    for k in range(2):
        a = [r["id"] for r in read_shard(spark, p1, k).collect()]
        b = [r["id"] for r in read_shard(spark, p2, k).collect()]
        assert a == b  # same rows, same ORDER, independent of input layout
        assert a != sorted(a)  # and it is a shuffle, not the identity order
