"""Salted skew join: row-identical to the plain join, including left-join
null rows, with deterministic salting (retry-safe)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sample_data_pipeline_project_spark.operators.skewjoin import salted_join


def _fixtures(spark):
    # 10k fact rows, 90% on one hot key
    fact = spark.range(10_000).select(
        F.col("id").alias("row_id"),
        F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(F.col("id") % 100).alias("k"),
        (F.col("id") * 3).alias("payload"),
    )
    dim = spark.range(100).select(
        F.col("id").alias("k"), F.concat(F.lit("d"), F.col("id")).alias("attr")
    )
    return fact, dim


def _rows(df):
    return sorted(tuple(r) for r in df.select("row_id", "k", "payload", "attr").collect())


def test_inner_equals_plain_join(spark):
    fact, dim = _fixtures(spark)
    got = salted_join(fact, dim, key="k", salt_from="row_id", n_salts=8)
    expected = fact.join(dim, "k", "inner")
    assert _rows(got) == _rows(expected)


def test_left_keeps_unmatched_fact_rows(spark):
    fact, dim = _fixtures(spark)
    small_dim = dim.filter(F.col("k") < 50)
    got = salted_join(fact, small_dim, key="k", salt_from="row_id", how="left")
    expected = fact.join(small_dim, "k", "left")
    assert _rows(got) == _rows(expected)
    assert got.filter(F.col("attr").isNull()).count() > 0


def test_salt_spreads_hot_key(spark):
    fact, dim = _fixtures(spark)
    salted = fact.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col("row_id")), F.lit(8))
    )
    per_shard = (
        salted.filter(F.col("k") == 7).groupBy("__salt").count().collect()
    )
    assert len(per_shard) == 8  # the hot key occupies every shard
    counts = [r["count"] for r in per_shard]
    assert max(counts) < sum(counts) * 0.25  # no shard owns the key


def test_unsupported_join_type_rejected(spark):
    fact, dim = _fixtures(spark)
    with pytest.raises(ValueError):
        salted_join(fact, dim, key="k", salt_from="row_id", how="full")
