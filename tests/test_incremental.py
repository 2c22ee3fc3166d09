"""Incremental partial-aggregate merge: snapshot+delta must equal the
full recompute, including keys present on only one side."""

from __future__ import annotations

from pyspark.sql import functions as F

from sample_data_pipeline_project_spark.operators.incremental import (
    merge_partial_aggs,
)


def _partial(df):
    return df.groupBy("k").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("v").cast("decimal(18,6)")).alias("s"),
        F.min("v").alias("mn"),
        F.max("v").alias("mx"),
    )


def test_merge_equals_full_recompute(spark):
    rows = [("a", 1.5), ("a", 2.5), ("b", 1.0), ("c", 4.0), ("d", -1.0)]
    df = spark.createDataFrame(rows, "k string, v double")
    state = _partial(df.filter(F.col("v") <= 1.5))   # a(1.5), b, d
    delta = _partial(df.filter(F.col("v") > 1.5))    # a(2.5), c
    merged = merge_partial_aggs(
        state, delta, key_cols=["k"], sum_cols=["n", "s"],
        min_cols=["mn"], max_cols=["mx"],
    )
    full = _partial(df)
    got = {tuple(r) for r in merged.collect()}
    want = {tuple(r) for r in full.collect()}
    assert got == want
    assert len(got) == 4  # b/d state-only, c delta-only, a merged
