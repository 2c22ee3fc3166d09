"""Sketch accuracy: approximate aggregates must land inside their
documented error bounds against exact computation on real data."""

from __future__ import annotations

from pyspark.sql import functions as F

from sample_data_pipeline_project_spark.sources.catalog import load_table

_SF = "/root/testdata/sf0.01"


def test_hll_within_rsd_bounds(spark):
    e = load_table(spark, _SF, "events")
    rows = (
        e.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.02).alias("approx"),
            F.count_distinct("user_id").alias("exact"),
        )
        .collect()
    )
    assert rows
    for r in rows:
        rel_err = abs(r["approx"] - r["exact"]) / r["exact"]
        assert rel_err <= 0.06, (r["event_type"], r["approx"], r["exact"])  # 3x rsd


def test_approx_percentile_within_accuracy(spark):
    o = load_table(spark, _SF, "orders")
    row = o.agg(
        F.percentile_approx("o_totalprice", 0.5, 1000).alias("approx"),
        F.expr("percentile(o_totalprice, 0.5)").alias("exact"),
    ).first()
    # percentile_approx(accuracy=1000) guarantees rank error <= n/1000;
    # translate to a loose value tolerance on this distribution
    assert abs(row["approx"] - row["exact"]) / row["exact"] < 0.05


def test_hll_mergeable_rollup_matches_direct_estimate(spark):
    """Union of hour-grain sketches must estimate within HLL error of the
    exact distinct count — mergeability is what makes the sketch-table
    rollup correct."""
    from sample_data_pipeline_project_spark.workloads import load_all

    rows = load_all()["sketch_hll_mergeable_rollup"].fn(spark, _SF).collect()
    assert rows
    for r in rows:
        # union_ok IS the 5% bound, computed inside the workload so the
        # driver's hash certifies it; exact_users sanity-checked alongside.
        assert r["union_ok"], (r["event_type"], r["exact_users"])
        assert r["exact_users"] > 0


def test_heavy_hitter_tokens_exact_at_capacity(spark):
    """With tracked capacity >= vocabulary the frequent-items sketch
    degrades to exact counts — pin it against explode+groupBy."""
    from sample_data_pipeline_project_spark.functions.text import tokens
    from sample_data_pipeline_project_spark.workloads import load_all

    got = {
        (r["tok"], r["approx_count"])
        for r in load_all()["sketch_heavy_hitter_tokens"].fn(spark, _SF).collect()
    }
    d = load_table(spark, _SF, "documents")
    exact = (
        d.select(F.explode(tokens("text")).alias("tok"))
        .groupBy("tok")
        .count()
        .orderBy(F.col("count").desc(), F.col("tok").asc())
        .limit(20)
        .collect()
    )
    assert {(r["tok"], r["count"]) for r in exact} == got
