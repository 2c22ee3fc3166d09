"""Bloom-pruned join: no false negatives ever, measured pruning on real
testdata, and bit-identical results vs the plain join."""

from __future__ import annotations

from pyspark.sql import functions as F

from sample_data_pipeline_project_spark.operators.bloomjoin import (
    bloom_might_contain,
    bloom_pruned_join,
    build_bloom,
)
from sample_data_pipeline_project_spark.sources.catalog import load_table

_SF_DIR = "/root/testdata/sf0.001"


def test_no_false_negatives(spark):
    build = spark.range(0, 500).select((F.col("id") * 7).alias("k"))
    blocks = build_bloom(build, "k", m_bits=1 << 14)
    probe = spark.range(0, 4000).select(F.col("id").alias("k"))
    admitted = {
        r["k"]
        for r in probe.filter(
            bloom_might_contain(F.col("k"), blocks, 1 << 14)
        ).collect()
    }
    true_keys = {r["k"] for r in build.collect()}
    assert true_keys <= admitted  # every real key passes the filter


def test_pruned_join_matches_plain_join_and_prunes(spark):
    l = load_table(spark, _SF_DIR, "lineitem")
    o = load_table(spark, _SF_DIR, "orders").filter(
        (F.col("o_orderpriority") == "1-URGENT") & (F.col("o_totalprice") > 150000)
    )
    pruned = bloom_pruned_join(l, o, "l_orderkey", "o_orderkey", m_bits=1 << 17)
    plain = l.join(o, l["l_orderkey"] == o["o_orderkey"])
    got = {tuple(r) for r in pruned.select("l_orderkey", "l_linenumber").collect()}
    want = {tuple(r) for r in plain.select("l_orderkey", "l_linenumber").collect()}
    assert got == want and len(got) > 0

    # the filter must actually prune: admitted fraction ~ |build|/|probe-keys|
    # plus the fp rate, far below 1 on this selective build side
    blocks = build_bloom(o, "o_orderkey", 1 << 17)
    admitted = l.filter(
        bloom_might_contain(F.col("l_orderkey"), blocks, 1 << 17)
    ).count()
    assert admitted < 0.5 * l.count()


def test_probe_filter_sits_on_scan(spark):
    """The membership predicate must appear as a Filter over the probe
    scan (before the join), not after it."""
    l = load_table(spark, _SF_DIR, "lineitem")
    o = load_table(spark, _SF_DIR, "orders").filter(F.col("o_totalprice") > 400000)
    plan = (
        bloom_pruned_join(l, o, "l_orderkey", "o_orderkey", 1 << 14)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # xxhash64 only exists in the bloom predicate; it must precede the join
    # in the physical plan text (children print after parents).
    assert "xxhash64" in plan
    join_pos = plan.find("Join")
    hash_pos = plan.find("xxhash64")
    assert join_pos != -1 and hash_pos > join_pos  # predicate inside join's child subtree
