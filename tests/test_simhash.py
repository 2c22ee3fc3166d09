"""SimHash fingerprints and banded near-dup pairs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sample_data_pipeline_project_spark.operators.dedup import (
    simhash_fingerprints,
    simhash_pairs,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta"),
        (2, "alpha beta gamma delta epsilon zeta eta iota"),   # 1 token differs
        (3, "alpha beta gamma delta epsilon zeta eta theta"),  # exact dup of 1
        (4, "completely unrelated vocabulary forms this document body here"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_identical_docs_identical_fingerprints(docs):
    fp = {r["doc_id"]: r["simhash"] for r in simhash_fingerprints(docs).collect()}
    assert fp[1] == fp[3]
    assert 0 <= fp[1] < (1 << 32)


def test_exact_dups_always_pair_at_zero_hamming(docs):
    rows = simhash_pairs(docs, max_hamming=3).collect()
    got = {(r["a"], r["b"]): r["hamming"] for r in rows}
    assert got.get((1, 3)) == 0
    for (a, b), h in got.items():
        assert a < b and h <= 3


def test_banding_is_exact_vs_quadratic(docs, spark):
    """Banded candidates + verify must equal the brute-force quadratic."""
    fp = simhash_fingerprints(docs)
    a = fp.select(F.col("doc_id").alias("a"), F.col("simhash").alias("sh_a"))
    b = fp.select(F.col("doc_id").alias("b"), F.col("simhash").alias("sh_b"))
    brute = (
        a.join(b, F.col("a") < F.col("b"))
        .withColumn("hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).cast("long"))
        .filter(F.col("hamming") <= 3)
    )
    expected = {(r["a"], r["b"]): r["hamming"] for r in brute.collect()}
    got = {(r["a"], r["b"]): r["hamming"] for r in simhash_pairs(docs, 3).collect()}
    assert got == expected


def test_max_hamming_must_stay_exact():
    with pytest.raises(ValueError, match="exactness requires"):
        simhash_pairs(None, max_hamming=4, bands=4)
