"""TokenChunker UDTF: fan-out semantics and edge cases."""

from __future__ import annotations

from pyspark.sql import functions as F

from sample_data_pipeline_project_spark.operators.chunking import register_chunker


def _chunks(spark, text, size, stride):
    register_chunker(spark)
    spark.createDataFrame([(text,)], "text string").createOrReplaceTempView("_t")
    return [
        (r["chunk_idx"], r["chunk_text"], r["chunk_tokens"])
        for r in spark.sql(
            f"SELECT c.* FROM _t, LATERAL token_chunker(text, {size}, {stride}) c "
            "ORDER BY c.chunk_idx"
        ).collect()
    ]


def test_tiling_when_stride_equals_size(spark):
    got = _chunks(spark, "a b c d e f g", 3, 3)
    assert got == [(0, "a b c", 3), (1, "d e f", 3), (2, "g", 1)]


def test_overlap_when_stride_below_size(spark):
    got = _chunks(spark, "a b c d e", 4, 2)
    assert got == [(0, "a b c d", 4), (1, "c d e", 3), (2, "e", 1)]


def test_short_doc_single_chunk(spark):
    assert _chunks(spark, "only two", 32, 16) == [(0, "only two", 2)]


def test_null_and_degenerate_params_yield_nothing(spark):
    register_chunker(spark)
    df = spark.createDataFrame([(None,), ("a b",)], "text string")
    df.createOrReplaceTempView("_t2")
    rows = spark.sql(
        "SELECT c.* FROM _t2, LATERAL token_chunker(text, 0, 1) c"
    ).collect()
    assert rows == []
    # NULL text contributes no rows even with valid params
    rows = spark.sql(
        "SELECT c.* FROM _t2, LATERAL token_chunker(text, 2, 2) c"
    ).collect()
    assert len(rows) == 1 and rows[0]["chunk_text"] == "a b"


def test_whitespace_normalization_matches_tokenizer(spark):
    # Leading/trailing/multiple spaces collapse exactly like trim + \s+ split
    got = _chunks(spark, "  x   y  ", 32, 16)
    assert got == [(0, "x y", 2)]


def test_chunk_count_formula(spark):
    register_chunker(spark)
    df = spark.createDataFrame(
        [(i, " ".join("t" * 1 for _ in range(n)),) for i, n in enumerate([1, 16, 17, 33, 48])],
        "doc_id long, text string",
    )
    df.createOrReplaceTempView("_t3")
    got = {
        r["doc_id"]: r["n"]
        for r in spark.sql(
            "SELECT doc_id, COUNT(*) AS n FROM _t3, "
            "LATERAL token_chunker(text, 32, 16) GROUP BY doc_id"
        ).collect()
    }
    # n_chunks = ceil(n_tokens / stride) = (n-1)//16 + 1
    assert got == {0: 1, 1: 1, 2: 2, 3: 3, 4: 3}
    # spot-check against the aggregate over per-chunk starts
    assert (
        spark.sql(
            "SELECT SUM(c.chunk_tokens) AS s FROM _t3, "
            "LATERAL token_chunker(text, 16, 16) c WHERE doc_id = 4"
        ).first()["s"]
        == 48
    )
