"""Curation workloads: repeated-span detection, hash split, target-mix
resampling, length-bucketed batching, semantic dedup — semantics pinned on
constructed fixtures (the oracle gate covers the testdata parity)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from sample_data_pipeline_project_spark.workloads.curation_queries import (
    _BATCH_TOKEN_BUDGET,
    _MIX_FAVORED,
    dedup_repeated_ngram_spans,
    sim_semantic_dedup,
    split_train_holdout_report,
    text_length_bucket_batches,
    text_target_mix_resample,
)


def _write_docs(spark, tmp_path, rows):
    df = spark.createDataFrame(
        [(i, t, "en", s, len(t)) for i, (t, s) in enumerate(rows)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_repeated_spans_marks_shared_window_only(spark, tmp_path):
    shared = "w1 w2 w3 w4 w5 w6 w7 w8"  # exactly one 8-token window
    rows = [
        (shared + " tailA only here", "s"),  # 11 tokens -> 4 windows
        ("leadB " + shared, "s"),  # 9 tokens -> 2 windows
        ("u1 u2 u3 u4 u5 u6 u7 u8 u9", "s"),  # unique 9 tokens -> 2 windows
        ("too short", "s"),  # < 8 tokens -> no rows
    ]
    sf = _write_docs(spark, tmp_path, rows)
    got = {
        r["doc_id"]: r.asDict()
        for r in dedup_repeated_ngram_spans(spark, sf).collect()
    }
    assert set(got) == {0, 1, 2}
    assert got[0]["n_windows"] == 4 and got[0]["n_dup_windows"] == 1
    assert got[1]["n_windows"] == 2 and got[1]["n_dup_windows"] == 1
    assert got[0]["n_dup_spans"] == 1 and got[1]["n_dup_spans"] == 1
    assert got[2]["n_dup_windows"] == 0 and got[2]["n_dup_spans"] == 0
    assert math.isclose(got[0]["dup_window_fraction"], 1 / 4)


def test_split_report_shares_sum_to_one_and_deterministic(spark, tmp_path):
    rows = [(f"tok{i} a b c d", f"src{i % 3}") for i in range(300)]
    sf = _write_docs(spark, tmp_path, rows)
    out1 = split_train_holdout_report(spark, sf).collect()
    out2 = split_train_holdout_report(spark, sf).collect()
    assert sorted(map(tuple, out1)) == sorted(map(tuple, out2))
    by_src = {}
    for r in out1:
        by_src.setdefault(r["source"], []).append(r)
    for src, recs in by_src.items():
        assert math.isclose(sum(r["doc_share"] for r in recs), 1.0)
        assert {r["split"] for r in recs} <= {"train", "validation", "test"}
        train = [r for r in recs if r["split"] == "train"]
        assert train and train[0]["n_docs"] >= 0.8 * sum(r["n_docs"] for r in recs)


def test_target_mix_favored_sources_keep_all(spark, tmp_path):
    # 4 favored sources at 25 docs each + 16 rest sources at 25 each ->
    # favored keep prob = min(1, 40/400 * 500/25) = 1; rest = 15/400*20 = .75
    rows = []
    for s in range(20):
        for i in range(25):
            rows.append((f"doc {s} {i} filler words", f"src{s}"))
    sf = _write_docs(spark, tmp_path, rows)
    out = text_target_mix_resample(spark, sf)
    fav = out.filter(F.col("source").isin(*_MIX_FAVORED))
    assert fav.count() == fav.filter("is_kept").count()  # threshold >= 2^32
    rest = out.filter(~F.col("source").isin(*_MIX_FAVORED))
    kept_frac = rest.filter("is_kept").count() / rest.count()
    assert 0.6 < kept_frac < 0.9  # targets 0.75, md5-uniform
    # keep decision is a pure function of doc_id: recompute agrees
    recheck = out.filter(
        (F.col("hash_u32") < F.col("keep_threshold")) != F.col("is_kept")
    )
    assert recheck.count() == 0


def test_length_buckets_capacity_and_batch_occupancy(spark, tmp_path):
    rows = [("t " * (i % 100 + 1), "s") for i in range(400)]
    sf = _write_docs(spark, tmp_path, rows)
    out = text_length_bucket_batches(spark, sf).collect()
    for r in out:
        assert r["bucket_cap"] >= min(r["n_tokens"], 2048)
        assert r["padding_tokens"] == r["bucket_cap"] - min(
            r["n_tokens"], r["bucket_cap"]
        )
        assert r["bucket_cap"] in (16, 32, 64, 128, 256, 512, 1024, 2048)
    # no (bucket, shard, batch) exceeds its doc capacity
    occupancy = {}
    for r in out:
        key = (r["bucket_cap"], r["shard"], r["batch_idx"])
        occupancy[key] = occupancy.get(key, 0) + 1
    for (cap, _, _), n in occupancy.items():
        assert n <= _BATCH_TOKEN_BUDGET // cap


def test_semantic_dedup_one_representative_per_cluster(spark, tmp_path):
    # two tight clusters + one singleton, unit vectors in 4-d
    vecs = [
        (0, [1.0, 0.0, 0.0, 0.0], 0),
        (1, [0.999, 0.04, 0.0, 0.0], 0),
        (2, [0.0, 1.0, 0.0, 0.0], 1),
        (3, [0.02, 0.999, 0.0, 0.0], 1),
        (4, [0.0, 0.0, 1.0, 0.0], 2),
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>, label int")
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "embeddings.parquet")
    )
    out = sim_semantic_dedup(spark, str(tmp_path)).collect()
    comp = {r["vec_id"]: r["component_id"] for r in out}
    assert comp[0] == comp[1] == 0
    assert comp[2] == comp[3] == 2
    assert comp[4] == 4
    kept = {r["vec_id"] for r in out if r["is_kept"]}
    assert kept == {0, 2, 4}
    sizes = {r["component_id"]: r["n_members"] for r in out}
    assert sizes == {0: 2, 2: 2, 4: 1}


def test_word_bigrams_short_doc_safe(spark):
    """Regression: the index-range bigram form crashed under ANSI on
    docs with < 2 tokens (Spark's sequence(1, 0) DESCENDS to [1, 0] and
    t[i] goes out of bounds). The zip-of-slices helper must give an
    empty array instead."""
    from pyspark.sql import functions as F

    from sample_data_pipeline_project_spark.functions.text import word_bigrams

    rows = [(["x"],), ([],), (["a", "b"],), (["a", "b", "a"],)]
    df = spark.createDataFrame(rows, "t array<string>")
    got = [
        [(p["w1"], p["w2"]) for p in r["b"]]
        for r in df.select(word_bigrams("t").alias("b")).collect()
    ]
    assert got == [[], [], [("a", "b")], [("a", "b"), ("b", "a")]]


def test_word_ngrams_short_doc_safe(spark):
    from sample_data_pipeline_project_spark.functions.text import word_ngrams

    rows = [(["a", "b", "c"],), (["a"],)]
    df = spark.createDataFrame(rows, "t array<string>")
    got = [r["g"] for r in df.select(word_ngrams("t", 5).alias("g")).collect()]
    assert got == [[], []]
