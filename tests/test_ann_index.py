"""Persisted IVF index: probe matches the in-memory operator, the
cluster filter prunes partitions at planning time, rebuild overwrites."""

from __future__ import annotations

from pyspark.sql import functions as F

from sample_data_pipeline_project_spark.operators.ann_index import (
    build_ivf_index,
    ivf_index_topk,
)
from sample_data_pipeline_project_spark.operators.kmeans import kmeans_ivf_topk
from sample_data_pipeline_project_spark.plans.introspect import partition_filters
from sample_data_pipeline_project_spark.sources.catalog import load_table

_SF = "/root/testdata/sf0.001"


def _corpus_query(spark):
    emb = load_table(spark, _SF, "embeddings")
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q_emb"))
    corpus = emb.filter(F.col("vec_id") != 0)
    return corpus, q


def test_index_probe_matches_in_memory_operator(spark, tmp_path):
    corpus, q = _corpus_query(spark)
    path = str(tmp_path / "ivf")
    build_ivf_index(corpus, path, k_clusters=8, max_iters=3)
    from_index = [
        (r["vec_id"], r["cosine_sim"])
        for r in ivf_index_topk(spark, path, q, top_k=10, nprobe=2).collect()
    ]
    in_memory = [
        (r["vec_id"], r["cosine_sim"])
        for r in kmeans_ivf_topk(
            corpus, q, k_clusters=8, top_k=10, nprobe=2, max_iters=3
        ).collect()
    ]
    assert from_index == in_memory and len(from_index) == 10


def test_probe_scan_is_partition_pruned(spark, tmp_path):
    corpus, q = _corpus_query(spark)
    path = str(tmp_path / "ivf")
    build_ivf_index(corpus, path, k_clusters=8, max_iters=1)
    df = ivf_index_topk(spark, path, q, top_k=5, nprobe=2)
    pf = partition_filters(df)
    assert any("cluster" in f for f in pf), pf


def test_rebuild_overwrites(spark, tmp_path):
    corpus, q = _corpus_query(spark)
    path = str(tmp_path / "ivf")
    build_ivf_index(corpus, path, k_clusters=4, max_iters=1)
    first = {r["vec_id"] for r in ivf_index_topk(spark, path, q, 5, 1).collect()}
    build_ivf_index(corpus, path, k_clusters=8, max_iters=3)
    again = {r["vec_id"] for r in ivf_index_topk(spark, path, q, 5, 2).collect()}
    assert len(first) == 5 and len(again) == 5
