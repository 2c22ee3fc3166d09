"""Similarity search over embedding columns (B3).

Brute-force cosine top-k is the exact baseline: a broadcast of the query
vector against a single scan of the corpus — embarrassingly parallel, no
shuffle except the final top-k merge (TakeOrderedAndProject: per-partition
heap + driver merge, never a global sort).

The scale path is IVF (inverted-file) coarse quantization: vectors are
assigned to their nearest centroid once (write-time in a real deployment;
here computed on the fly), and a query probes only `nprobe` nearest
centroid buckets — turning O(N) scans into O(N * nprobe / C). Centroid
choice here is deterministic (the first C vectors by id) so the oracle can
replicate it; swap in k-means offline for real recall.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sample_data_pipeline_project_spark.functions.vectors import cosine, dot


def topk_cosine(
    corpus: DataFrame,
    query: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_vec_col: str = "q_emb",
) -> DataFrame:
    """Exact top-k by cosine: broadcast the 1-row query, score every corpus
    vector JVM-side, take the global top-k (deterministic id tiebreak)."""
    scored = corpus.crossJoin(F.broadcast(query)).select(
        F.col(id_col),
        cosine(vec_col, query_vec_col).alias("cosine_sim"),
    )
    return scored.orderBy(F.col("cosine_sim").desc(), F.col(id_col).asc()).limit(k)


def neardup_cosine_pairs(
    corpus: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-dup pairs: unordered (a < b) with cosine >= threshold.
    Exact quadratic form — correct baseline; use `ivf_assign` buckets or
    random-hyperplane LSH to cut the cross product at scale."""
    a = corpus.select(F.col(id_col).alias("a"), F.col(vec_col).alias("va"))
    b = corpus.select(F.col(id_col).alias("b"), F.col(vec_col).alias("vb"))
    return (
        a.join(b, F.col("a") < F.col("b"))
        .select("a", "b", cosine("va", "vb").alias("cosine_sim"))
        .filter(F.col("cosine_sim") >= threshold)
    )


def ivf_assign(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id_col: str = "centroid_id",
    centroid_vec_col: str = "c_emb",
) -> DataFrame:
    """Assign every vector to its nearest centroid (max cosine, id
    tiebreak): the IVF coarse quantizer. Centroids broadcast; one pass."""
    scored = corpus.crossJoin(F.broadcast(centroids)).select(
        F.col(id_col),
        F.col(centroid_id_col),
        cosine(vec_col, centroid_vec_col).alias("c_sim"),
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("c_sim").desc(), F.col(centroid_id_col).asc()
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(id_col, centroid_id_col, "c_sim")
    )


def ivf_topk_cosine(
    corpus: DataFrame,
    query: DataFrame,
    num_centroids_df: DataFrame,
    k: int,
    nprobe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF search: probe the `nprobe` centroid buckets nearest the query,
    exact top-k within them. `num_centroids_df` holds (centroid_id, c_emb)."""
    assigned = ivf_assign(corpus, num_centroids_df, id_col, vec_col)
    q_probe = (
        num_centroids_df.crossJoin(F.broadcast(query))
        .select("centroid_id", cosine("c_emb", "q_emb").alias("q_sim"))
        .orderBy(F.col("q_sim").desc(), F.col("centroid_id").asc())
        .limit(nprobe)
        .select("centroid_id")
    )
    bucket = corpus.join(
        assigned.join(F.broadcast(q_probe), "centroid_id").select(id_col), id_col
    )
    return topk_cosine(bucket, query, k, id_col, vec_col)
