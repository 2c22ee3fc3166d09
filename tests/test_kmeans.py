"""k-means trainer: blob separation, assignment coverage, inertia
non-increase, IVF probe output shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sample_data_pipeline_project_spark.operators.kmeans import (
    assign_clusters,
    kmeans_fit,
    kmeans_ivf_topk,
)


@pytest.fixture(scope="module")
def vecs(spark):
    rows = []
    # three well-separated blobs; ids interleaved (id % 3 = blob) so the
    # deterministic lowest-id init starts with one seed per blob
    for b, center in enumerate([(0.0, 0.0), (10.0, 10.0), (-10.0, 5.0)]):
        for i in range(6):
            rows.append(
                (i * 3 + b, b, [center[0] + 0.1 * i, center[1] - 0.1 * i])
            )
    return spark.createDataFrame(rows, "vec_id long, blob int, embedding array<float>")


def test_fit_finds_separated_blobs(vecs):
    cents = kmeans_fit(vecs.select("vec_id", "embedding"), 3, max_iters=5)
    assert cents.count() == 3
    assigned = assign_clusters(vecs.select("vec_id", "embedding"), cents).join(
        vecs.select("vec_id", "blob"), "vec_id"
    )
    rows = assigned.select("blob", "cluster").collect()
    blob_to_clusters: dict = {}
    for r in rows:
        blob_to_clusters.setdefault(r["blob"], set()).add(r["cluster"])
    # each blob maps to exactly one cluster, and the clusters differ
    assert all(len(cs) == 1 for cs in blob_to_clusters.values())
    assert len(set().union(*blob_to_clusters.values())) == 3


def test_inertia_non_increasing(vecs):
    v = vecs.select("vec_id", "embedding")
    inertias = []
    for iters in (1, 2, 4):
        cents = kmeans_fit(v, 3, max_iters=iters)
        inertias.append(assign_clusters(v, cents).agg(F.sum("sq_dist")).first()[0])
    assert inertias[0] + 1e-9 >= inertias[1] >= inertias[2] - 1e-9


def test_ivf_topk_shape(vecs):
    v = vecs.select("vec_id", "embedding")
    # vec_id 0 is the all-zeros point (undefined cosine); query from id 3
    q = v.filter("vec_id = 3").select(F.col("embedding").alias("q_emb"))
    corpus = v.filter("vec_id != 3 and vec_id != 0")
    out = kmeans_ivf_topk(corpus, q, k_clusters=3, top_k=4, nprobe=1, max_iters=2)
    rows = out.collect()
    assert len(rows) == 4
    sims = [r["cosine_sim"] for r in rows]
    assert sims == sorted(sims, reverse=True)


def test_k_validation(vecs):
    with pytest.raises(ValueError, match="k must be"):
        kmeans_fit(vecs.select("vec_id", "embedding"), 0)
