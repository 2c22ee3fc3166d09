"""Typed-array feature operators (operators/features.py): the engine API
returns real array<bigint> columns; the registered workloads are the
same plan with a final scalar serialization. Round-trip both ways."""

from __future__ import annotations

from pyspark.sql import types as T

from sample_data_pipeline_project_spark.operators.features import (
    hash_features,
    recent_history,
)
from sample_data_pipeline_project_spark.sources.catalog import load_table
from sample_data_pipeline_project_spark.workloads import load_all

_SF = "/root/testdata/sf0.001"


def _is_bigint_array(dtype) -> bool:
    return isinstance(dtype, T.ArrayType) and isinstance(
        dtype.elementType, T.LongType
    )


def test_hash_features_typed_schema_and_roundtrip(spark):
    docs = load_table(spark, _SF, "documents")
    typed = hash_features(docs, n_buckets=64, as_array=True)
    schema = dict((f.name, f.dataType) for f in typed.schema.fields)
    assert _is_bigint_array(schema["buckets"])
    assert _is_bigint_array(schema["counts"])

    # serializing the typed output reproduces the gate workload exactly
    wl = load_all()["features_hashing_trick"].fn(spark, _SF)
    got = {
        r["doc_id"]: (
            ",".join(map(str, r["buckets"])),
            ",".join(map(str, r["counts"])),
            r["nnz"],
        )
        for r in typed.collect()
    }
    want = {
        r["doc_id"]: (r["buckets"], r["counts"], r["nnz"])
        for r in wl.collect()
    }
    assert got == want

    # parallel-sequence invariants on the typed form
    for buckets, counts, nnz in got.values():
        b = [int(x) for x in buckets.split(",")]
        assert len(b) == nnz and b == sorted(b) and len(set(b)) == nnz
        assert all(0 <= x < 64 for x in b)
        assert all(int(c) >= 1 for c in counts.split(","))


def test_recent_history_typed_schema_and_roundtrip(spark):
    ev = load_table(spark, _SF, "events")
    typed = recent_history(ev, k=3, as_array=True)
    schema = dict((f.name, f.dataType) for f in typed.schema.fields)
    assert _is_bigint_array(schema["recent_event_ids"])

    wl = load_all()["events_recent_history_array"].fn(spark, _SF)
    got = {
        r["user_id"]: (",".join(map(str, r["recent_event_ids"])), r["n_recent"])
        for r in typed.collect()
    }
    want = {
        r["user_id"]: (r["recent_event_ids"], r["n_recent"])
        for r in wl.collect()
    }
    assert got == want
    assert all(n <= 3 for _, n in got.values())


def _float_array(dtype) -> bool:
    return isinstance(dtype, T.ArrayType) and isinstance(
        dtype.elementType, T.FloatType
    )


def _double_array(dtype) -> bool:
    return isinstance(dtype, T.ArrayType) and isinstance(
        dtype.elementType, T.DoubleType
    )


def test_embedding_transforms_typed_schema_and_roundtrip(spark):
    from sample_data_pipeline_project_spark.operators.features import (
        embedding_transforms,
    )

    e = load_table(spark, _SF, "embeddings")
    typed = embedding_transforms(e, as_array=True)
    schema = dict((f.name, f.dataType) for f in typed.schema.fields)
    assert _double_array(schema["abs_values"])
    assert _float_array(schema["positives"])  # element type preserved
    assert _double_array(schema["clipped_values"])

    # scalar columns == the registered C59 workload (same plan minus
    # the array projections)
    wl = load_all()["scalar_array_hof_funcs"].fn(spark, _SF)
    scalar_cols = ["dim", "n_pos", "l1_norm", "max_abs", "clipped_sum"]
    got = {r["vec_id"]: tuple(r[c] for c in scalar_cols) for r in typed.collect()}
    want = {r["vec_id"]: tuple(r[c] for c in scalar_cols) for r in wl.collect()}
    assert got == want

    # typed arrays re-fold to the scalar columns (strict left fold)
    for r in typed.limit(20).collect():
        assert len(r["abs_values"]) == r["dim"]
        assert len(r["positives"]) == r["n_pos"]
        acc = 0.0
        for v in r["abs_values"]:
            acc += v
        assert acc == r["l1_norm"]
        acc = 0.0
        for v in r["clipped_values"]:
            assert -0.25 <= v <= 0.25
            acc += v
        assert acc == r["clipped_sum"]


def test_event_type_share_map_typed_schema_and_roundtrip(spark):
    from sample_data_pipeline_project_spark.operators.features import (
        event_type_share_map,
    )

    ev = load_table(spark, _SF, "events")
    typed = event_type_share_map(ev, as_map=True)
    schema = dict((f.name, f.dataType) for f in typed.schema.fields)
    mt = schema["dominant"]
    assert isinstance(mt, T.MapType) and isinstance(mt.keyType, T.StringType)
    assert isinstance(mt.valueType, T.StructType)
    assert [f.name for f in mt.valueType.fields] == ["n_type", "share"]

    # exploding the typed map reproduces the registered C100 workload
    wl = load_all()["scalar_map_hof_funcs"].fn(spark, _SF)
    want = {
        (r["user_id"], r["event_type"]): (r["n_type"], r["share"])
        for r in wl.collect()
    }
    got = {}
    for r in typed.collect():
        for etype, v in (r["dominant"] or {}).items():
            got[(r["user_id"], etype)] = (v["n_type"], v["share"])
    assert got == want
    # every retained share clears the threshold
    assert all(s >= 0.25 for _, s in got.values())


def test_topk_cosine_with_vector_payload(spark):
    from pyspark.sql import functions as F

    from sample_data_pipeline_project_spark.operators.similarity import (
        topk_cosine,
    )

    emb = load_table(spark, _SF, "embeddings")
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("q_emb")
    )
    corpus = emb.filter(F.col("vec_id") != 0)
    plain = topk_cosine(corpus, q, 5)
    typed = topk_cosine(corpus, q, 5, with_vector=True)
    assert _float_array(
        dict((f.name, f.dataType) for f in typed.schema.fields)["embedding"]
    )
    # identical ranking, and the payload is the corpus vector verbatim
    assert [(r["vec_id"], r["cosine_sim"]) for r in plain.collect()] == [
        (r["vec_id"], r["cosine_sim"]) for r in typed.collect()
    ]
    src = {r["vec_id"]: r["embedding"] for r in typed.collect()}
    orig = {
        r["vec_id"]: r["embedding"]
        for r in corpus.filter(F.col("vec_id").isin(list(src))).collect()
    }
    assert src == orig


def test_batch_topk_cosine_with_vector_payload(spark):
    from pyspark.sql import functions as F

    from sample_data_pipeline_project_spark.operators.similarity import (
        batch_topk_cosine,
    )

    emb = load_table(spark, _SF, "embeddings")
    queries = emb.filter(F.col("vec_id") % 97 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding")
    )
    plain = batch_topk_cosine(emb, queries, 3)
    typed = batch_topk_cosine(emb, queries, 3, with_vector=True)
    assert _float_array(
        dict((f.name, f.dataType) for f in typed.schema.fields)["embedding"]
    )
    key = lambda r: (r["query_id"], r["rank"])  # noqa: E731
    p = {key(r): (r["vec_id"], r["cosine_sim"]) for r in plain.collect()}
    trows = typed.collect()
    t = {key(r): (r["vec_id"], r["cosine_sim"]) for r in trows}
    assert p == t
    ids = sorted({r["vec_id"] for r in trows})
    orig = {
        r["vec_id"]: r["embedding"]
        for r in emb.filter(F.col("vec_id").isin(ids)).collect()
    }
    assert all(r["embedding"] == orig[r["vec_id"]] for r in trows)


def test_knn_mutual_edges_invariants(spark):
    from pyspark.sql import functions as F

    from sample_data_pipeline_project_spark.operators.similarity import (
        knn_mutual_edges,
        neardup_cosine_pairs,
    )

    emb = load_table(spark, _SF, "embeddings")
    d = 3
    edges = knn_mutual_edges(emb, d, 0.2).collect()
    # unordered, no self loops
    assert all(r["a"] < r["b"] for r in edges)
    # HARD degree bound: mutual-kNN degree can never exceed d
    deg: dict[int, int] = {}
    for r in edges:
        deg[r["a"]] = deg.get(r["a"], 0) + 1
        deg[r["b"]] = deg.get(r["b"], 0) + 1
    assert deg and max(deg.values()) <= d
    # exact scores: every edge's cosine matches the quadratic baseline
    base = {
        (r["a"], r["b"]): r["cosine_sim"]
        for r in neardup_cosine_pairs(emb, 0.2).collect()
    }
    assert all(base[(r["a"], r["b"])] == r["cosine_sim"] for r in edges)
    # mutuality: recompute top-d lists from the full exact pair set and
    # check every edge is ranked <= d from BOTH endpoints
    import collections

    nbrs = collections.defaultdict(list)
    for (a, b), s in base.items():
        nbrs[a].append((-s, b))
        nbrs[b].append((-s, a))
    topd = {
        v: {x for _, x in sorted(lst)[:d]} for v, lst in nbrs.items()
    }
    for r in edges:
        assert r["b"] in topd[r["a"]] and r["a"] in topd[r["b"]]
