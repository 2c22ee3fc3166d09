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
