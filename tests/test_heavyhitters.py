"""Misra-Gries heavy-hitters operator: guarantee + merge properties."""

from __future__ import annotations

from pyspark.sql import functions as F

from sample_data_pipeline_project_spark.operators.heavyhitters import (
    _mg_pass,
    mg_merge,
    mg_summary,
)


def _exact(stream):
    c = {}
    for v in stream:
        c[v] = c.get(v, 0) + 1
    return c


def _check_guarantee(stream, summary, k):
    """est <= true everywhere; true - est <= n/(k+1); every item with
    true > n/(k+1) present."""
    exact = _exact(stream)
    n = len(stream)
    for item, est in summary.items():
        assert est <= exact[item], (item, est, exact[item])
        assert exact[item] - est <= n // (k + 1) + 1
    for item, true in exact.items():
        if true * (k + 1) > n:
            assert item in summary, (item, true, n, k)


def test_sequential_pass_guarantee():
    # zipf-ish synthetic stream: item i appears ~ N/i times
    stream = []
    for i in range(1, 40):
        stream.extend([f"w{i}"] * (2000 // i))
    # deterministic interleave (worst case for MG is adversarial order)
    stream.sort()
    stream = stream[::2] + stream[1::2]
    for k in (2, 4, 8):
        summary = _mg_pass(stream, k)
        assert len(summary) <= k
        _check_guarantee(stream, summary, k)


def test_merge_preserves_guarantee():
    stream = []
    for i in range(1, 30):
        stream.extend([f"w{i}"] * (1500 // i))
    k = 5
    # split into 7 shards, MG each, merge
    shards = [stream[j::7] for j in range(7)]
    merged = mg_merge([_mg_pass(s, k) for s in shards], k)
    assert len(merged) <= k
    _check_guarantee(stream, merged, k)


def test_merge_is_order_independent():
    summaries = [
        {"a": 10, "b": 3},
        {"a": 1, "c": 8},
        {"b": 5, "d": 2},
        {"c": 1, "e": 4},
    ]
    k = 2
    out1 = mg_merge(summaries, k)
    out2 = mg_merge(list(reversed(summaries)), k)
    assert out1 == out2


def test_distributed_summary_matches_guarantee(spark):
    rows = []
    rid = 0
    for i in range(1, 25):
        for _ in range(1200 // i):
            rows.append((rid, f"w{i}"))
            rid += 1
    df = spark.createDataFrame(rows, "rid long, item string")
    k = 4
    summary = mg_summary(df, k, item_col="item", order_cols=["rid"], num_shards=8)
    assert len(summary) <= k
    stream = [r[1] for r in rows]
    _check_guarantee(stream, summary, k)


def test_distributed_summary_deterministic(spark):
    rows = [(i, f"w{i % 13}") for i in range(3000)]
    df = spark.createDataFrame(rows, "rid long, item string")
    s1 = mg_summary(df, 4, item_col="item", order_cols=["rid"], num_shards=8)
    s2 = mg_summary(
        df.repartition(3), 4, item_col="item", order_cols=["rid"], num_shards=8
    )
    assert s1 == s2


def test_empty_stream(spark):
    df = spark.createDataFrame([], "rid long, item string")
    assert mg_summary(df, 4, item_col="item", order_cols=["rid"]) == {}
