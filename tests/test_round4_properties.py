"""Property tests for round-4 operators: the distributed implementations
must agree with naive in-memory references on arbitrary inputs (same
contract as test_properties.py — few examples, derandomized, bounded
small)."""

from __future__ import annotations

import struct

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from sample_data_pipeline_project_spark.operators.graph import lpa_labels

_SETTINGS = settings(
    max_examples=8,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_edges_strategy = st.lists(
    st.tuples(st.integers(0, 7), st.integers(0, 7)),
    min_size=1,
    max_size=14,
)


def _lpa_reference(edges, rounds):
    """Pure-Python synchronous LPA with (count desc, label asc) tiebreak."""
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    labels = {v: v for v in adj}
    for _ in range(rounds):
        nxt = {}
        for v, nbrs in adj.items():
            counts: dict[int, int] = {}
            for u in nbrs:
                counts[labels[u]] = counts.get(labels[u], 0) + 1
            nxt[v] = min(counts, key=lambda lab: (-counts[lab], lab))
        labels = nxt
    return labels


@given(edges=_edges_strategy, rounds=st.sampled_from([0, 1, 2, 3]))
@_SETTINGS
def test_lpa_equals_python_reference(spark, edges, rounds):
    clean = [(a, b) for a, b in edges if a != b]
    if not clean:
        return
    df = spark.createDataFrame(clean, "a long, b long")
    got = {r["vertex"]: r["label"] for r in lpa_labels(df, rounds).collect()}
    assert got == _lpa_reference(clean, rounds)


_payload_strategy = st.binary(min_size=0, max_size=40)


def _audio_reference(payload: bytes):
    usable = len(payload) - (len(payload) % 2)
    n = usable // 2
    samples = list(struct.unpack(f"<{n}h", payload[:usable])) if n else []
    peak = max((abs(s) for s in samples), default=0)
    sum_sq = sum(s * s for s in samples)
    zc = sum(
        1
        for i in range(1, n)
        if (samples[i] >= 0) != (samples[i - 1] >= 0)
    )
    return n, peak, sum_sq, zc


@given(payloads=st.lists(_payload_strategy, min_size=1, max_size=5))
@_SETTINGS
def test_audio_waveform_equals_struct_reference(spark, payloads):
    from sample_data_pipeline_project_spark.multimodal.ops import (
        MEDIA_SCHEMA,
        audio_waveform_stats,
    )

    rows = [
        (i, "audio", bytearray(p), (0, 0, 1, 16000, None))
        for i, p in enumerate(payloads)
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {
        r["media_id"]: (
            r["n_samples"],
            r["peak_abs"],
            r["sum_sq"],
            r["zero_crossings"],
        )
        for r in audio_waveform_stats(df).collect()
    }
    want = {i: _audio_reference(p) for i, p in enumerate(payloads)}
    assert got == want


def test_lpa_negative_rounds_raises(spark):
    df = spark.createDataFrame([(1, 2)], "a long, b long")
    with pytest.raises(ValueError):
        lpa_labels(df, -1)
