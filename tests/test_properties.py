"""Property-based tests (hypothesis): the optimized operators must agree
with their naive reference forms on arbitrary inputs, not just fixtures.

Spark jobs are slow per-example, so: few examples, tight deadlines off,
derandomized (CI-stable), inputs bounded small. The properties are the
strong ones — full output equality against a brute-force twin.
"""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from sample_data_pipeline_project_spark.operators.dedup import (
    jaccard_pairs,
    jaccard_pairs_prefix,
)
from sample_data_pipeline_project_spark.operators.asof import asof_join

_WORDS = ["red", "blue", "green", "fox", "dog", "cat", "run", "jump"]

_docs_strategy = st.lists(
    st.lists(st.sampled_from(_WORDS), min_size=0, max_size=10),
    min_size=2,
    max_size=8,
)

_SETTINGS = settings(
    max_examples=8,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@pytest.fixture(scope="module")
def sess(spark):
    return spark


@given(docs=_docs_strategy, threshold=st.sampled_from([0.3, 0.6, 0.9]))
@_SETTINGS
def test_prefix_jaccard_equals_naive_on_random_docs(sess, docs, threshold):
    df = sess.createDataFrame(
        [(i, " ".join(words)) for i, words in enumerate(docs)],
        "doc_id long, text string",
    )
    naive = {
        (r["a"], r["b"]): (r["shared"], round(r["jaccard"], 10))
        for r in jaccard_pairs(df, threshold).collect()
    }
    fast = {
        (r["a"], r["b"]): (r["shared"], round(r["jaccard"], 10))
        for r in jaccard_pairs_prefix(df, threshold).collect()
    }
    assert fast == naive


_events_strategy = st.lists(
    st.tuples(
        st.integers(0, 2),        # key
        st.integers(0, 50),       # ts offset (seconds)
        st.booleans(),            # left or right side
    ),
    min_size=1,
    max_size=14,
)


@given(rows=_events_strategy)
@_SETTINGS
def test_asof_join_equals_bruteforce(sess, rows):
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    left_rows, right_rows = [], []
    for i, (k, off, is_left) in enumerate(rows):
        ts = base + dt.timedelta(seconds=off)
        if is_left:
            left_rows.append((i, f"k{k}", ts))
        else:
            right_rows.append((100 + i, f"k{k}", ts))
    if not left_rows:
        left_rows.append((99, "k0", base))
    if not right_rows:
        right_rows.append((199, "k1", base))
    left = sess.createDataFrame(left_rows, "lid long, k string, lts timestamp_ntz")
    right = sess.createDataFrame(right_rows, "rid long, k string, rts timestamp_ntz")
    got = {
        r["lid"]: r["rid"]
        for r in asof_join(
            left, right, on=["k"], left_ts="lts", right_ts="rts",
            right_tiebreak="rid",
        ).collect()
    }
    # brute force: max-(rts, rid) right row with rts <= lts per key
    expect = {}
    for lid, lk, lts in left_rows:
        best = None
        for rid, rk, rts in right_rows:
            if rk == lk and rts <= lts:
                cand = (rts, rid)
                if best is None or cand > best:
                    best = cand
        expect[lid] = best[1] if best else None
    assert got == expect


_edges_strategy = st.lists(
    st.tuples(st.integers(0, 14), st.integers(0, 14)),
    min_size=0,
    max_size=25,
)


@given(edges=_edges_strategy)
@_SETTINGS
def test_connected_components_matches_union_find(spark, edges):
    """Min-label propagation must agree with a driver-side union-find on
    arbitrary small graphs (self-loops and duplicate edges included)."""
    from sample_data_pipeline_project_spark.operators.components import (
        connected_components,
    )

    vertices = list(range(15))
    parent = {v: v for v in vertices}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected = {v: find(v) for v in vertices}
    # normalize: label = min member of the component
    comp_min = {}
    for v, r in expected.items():
        comp_min.setdefault(r, v)
    expected = {v: comp_min[expected[v]] for v in vertices}

    e = spark.createDataFrame(edges or [(None, None)], "a long, b long")
    if not edges:
        e = e.filter("a IS NOT NULL")
    v = spark.createDataFrame([(x,) for x in vertices], "id long")
    got = {
        r["id"]: r["component_id"]
        for r in connected_components(e, v).collect()
    }
    assert got == expected
