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


# ---------------------------------------------------------------------------
# Round-2 operators: asof direction/tolerance, bloom pruning, partial-agg
# merge — each against a brute-force relational twin on random inputs.
# ---------------------------------------------------------------------------

_events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),      # key
        st.integers(min_value=0, max_value=50),     # minutes offset
    ),
    min_size=0,
    max_size=12,
)


@given(lefts=_events_strategy, rights=_events_strategy,
       direction=st.sampled_from(["backward", "forward"]),
       tol=st.sampled_from([None, "10 MINUTES"]))
@_SETTINGS
def test_asof_direction_tolerance_equals_bruteforce(sess, lefts, rights, direction, tol):
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    ldf = sess.createDataFrame(
        [(k, base + dt.timedelta(minutes=m), i) for i, (k, m) in enumerate(lefts)],
        "k long, lts timestamp_ntz, lid long",
    )
    rdf = sess.createDataFrame(
        [(k, base + dt.timedelta(minutes=m), i) for i, (k, m) in enumerate(rights)],
        "k long, rts timestamp_ntz, rid long",
    )
    got = {
        (r["k"], r["lid"]): (r["rid"], r["rts"])
        for r in asof_join(
            ldf, rdf, on=["k"], left_ts="lts", right_ts="rts",
            right_tiebreak="rid", direction=direction, tolerance=tol,
        ).collect()
    }
    # brute force: best matching right per left under the same semantics
    rrows = rdf.collect()
    want = {}
    for lrow in ldf.collect():
        cands = [r for r in rrows if r["k"] == lrow["k"]]
        if direction == "backward":
            cands = [r for r in cands if r["rts"] <= lrow["lts"]]
            best_ts = max((r["rts"] for r in cands), default=None)
        else:
            cands = [r for r in cands if r["rts"] >= lrow["lts"]]
            best_ts = min((r["rts"] for r in cands), default=None)
        match = None
        if best_ts is not None:
            within = tol is None or abs(
                (lrow["lts"] - best_ts).total_seconds()
            ) <= 600
            if within:
                # tiebreak: the LAST right in rid order wins
                rid = max(r["rid"] for r in cands if r["rts"] == best_ts)
                match = (rid, best_ts)
        want[(lrow["k"], lrow["lid"])] = match if match else (None, None)
    assert got == want


@given(build_keys=st.lists(st.integers(min_value=0, max_value=500),
                           min_size=0, max_size=30),
       probe_span=st.integers(min_value=1, max_value=400))
@_SETTINGS
def test_bloom_superset_property(sess, build_keys, probe_span):
    from pyspark.sql import functions as F

    from sample_data_pipeline_project_spark.operators.bloomjoin import (
        bloom_might_contain,
        build_bloom,
    )

    build = sess.createDataFrame([(k,) for k in build_keys] or [(None,)], "k long")
    build = build.filter(F.col("k").isNotNull())
    blocks = build_bloom(build, "k", m_bits=1 << 12)
    probe = sess.range(0, probe_span).select(F.col("id").alias("k"))
    admitted = {
        r["k"]
        for r in probe.filter(
            bloom_might_contain(F.col("k"), blocks, 1 << 12)
        ).collect()
    }
    true_hits = set(build_keys) & set(range(probe_span))
    assert true_hits <= admitted  # never a false negative


@given(rows=st.lists(st.tuples(st.sampled_from(["a", "b", "c"]),
                               st.integers(min_value=-100, max_value=100)),
                     min_size=0, max_size=20),
       split=st.integers(min_value=-100, max_value=100))
@_SETTINGS
def test_partial_agg_merge_equals_full(sess, rows, split):
    from pyspark.sql import functions as F

    from sample_data_pipeline_project_spark.operators.incremental import (
        merge_partial_aggs,
    )

    df = sess.createDataFrame(rows or [("z", 0)], "k string, v long")

    def part(d):
        return d.groupBy("k").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("s"),
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
        )

    merged = merge_partial_aggs(
        part(df.filter(F.col("v") <= split)),
        part(df.filter(F.col("v") > split)),
        key_cols=["k"], sum_cols=["n", "s"], min_cols=["mn"], max_cols=["mx"],
    )
    got = {tuple(r) for r in merged.collect()}
    want = {tuple(r) for r in part(df).collect()}
    assert got == want


from sample_data_pipeline_project_spark.operators.ranks import (  # noqa: E402
    bucketed_global_rank,
)

_rank_rows_strategy = st.lists(
    st.tuples(
        st.integers(min_value=-50, max_value=50),  # value: many duplicates
        st.integers(min_value=0, max_value=10_000),  # tiebreak key
    ),
    min_size=0,
    max_size=60,
    unique_by=lambda t: t[1],
)


@given(rows=_rank_rows_strategy, nb=st.sampled_from([1, 3, 64]))
@_SETTINGS
def test_bucketed_global_rank_equals_sorted_position(sess, rows, nb):
    """The bucket-offset rank (quantiles + dedup vocab path) must equal
    the 1..N position under (value, key) sorting — for any value
    distribution (duplicates, skew, negatives) and any bucket count,
    including nb=1 (worst skew: everything in one bucket)."""
    df = sess.createDataFrame(rows or [], "v long, k long")
    ranked, n = bucketed_global_rank(df, "v", ["k"], n_buckets=nb)
    got = {(r["v"], r["k"]): r["rn"] for r in ranked.collect()}
    want = {vk: i + 1 for i, vk in enumerate(sorted(rows))}
    assert n == len(rows) and got == want
