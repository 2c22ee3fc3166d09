"""Fixed-iteration PageRank: hand-computed small graph, dangling and
isolated vertices, symmetry."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sample_data_pipeline_project_spark.operators.pagerank import pagerank_fixed


def test_pagerank_hand_computed_chain(spark):
    # 0 -> 1 -> 2, vertex 3 isolated. n=4, d=0.85, 1 iteration.
    edges = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    vertices = spark.createDataFrame([(i,) for i in range(4)], "id long")
    got = {
        r["id"]: (r["outdeg"], r["r"])
        for r in pagerank_fixed(edges, vertices, iters=1).collect()
    }
    n = 4
    base = (1.0 - 0.85) / n
    r0 = 1.0 / n
    assert got[0] == (1, pytest.approx(base))                 # no incoming
    assert got[1] == (1, pytest.approx(base + 0.85 * r0))     # from 0
    assert got[2] == (0, pytest.approx(base + 0.85 * r0))     # from 1, dangling
    assert got[3] == (0, pytest.approx(base))                 # isolated


def test_pagerank_symmetric_pair_converges_uniform(spark):
    # a <-> b: both keep rank exactly 1/n at every iteration.
    edges = spark.createDataFrame(
        [(10, 20), (20, 10)], "src long, dst long"
    )
    vertices = spark.createDataFrame([(10,), (20,)], "id long")
    got = {r["id"]: r["r"] for r in pagerank_fixed(edges, vertices, iters=3).collect()}
    assert got[10] == pytest.approx(0.5)
    assert got[20] == pytest.approx(0.5)


def test_pagerank_mass_flows_to_hub(spark):
    # star: 1..4 all point at 0 — hub outranks leaves after 2 rounds.
    edges = spark.createDataFrame([(i, 0) for i in range(1, 5)], "src long, dst long")
    vertices = spark.createDataFrame([(i,) for i in range(5)], "id long")
    got = {r["id"]: r["r"] for r in pagerank_fixed(edges, vertices, iters=2).collect()}
    assert got[0] > got[1] == got[2] == got[3] == got[4]
