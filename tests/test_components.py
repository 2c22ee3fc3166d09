"""Connected components (operators/components.py): min-label propagation
vs hand-computed components on known graph shapes."""

from __future__ import annotations

from sample_data_pipeline_project_spark.operators.components import (
    connected_components,
)


def _run(spark, edges, vertices, **kw):
    e = spark.createDataFrame(edges or [(None, None)], "a long, b long")
    if not edges:
        e = e.filter("a IS NOT NULL")
    v = spark.createDataFrame([(x,) for x in vertices], "id long")
    out = connected_components(e, v, **kw)
    return {r["id"]: r["component_id"] for r in out.collect()}

def test_chain_and_singleton(spark):
    # 1-2-3 chain plus isolated 4: component = min id reachable.
    got = _run(spark, [(2, 1), (2, 3)], [1, 2, 3, 4])
    assert got == {1: 1, 2: 1, 3: 1, 4: 4}


def test_two_components(spark):
    got = _run(spark, [(1, 2), (2, 3), (10, 11), (11, 12), (10, 12)], [1, 2, 3, 10, 11, 12])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10}


def test_long_path_needs_iterations(spark):
    # Path 9-8-7-...-1: the min label must walk the full diameter.
    edges = [(i, i + 1) for i in range(1, 9)]
    got = _run(spark, edges, list(range(1, 10)))
    assert set(got.values()) == {1}


def test_no_edges(spark):
    got = _run(spark, [], [5, 6])
    assert got == {5: 5, 6: 6}


def test_unconverged_raises(spark):
    """Exhausting max_iter before convergence must raise, not silently
    return wrong labels (min-label propagation needs O(diameter) rounds)."""
    import pytest

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 8)], "a long, b long"
    )
    verts = spark.createDataFrame([(i,) for i in range(1, 9)], "id long")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, verts, max_iter=2)
