"""pareto_frontier_2d (operators/pareto.py) vs brute force."""

import numpy as np

from sample_data_pipeline_project_spark.operators.pareto import (
    _pareto_mask,
    pareto_frontier_2d,
)


def _brute(points):
    """O(n^2) skyline: maximize x, minimize y."""
    out = []
    for i, (xi, yi) in enumerate(points):
        dominated = any(
            (xj >= xi and yj <= yi and (xj > xi or yj < yi))
            for j, (xj, yj) in enumerate(points)
            if j != i
        )
        if not dominated:
            out.append(i)
    return out


def test_mask_matches_brute_random():
    rng = np.random.default_rng(11)
    for _ in range(20):
        n = int(rng.integers(1, 60))
        x = rng.integers(0, 12, n).astype(np.int64)
        y = rng.integers(0, 12, n).astype(np.int64)
        got = set(np.where(_pareto_mask(x, -y))[0])  # minimize y -> max -y
        assert got == set(_brute(list(zip(x.tolist(), y.tolist()))))


def test_mask_duplicates_survive():
    x = np.array([5, 5, 1], dtype=np.int64)
    y = np.array([9, 9, 3], dtype=np.int64)
    assert _pareto_mask(x, y).tolist() == [True, True, False]


def test_frontier_2d_distributed_matches_brute(spark):
    rng = np.random.default_rng(3)
    rows = [
        (f"g{int(g)}", int(i), int(x), int(y))
        for i, (g, x, y) in enumerate(
            zip(
                rng.integers(0, 3, 200),
                rng.integers(0, 15, 200),
                rng.integers(0, 15, 200),
            )
        )
    ]
    df = spark.createDataFrame(rows, "grp string, id long, x long, y long")
    got = {
        (r["grp"], r["id"])
        for r in pareto_frontier_2d(
            df, ["grp"], "x", "y", ["id"], n_shards=8
        ).collect()
    }
    expected = set()
    for g in {r[0] for r in rows}:
        grp_rows = [r for r in rows if r[0] == g]
        pts = [(r[2], r[3]) for r in grp_rows]
        for i in _brute(pts):
            expected.add((g, grp_rows[i][1]))
    assert got == expected
