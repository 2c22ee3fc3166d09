"""Triangle counting: degree-oriented operator vs brute-force enumeration
on randomized graphs, plus edge-hygiene and plan-shape checks."""

from __future__ import annotations

import itertools
import random

from sample_data_pipeline_project_spark.operators.graph import triangle_counts


def _brute_counts(edges: set[tuple[int, int]]) -> dict[int, int]:
    verts = sorted({v for e in edges for v in e})
    es = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    counts: dict[int, int] = {}
    for x, y, z in itertools.combinations(verts, 3):
        if (x, y) in es and (y, z) in es and (x, z) in es:
            for v in (x, y, z):
                counts[v] = counts.get(v, 0) + 1
    return counts


def _run(spark, edges):
    df = spark.createDataFrame(list(edges), "a long, b long")
    got = {
        r["vertex"]: r["n_triangles"] for r in triangle_counts(df).collect()
    }
    return got


def test_known_small_graph(spark):
    # K4 on {1,2,3,4}: every vertex sits on C(3,2)=3 triangles.
    k4 = list(itertools.combinations([1, 2, 3, 4], 2))
    assert _run(spark, k4) == {1: 3, 2: 3, 3: 3, 4: 3}


def test_triangle_free_graph_returns_empty(spark):
    # star graph: no triangles at all
    star = [(0, i) for i in range(1, 6)]
    assert _run(spark, star) == {}


def test_self_loops_and_mirrored_duplicates_ignored(spark):
    edges = [(1, 2), (2, 1), (2, 3), (3, 1), (1, 1), (1, 2)]
    assert _run(spark, edges) == {1: 1, 2: 1, 3: 1}


def test_random_graphs_match_bruteforce(spark):
    rng = random.Random(7)
    for trial in range(3):
        n = 14
        edges = {
            (a, b)
            for a in range(n)
            for b in range(a + 1, n)
            if rng.random() < 0.35
        }
        assert _run(spark, edges) == _brute_counts(edges), trial


def test_skewed_hub_matches_bruteforce(spark):
    # one hub connected to everyone + a sparse periphery: the exact shape
    # degree orientation exists for (the hub must not root its wedges).
    rng = random.Random(11)
    n = 20
    edges = {(0, i) for i in range(1, n)}
    edges |= {
        (a, b)
        for a in range(1, n)
        for b in range(a + 1, n)
        if rng.random() < 0.15
    }
    assert _run(spark, edges) == _brute_counts(edges)


def test_wedges_root_at_low_degree_endpoints(spark):
    """Orientation invariant: with a degree-(n-1) hub and degree-2 leaves,
    every oriented edge must point leaf -> hub, so no wedge is rooted at
    the hub (the last-reducer guarantee)."""
    # wheel: hub 0 to all rim vertices, rim forms a cycle — every rim edge
    # closes one triangle through the hub.
    n = 8
    edges = [(0, i) for i in range(1, n)] + [
        (i, i % (n - 1) + 1) for i in range(1, n)
    ]
    got = _run(spark, edges)
    assert got[0] == n - 1
    assert got == _brute_counts(set(edges))


def test_empty_edge_list(spark):
    df = spark.createDataFrame([], "a long, b long")
    assert triangle_counts(df).count() == 0


# --------------------------------------------------------------------------
# k-core peeling
# --------------------------------------------------------------------------
from sample_data_pipeline_project_spark.operators.graph import kcore_peel


def _brute_kcore(edges: set[tuple[int, int]], k: int, rounds: int):
    es = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    for _ in range(rounds):
        deg: dict[int, int] = {}
        for a, b in es:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        keep = {v for v, d in deg.items() if d >= k}
        es = {(a, b) for a, b in es if a in keep and b in keep}
    deg = {}
    for a, b in es:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    return deg


def _run_kcore(spark, edges, k, rounds):
    df = spark.createDataFrame(list(edges), "a long, b long")
    return {r["vertex"]: r["degree"] for r in kcore_peel(df, k, rounds).collect()}


def test_kcore_clique_survives_path_dissolves(spark):
    # K4 clique {1..4} plus a pendant path 4-5-6: the path peels away
    # under k=2 while the clique keeps degree 3 everywhere.
    edges = list(itertools.combinations([1, 2, 3, 4], 2)) + [(4, 5), (5, 6)]
    assert _run_kcore(spark, edges, 2, 4) == {1: 3, 2: 3, 3: 3, 4: 3}


def test_kcore_cycle_is_its_own_2core(spark):
    cyc = [(i, (i + 1) % 6) for i in range(6)]
    assert _run_kcore(spark, cyc, 2, 3) == {i: 2 for i in range(6)}


def test_kcore_zero_rounds_returns_input_degrees(spark):
    edges = [(1, 2), (2, 3)]
    assert _run_kcore(spark, edges, 5, 0) == {1: 1, 2: 2, 3: 1}


def test_kcore_cascading_peel_needs_multiple_rounds(spark):
    # chain hanging off a triangle: each round removes one more chain
    # vertex (degree-1 tail), so convergence takes as many rounds as the
    # chain is long — fixed rounds semantics must match the brute force
    # at EVERY round count, converged or not.
    edges = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 6)]
    for rounds in range(0, 5):
        assert _run_kcore(spark, edges, 2, rounds) == _brute_kcore(
            set(edges), 2, rounds
        ), rounds


def test_kcore_random_graphs_match_bruteforce(spark):
    rng = random.Random(11)
    for trial in range(3):
        n = 16
        edges = {
            (a, b)
            for a in range(n)
            for b in range(a + 1, n)
            if rng.random() < 0.25
        }
        for k in (2, 3):
            assert _run_kcore(spark, edges, k, 3) == _brute_kcore(
                edges, k, 3
            ), (trial, k)


# --------------------------------------------------------------------------
# hits_bipartite
# --------------------------------------------------------------------------
def _hits_brute(edges, iters=2, scale=1_000_000):
    hubs = sorted({u for u, _ in edges})
    auths = sorted({t for _, t in edges})
    es = set(edges)
    h = {u: scale * sum(1 for (uu, _) in es if uu == u) for u in hubs}
    mx = max(h.values())
    h = {u: s * scale // mx for u, s in h.items()}
    for _ in range(iters - 1):
        a = {t: sum(h[u] for (u, tt) in es if tt == t) for t in auths}
        mx = max(a.values())
        a = {t: s * scale // mx for t, s in a.items()}
        h = {u: sum(a[t] for (uu, t) in es if uu == u) for u in hubs}
        mx = max(h.values())
        h = {u: s * scale // mx for u, s in h.items()}
    return h


def test_hits_bipartite_brute_parity(spark):
    from sample_data_pipeline_project_spark.operators.graph import hits_bipartite

    edges = [
        (1, "a"), (1, "b"), (1, "c"),
        (2, "a"), (2, "b"),
        (3, "c"),
        (4, "a"), (4, "d"), (4, "c"), (4, "b"),
        (5, "d"),
        (5, "d"),  # duplicate edge must not double-count
    ]
    df = spark.createDataFrame(edges, "u long, t string")
    got = {
        r["hub"]: r["hub_score"]
        for r in hits_bipartite(df, "u", "t", iters=3).collect()
    }
    assert got == _hits_brute(list(set(edges)), iters=3)


def test_hits_bipartite_iters_guard(spark):
    from sample_data_pipeline_project_spark.operators.graph import hits_bipartite

    df = spark.createDataFrame([(1, "a")], "u long, t string")
    try:
        hits_bipartite(df, "u", "t", iters=0)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


# --------------------------------------------------------------------------
# bfs_hops
# --------------------------------------------------------------------------
from sample_data_pipeline_project_spark.operators.graph import bfs_hops  # noqa: E402


def _brute_bfs(edges, seeds, rounds):
    adj = {}
    for a, b in edges:
        if a != b:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
    dist = {s: 0 for s in seeds}
    frontier = set(seeds)
    for r in range(1, rounds + 1):
        nxt = set()
        for u in frontier:
            for w in adj.get(u, ()):
                if w not in dist:
                    dist[w] = r
                    nxt.add(w)
        frontier = nxt
    return dist


def _run_bfs(spark, edges, seeds, rounds):
    e = spark.createDataFrame(edges, "a long, b long")
    s = spark.createDataFrame([(x,) for x in seeds], "vertex long")
    out = bfs_hops(e, s, rounds)
    return {r["vertex"]: r["hops"] for r in out.collect()}


def test_bfs_matches_bruteforce_random(spark):
    import random

    rnd = random.Random(7)
    for trial in range(4):
        n = 30
        edges = [
            (rnd.randrange(n), rnd.randrange(n)) for _ in range(60)
        ]
        seeds = [0, 5]
        for rounds in (0, 1, 3):
            got = _run_bfs(spark, edges, seeds, rounds)
            want = _brute_bfs(edges, seeds, rounds)
            assert got == want, (trial, rounds)


def test_bfs_zero_rounds_is_seed_set(spark):
    got = _run_bfs(spark, [(1, 2), (2, 3)], [2], 0)
    assert got == {2: 0}


def test_bfs_disconnected_unreached_absent(spark):
    got = _run_bfs(spark, [(1, 2), (10, 11)], [1], 5)
    assert got == {1: 0, 2: 1}


def test_bfs_min_over_multiple_seeds(spark):
    # path 1-2-3-4-5, seeds at both ends: 3 is 2 hops from each
    edges = [(1, 2), (2, 3), (3, 4), (4, 5)]
    got = _run_bfs(spark, edges, [1, 5], 4)
    assert got == {1: 0, 5: 0, 2: 1, 4: 1, 3: 2}


def test_bfs_negative_rounds_raises(spark):
    e = spark.createDataFrame([(1, 2)], "a long, b long")
    s = spark.createDataFrame([(1,)], "vertex long")
    try:
        bfs_hops(e, s, -1)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


# ---------------------------------------------------------------------------
# lpa_labels (synchronous label propagation)
# ---------------------------------------------------------------------------
from sample_data_pipeline_project_spark.operators.graph import lpa_labels


def _run_lpa(spark, edges, rounds):
    e = spark.createDataFrame(edges, "a long, b long")
    return {r["vertex"]: r["label"] for r in lpa_labels(e, rounds).collect()}


def test_lpa_triangle_converges_to_min_label(spark):
    # triangle 1-2-3 plus isolated pair 4-5
    edges = [(1, 2), (2, 3), (1, 3), (4, 5)]
    # round 1: 1->2 (tie {2,3}, min), 2->1, 3->1, 4->5, 5->4
    # round 2: 1->1 (both nbrs labeled 1), 2->1 (tie {2,1}), 3->1, 4<->5 swap back
    # round 3: triangle stays at 1; the 4-5 pair oscillates (period 2)
    got = _run_lpa(spark, edges, 3)
    assert got[1] == 1 and got[2] == 1 and got[3] == 1
    assert got[4] == 5 and got[5] == 4


def test_lpa_zero_rounds_identity(spark):
    got = _run_lpa(spark, [(1, 2), (2, 3)], 0)
    assert got == {1: 1, 2: 2, 3: 3}


def test_lpa_two_cliques_bridge_deterministic(spark):
    # cliques {1,2,3} and {10,11,12} joined by one bridge 3-10. The
    # min-label tiebreak leaks label 3 across the bridge (r1: 10 adopts
    # min nbr 3; r2: 11,12 tie-break to 3; r3: stable) — communities stay
    # DISTINCT (1 vs 3) but the exact labels come from the deterministic
    # synchronous trace, pinned here by hand.
    k1 = [(1, 2), (1, 3), (2, 3)]
    k2 = [(10, 11), (10, 12), (11, 12)]
    got = _run_lpa(spark, k1 + k2 + [(3, 10)], 3)
    assert got[1] == got[2] == got[3] == 1
    assert got[10] == got[11] == got[12] == 3


def test_lpa_disconnected_cliques_stay_separate(spark):
    k1 = [(1, 2), (1, 3), (2, 3)]
    k2 = [(10, 11), (10, 12), (11, 12)]
    got = _run_lpa(spark, k1 + k2, 3)
    assert got[1] == got[2] == got[3] == 1
    assert got[10] == got[11] == got[12] == 10


def test_lpa_deduplicates_and_ignores_self_loops(spark):
    got = _run_lpa(spark, [(1, 2), (2, 1), (1, 1), (2, 3)], 2)
    assert set(got) == {1, 2, 3}
