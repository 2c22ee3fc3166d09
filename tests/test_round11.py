"""Round-11 operator pins: IVF-preselected near-dup pairs (the SemDeDup
scale path) and its certification workload."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def _pairs(df):
    return {(r["a"], r["b"]): r["cosine_sim"] for r in df.collect()}


def test_pairs_ivf_is_exact_subset(spark):
    """Every pair the IVF path emits appears in the exact blocked-matmul
    set with a BIT-IDENTICAL score (preselection prunes, never invents
    or rescores), and recall clears the pinned sf0.001 floor."""
    from sample_data_pipeline_project_spark.operators.similarity import (
        neardup_cosine_pairs_blocked,
        neardup_cosine_pairs_ivf,
    )
    from sample_data_pipeline_project_spark.sources.catalog import load_table

    emb = load_table(spark, SF, "embeddings")
    exact = _pairs(neardup_cosine_pairs_blocked(emb, 0.4))
    approx = _pairs(neardup_cosine_pairs_ivf(emb, 0.4, nprobe=4))
    assert set(approx) <= set(exact)
    assert all(approx[k] == exact[k] for k in approx)
    assert len(approx) >= 0.8 * len(exact)
    spark.catalog.clearCache()


def test_pairs_ivf_forced_split_identical(spark):
    """pair_budget='max-cell' forces >= 1 cell to salt, and the salted
    plan emits the IDENTICAL pair set (work splits, membership doesn't)."""
    from sample_data_pipeline_project_spark.operators.similarity import (
        neardup_cosine_pairs_ivf,
    )
    from sample_data_pipeline_project_spark.sources.catalog import load_table

    emb = load_table(spark, SF, "embeddings")
    base = _pairs(neardup_cosine_pairs_ivf(emb, 0.4, nprobe=4))
    stats: dict = {}
    forced = _pairs(
        neardup_cosine_pairs_ivf(
            emb, 0.4, nprobe=4, pair_budget="max-cell", split_stats=stats
        )
    )
    assert stats["n_oversized"] >= 1
    assert forced == base and len(base) > 0
    spark.catalog.clearCache()


def test_semivf_floor_applies_only_under_gate_root(tmp_path):
    """Per-scale recall pins are measured against the canonical gate
    corpora; any other directory named like one must get 'default'."""
    from sample_data_pipeline_project_spark.workloads.analytics_round11 import (
        _SEMIVF_FLOORS,
        _semivf_floor,
    )

    assert _semivf_floor("/root/testdata/sf0.1") == _SEMIVF_FLOORS["sf0.1"]
    other = tmp_path / "sf0.1"
    other.mkdir()
    assert _semivf_floor(str(other)) == _SEMIVF_FLOORS["default"]


def test_semantic_dedup_ivf_certifies(spark):
    """The C236 gate workload returns all-TRUE at test scale."""
    from sample_data_pipeline_project_spark.workloads.analytics_round11 import (
        sim_semantic_dedup_ivf,
    )

    row = sim_semantic_dedup_ivf(spark, SF).collect()
    assert len(row) == 1
    r = row[0]
    assert r["exact_subset"] and r["recall_ok"] and r["nonempty"]
    assert r["clusters_valid"]
    spark.catalog.clearCache()
