"""Semantic invariants of the round-4 report workloads, run on the
sf0.001 testdata through the registered builders themselves — facts that
must hold regardless of engine parity (the oracle gate checks Spark ==
DuckDB; these check both == the mathematics)."""

from __future__ import annotations

import pytest

from sample_data_pipeline_project_spark.workloads import load_all

_SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def registry():
    return load_all()


def test_lift_gains_terminal_and_monotone(spark, registry):
    rows = sorted(
        registry["stats_lift_gains_deciles"].fn(spark, _SF).collect(),
        key=lambda r: r["decile"],
    )
    assert [r["decile"] for r in rows] == list(range(1, 11))
    # cumulative gain is nondecreasing and ends at exactly 1
    gains = [r["gain"] for r in rows]
    assert all(a <= b + 1e-12 for a, b in zip(gains, gains[1:]))
    assert abs(gains[-1] - 1.0) < 1e-12
    # final cumulative lift is exactly the base rate ratio = 1
    assert abs(rows[-1]["lift"] - 1.0) < 1e-12
    # cum counts tile the corpus
    assert rows[-1]["cum_n"] == sum(r["n_d"] for r in rows)


def test_dataset_card_shares_sum_to_one(spark, registry):
    rows = registry["train_dataset_card"].fn(spark, _SF).collect()
    assert abs(sum(r["share_docs"] for r in rows) - 1.0) < 1e-9
    assert abs(sum(r["share_tokens"] for r in rows) - 1.0) < 1e-9


def test_abc_partitions_revenue(spark, registry):
    rows = {r["abc_class"]: r for r in
            registry["stats_abc_classification"].fn(spark, _SF).collect()}
    assert set(rows) <= {"A", "B", "C"}
    total = sum(r["class_rev_m4"] for r in rows.values())
    assert abs(sum(r["share_of_revenue"] for r in rows.values()) - 1.0) < 1e-12
    # class A alone never exceeds 80% + one part's worth of revenue
    if "A" in rows and "B" in rows:
        assert rows["A"]["class_rev_m4"] * 100 <= total * 80 + 100 * max(
            r["class_rev_m4"] for r in rows.values()
        )


def test_share_of_parent_consistency(spark, registry):
    rows = registry["rollup_share_of_parent"].fn(spark, _SF).collect()
    by_region: dict[str, float] = {}
    for r in rows:
        by_region[r["region"]] = by_region.get(r["region"], 0.0) + r[
            "share_of_region"
        ]
    for region, s in by_region.items():
        assert abs(s - 1.0) < 1e-9, region
    assert abs(sum(r["share_of_total"] for r in rows) - 1.0) < 1e-9


def test_blocking_quality_bounds(spark, registry):
    row = registry["er_blocking_quality"].fn(spark, _SF).collect()[0]
    assert 0 <= row["candidate_pairs"] <= row["total_pairs"]
    assert 0.0 <= row["reduction_ratio"] <= 1.0
    assert row["n_captured"] <= row["n_truth"]
    if row["n_truth"]:
        assert 0.0 <= row["pair_recall"] <= 1.0


def test_kfold_partitions_rows(spark, registry):
    rows = registry["ml_kfold_cv_ols"].fn(spark, _SF).collect()
    assert len(rows) == 5
    n_total = {r["n_train"] + r["n_test"] for r in rows}
    assert len(n_total) == 1  # every fold sees the same corpus
    assert sum(r["n_test"] for r in rows) == n_total.pop()


def test_growth_accounting_identity(spark, registry):
    """actives(w) must equal new + retained + resurrected exactly, and
    every user classified churned at w+1 was active at w."""
    from pyspark.sql import functions as F

    from sample_data_pipeline_project_spark.sources.catalog import load_table

    rows = {r["wk"]: r for r in
            registry["events_growth_accounting"].fn(spark, _SF).collect()}
    uw = (
        load_table(spark, _SF, "events")
        .select("user_id", F.date_trunc("week", F.col("ts")).cast("date").alias("wk"))
        .distinct()
        .groupBy("wk")
        .count()
        .collect()
    )
    actives = {r["wk"]: r["count"] for r in uw}
    assert set(actives) == set(rows)
    for wk, r in rows.items():
        assert actives[wk] == r["n_new"] + r["n_retained"] + r["n_resurrected"], wk
    # churn bridge: actives(w) - (retained(w+1) on the SAME users) = churned(w+1)
    wks = sorted(rows)
    for a, b in zip(wks, wks[1:]):
        if (b - a).days == 7:
            assert actives[a] - rows[b]["n_retained"] == rows[b]["n_churned"], (a, b)


def test_decomposition_identities(spark, registry):
    """Exact per-row identities: 7*rev == trend_x7 + resid_x7, and
    seasonal + remainder reconstruct the residual. Per (nation, dow),
    remainders must sum to ~0 — the seasonal IS their mean, so this is
    an identity of the estimator, unlike any claim about residuals
    themselves (sparse series leave real detrend bias)."""
    rows = registry["timeseries_classical_decomposition"].fn(spark, _SF).collect()
    assert rows
    rem_by_cell: dict[tuple[int, int], float] = {}
    for r in rows:
        assert 7 * r["rev_cents"] == r["trend_x7"] + r["resid_x7"]
        assert abs((r["seasonal_x7"] + r["remainder_x7"]) - r["resid_x7"]) < 1e-6
        dow = (r["day"].toordinal() - 719162) % 7  # days since 1970-01-01
        cell = (r["nationkey"], dow)
        rem_by_cell[cell] = rem_by_cell.get(cell, 0.0) + r["remainder_x7"]
    for cell, s in rem_by_cell.items():
        assert abs(s) < 1e-3, cell


def test_novelty_accounts_for_every_bigram(spark, registry):
    """Summed first-seen bigrams across sources == total distinct corpus
    bigrams (every bigram is novel exactly once)."""
    from pyspark.sql import functions as F

    from sample_data_pipeline_project_spark.functions.text import (
        tokens,
        word_bigrams,
    )
    from sample_data_pipeline_project_spark.sources.catalog import load_table

    rows = registry["text_novelty_rate"].fn(spark, _SF).collect()
    total_novel = sum(r["n_novel"] for r in rows)
    d = load_table(spark, _SF, "documents")
    distinct_bigrams = (
        d.select(tokens("text").alias("__t"))
        .select(F.explode(word_bigrams("__t")).alias("b"))
        .select("b.w1", "b.w2")
        .distinct()
        .count()
    )
    assert total_novel == distinct_bigrams
