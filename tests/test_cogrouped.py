"""Cogrouped applyInPandas: the pandas per-key path must reproduce the
relational (join + aggregate) answer exactly."""

from __future__ import annotations

from pyspark.sql import functions as F

from sample_data_pipeline_project_spark.operators.cogrouped import (
    clicks_with_prior_view_counts,
)
from sample_data_pipeline_project_spark.sources.catalog import load_table

_SF_DIR = "/root/testdata/sf0.001"


def test_cogroup_matches_join_formulation(spark):
    events = load_table(spark, _SF_DIR, "events")
    got = {
        (r["user_id"], r["click_id"], r["prior_views"])
        for r in clicks_with_prior_view_counts(events).collect()
    }

    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("click_ts")
    )
    views = events.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"), F.col("ts").alias("v_ts")
    )
    expected = {
        (r["user_id"], r["click_id"], r["prior_views"])
        for r in (
            clicks.join(
                views,
                (F.col("user_id") == F.col("v_user"))
                & (F.col("v_ts") < F.col("click_ts")),
                "left",
            )
            .groupBy("user_id", "click_id")
            .agg(F.count("v_ts").alias("prior_views"))
        ).collect()
    }
    assert got == expected and len(got) > 0


def test_cogroup_handles_one_sided_keys(spark):
    """Users with clicks but no views get prior_views=0; view-only users
    produce no output rows."""
    rows = [
        (1, "click", 100),  # user 1: clicks only
        (2, "view", 50),  # user 2: views only
        (3, "view", 10),
        (3, "click", 20),
        (3, "click", 5),  # before the view -> 0
    ]
    import datetime as dt

    events = spark.createDataFrame(
        [
            (i, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s), u, t, 0.0, "{}")
            for i, (u, t, s) in enumerate(rows)
        ],
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double, props string",
    )
    got = {
        (r["user_id"], r["prior_views"])
        for r in clicks_with_prior_view_counts(events).collect()
    }
    assert got == {(1, 0), (3, 1), (3, 0)}


def test_bucketed_cogroup_identical_to_per_user(spark):
    """The n_buckets scale path (bucket cogroup + vectorized per-user
    kernel) must produce byte-identical rows to the per-user path,
    including equal-timestamp ties (a view at the click's exact ts is not
    'strictly before')."""
    events = load_table(spark, _SF_DIR, "events")
    per_user = {
        (r["user_id"], r["click_id"], r["click_ts"], r["prior_views"])
        for r in clicks_with_prior_view_counts(events).collect()
    }
    for k in (1, 7, 64):
        bucketed = {
            (r["user_id"], r["click_id"], r["click_ts"], r["prior_views"])
            for r in clicks_with_prior_view_counts(events, n_buckets=k).collect()
        }
        assert bucketed == per_user, k


def test_bucketed_cogroup_tie_semantics(spark):
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, "view", 0),
        (1, "click", 0),   # tie with the view -> not counted
        (1, "view", 5),
        (1, "click", 5),   # tie again, one earlier view counted
        (2, "click", 1),   # no views at all
    ]
    events = spark.createDataFrame(
        [
            (i, base + dt.timedelta(seconds=s), u, t, 0.0, "{}")
            for i, (u, t, s) in enumerate(rows)
        ],
        "event_id long, ts timestamp_ntz, user_id long, event_type string, value double, props string",
    )
    got = {
        (r["user_id"], r["click_id"], r["prior_views"])
        for r in clicks_with_prior_view_counts(events, n_buckets=4).collect()
    }
    assert got == {(1, 1, 0), (1, 3, 1), (2, 4, 0)}
