"""As-of join workload over `events` — time-series point-in-time lookup.

Spark side: the union-merge `asof_join` operator (operators/asof.py).
Oracle side: DuckDB's native ASOF JOIN — an independent implementation of
the same semantics, which makes this a strong cross-engine check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sample_data_pipeline_project_spark.operators.asof import asof_join
from sample_data_pipeline_project_spark.sources.catalog import load_table
from sample_data_pipeline_project_spark.workloads import workload


@workload(
    "asof_latest_view_before_click",
    oracle="""
WITH clicks AS (
  SELECT user_id, event_id AS click_id, ts AS click_ts
  FROM events WHERE event_type = 'click'
),
views AS (
  SELECT user_id, event_id AS view_id, ts AS view_ts
  FROM events WHERE event_type = 'view'
)
SELECT c.user_id, c.click_ts, c.click_id, v.view_id, v.view_ts
FROM clicks c
ASOF LEFT JOIN views v
  ON c.user_id = v.user_id AND v.view_ts <= c.click_ts
""",
)
def asof_latest_view_before_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every click, the same user's most recent view at-or-before the
    click (backward as-of, <= semantics). One shuffle on user_id."""
    e = load_table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    views = e.filter(F.col("event_type") == "view").select(
        "user_id",
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
    )
    return asof_join(
        clicks,
        views,
        on=["user_id"],
        left_ts="click_ts",
        right_ts="view_ts",
        right_tiebreak="view_id",
        how="left",
    )


@workload(
    "asof_next_view_within_hour",
    oracle="""
WITH clicks AS (
  SELECT user_id, event_id AS click_id, ts AS click_ts
  FROM events WHERE event_type = 'click'
),
views AS (
  SELECT user_id, event_id AS view_id, ts AS view_ts
  FROM events WHERE event_type = 'view'
)
SELECT c.user_id, c.click_ts, c.click_id,
       CASE WHEN v.view_ts <= c.click_ts + INTERVAL 1 HOUR
            THEN v.view_id END AS view_id,
       CASE WHEN v.view_ts <= c.click_ts + INTERVAL 1 HOUR
            THEN v.view_ts END AS view_ts
FROM clicks c
ASOF LEFT JOIN views v
  ON c.user_id = v.user_id AND v.view_ts >= c.click_ts
""",
)
def asof_next_view_within_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of with TOLERANCE: for every click, the same user's
    earliest view at-or-after the click, nulled when it is more than an
    hour later (pandas merge_asof direction='forward' + tolerance
    semantics). Same single key-shuffle union-merge pass as the backward
    form, scanned in descending time; the oracle is DuckDB's native
    forward ASOF JOIN with the tolerance stated as a post-join CASE."""
    e = load_table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    views = e.filter(F.col("event_type") == "view").select(
        "user_id",
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
    )
    return asof_join(
        clicks,
        views,
        on=["user_id"],
        left_ts="click_ts",
        right_ts="view_ts",
        right_tiebreak="view_id",
        how="left",
        direction="forward",
        tolerance="1 HOUR",
    )
