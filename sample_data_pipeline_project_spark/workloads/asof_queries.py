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


@workload(
    "asof_nearest_view_to_click",
    oracle="""
WITH clicks AS (
  SELECT user_id, event_id AS click_id, ts AS click_ts
  FROM events WHERE event_type = 'click'
),
views AS (
  SELECT user_id, event_id AS view_id, ts AS view_ts
  FROM events WHERE event_type = 'view'
),
bwd AS (
  SELECT c.user_id, c.click_id, c.click_ts, v.view_id AS bwd_id, v.view_ts AS bwd_ts
  FROM clicks c
  ASOF LEFT JOIN views v
    ON c.user_id = v.user_id AND v.view_ts <= c.click_ts
),
paired AS (
  SELECT b.user_id, b.click_id, b.click_ts, b.bwd_id, b.bwd_ts,
         v.view_id AS fwd_id, v.view_ts AS fwd_ts
  FROM bwd b
  ASOF LEFT JOIN views v
    ON b.user_id = v.user_id AND v.view_ts >= b.click_ts
)
SELECT user_id, click_id, click_ts,
       CASE WHEN bwd_id IS NOT NULL
                 AND (fwd_id IS NULL
                      OR date_diff('microsecond', bwd_ts, click_ts)
                         <= date_diff('microsecond', click_ts, fwd_ts))
            THEN bwd_id ELSE fwd_id END AS nearest_view_id,
       CASE WHEN bwd_id IS NOT NULL
                 AND (fwd_id IS NULL
                      OR date_diff('microsecond', bwd_ts, click_ts)
                         <= date_diff('microsecond', click_ts, fwd_ts))
            THEN 'backward' ELSE 'forward' END AS side
FROM paired
""",
)
def asof_nearest_view_to_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST-direction as-of join (pandas merge_asof direction=
    'nearest'): for every click, the same user's closest view in EITHER
    direction, ties to the backward match — composed from one backward
    and one forward pass of the union-merge asof operator (each a single
    user-keyed shuffle), the distance compare in exact epoch
    MICROSECONDS. Completes the as-of family (C10 covers backward /
    forward / tolerance); the oracle is DuckDB's native ASOF JOIN run
    both ways plus the identical integer-distance CASE — two independent
    implementations of 'nearest' agreeing row-for-row."""
    e = load_table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    views_b = e.filter(F.col("event_type") == "view").select(
        "user_id",
        F.col("event_id").alias("bwd_id"),
        F.col("ts").alias("bwd_ts"),
    )
    views_f = e.filter(F.col("event_type") == "view").select(
        "user_id",
        F.col("event_id").alias("fwd_id"),
        F.col("ts").alias("fwd_ts"),
    )
    bwd = asof_join(
        clicks,
        views_b,
        on=["user_id"],
        left_ts="click_ts",
        right_ts="bwd_ts",
        right_tiebreak="bwd_id",
        how="left",
    )
    both = asof_join(
        bwd,
        views_f,
        on=["user_id"],
        left_ts="click_ts",
        right_ts="fwd_ts",
        right_tiebreak="fwd_id",
        how="left",
        direction="forward",
    )
    takes_bwd = F.col("bwd_id").isNotNull() & (
        F.col("fwd_id").isNull()
        | (
            (
                F.unix_micros(F.col("click_ts").cast("timestamp"))
                - F.unix_micros(F.col("bwd_ts").cast("timestamp"))
            )
            <= (
                F.unix_micros(F.col("fwd_ts").cast("timestamp"))
                - F.unix_micros(F.col("click_ts").cast("timestamp"))
            )
        )
    )
    return both.select(
        "user_id",
        "click_id",
        "click_ts",
        F.when(takes_bwd, F.col("bwd_id")).otherwise(F.col("fwd_id")).alias(
            "nearest_view_id"
        ),
        F.when(takes_bwd, F.lit("backward")).otherwise(F.lit("forward")).alias("side"),
    )
