"""Derived pipeline-run ledger over the driver's `events` table.

The reference's ledger lives in Snowflake; the driver's testdata has no
ledger parquet. For oracle-checked correctness (driver runs our Spark query
AND our ANSI SQL side-by-side) we derive a deterministic ledger view from
`events` — the same transformation expressed twice, once as DataFrame ops
and once as a SQL CTE DuckDB runs verbatim. Column set matches the implied
reference schema (SURVEY.md §1).

Mapping (pure, deterministic, no tz/float hazards):
  run_id        = event_id
  pipeline_name = event_type                (5 values)
  index_name    = 'idx_' || user_id % 3     (3 values)
  status        = CASE on value quartile-ish bands
  start_ts      = ts            end_ts = ts + INTERVAL 5 MINUTES
  start_day     = DATE(start)   end_day = DATE(end)

Synthetic `pipeline_runs` fixtures with hand-built gap/overlap scenarios
(FIXTURES.md §1) live in sources/fixtures.py and are exercised in tests/.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sample_data_pipeline_project_spark.sources.catalog import load_table

# ANSI CTE the DuckDB oracle prepends; semantically identical to
# `derived_ledger` below. Keep the two in lockstep.
LEDGER_CTE = """
pipeline_runs AS (
  SELECT
    event_id AS run_id,
    event_type AS pipeline_name,
    'idx_' || CAST(user_id % 3 AS VARCHAR) AS index_name,
    CASE WHEN value < 50 THEN 'pending'
         WHEN value < 120 THEN 'in_progress'
         WHEN value < 250 THEN 'completed'
         ELSE 'failed' END AS pipeline_status,
    ts AS query_window_start_ts,
    ts + INTERVAL 5 MINUTE AS query_window_end_ts,
    CAST(ts AS DATE) AS query_window_start_day,
    CAST(ts + INTERVAL 5 MINUTE AS DATE) AS query_window_end_day
  FROM events
)
"""


def derived_ledger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Spark twin of LEDGER_CTE."""
    return ledger_columns(load_table(spark, sf_dir, "events"))


def ledger_columns(e: DataFrame) -> DataFrame:
    """The LEDGER_CTE column mapping applied to any events-shaped
    DataFrame — batch (derived_ledger) or streaming
    (streaming/eventtime.py ledger_runs_stream) share this one
    definition."""
    end_ts = F.col("ts") + F.expr("INTERVAL 5 MINUTES")
    return e.select(
        F.col("event_id").alias("run_id"),
        F.col("event_type").alias("pipeline_name"),
        F.concat(F.lit("idx_"), (F.col("user_id") % 3).cast("string")).alias(
            "index_name"
        ),
        F.when(F.col("value") < 50, "pending")
        .when(F.col("value") < 120, "in_progress")
        .when(F.col("value") < 250, "completed")
        .otherwise("failed")
        .alias("pipeline_status"),
        F.col("ts").alias("query_window_start_ts"),
        end_ts.alias("query_window_end_ts"),
        F.col("ts").cast("date").alias("query_window_start_day"),
        end_ts.cast("date").alias("query_window_end_day"),
    )
