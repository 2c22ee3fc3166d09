"""Streaming workloads: incremental execution cross-checked against the
batch SQL oracle — the correctness statement that matters for a streaming
engine is exactly "incremental result == batch result".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from sample_data_pipeline_project_spark.streaming.eventtime import (
    hourly_counts_stream,
    run_stream_to_table,
    stream_events,
)
from sample_data_pipeline_project_spark.workloads import workload

# Batch oracle of the same aggregation (no n_users: exact COUNT(DISTINCT)
# is not incrementally computable, see hourly_counts_stream).
_HOURLY_ORACLE = """
SELECT date_trunc('hour', ts) AS window_start,
       event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM events
GROUP BY date_trunc('hour', ts), event_type
"""


@workload("stream_hourly_tumbling", oracle=_HOURLY_ORACLE)
def stream_hourly_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B6 (streaming) — the tumbling-window aggregation executed as a real
    Structured Streaming query (readStream -> watermark -> windowed agg ->
    availableNow trigger -> memory sink), then compared to the BATCH DuckDB
    oracle: stream-vs-batch parity."""
    events = stream_events(spark, sf_dir)
    return run_stream_to_table(hourly_counts_stream(events))
