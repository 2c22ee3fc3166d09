"""Testdata catalog: schema-on-read Parquet loading (operator A1).

Replaces the reference's `SELECT * FROM {db}.{schema}.{table}` full scans
(reference: overlap_checks.py:50-51, snowflake_tasks.py:174,282,393,533)
with `spark.read.parquet` — Catalyst pushes filters/projections into the
scan, so callers never pay for a true full scan.

Scale notes:
  - Loading is lazy; no data moves until an action. Filters composed later
    reach the parquet reader (`PushedFilters` in .explain).
  - `events.ts` is parquet TIMESTAMP(NANOS): Spark's reader rejects it, so
    the loader flips `spark.sql.legacy.parquet.nanosAsLong` and rebuilds a
    TIMESTAMP_NTZ column timezone-independently (functions/timeops.py).
    The conf is a dynamic SQL conf; it is left set for the session so the
    lazy scan stays valid at execution time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from sample_data_pipeline_project_spark.functions.timeops import (
    NANOS_AS_LONG_CONF,
    ensure_ts_ntz,
)
from sample_data_pipeline_project_spark.schema import TESTDATA_TABLES


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table as a DataFrame (lazy)."""
    if name not in TESTDATA_TABLES:
        raise ValueError(f"unknown table {name!r}; expected one of {TESTDATA_TABLES}")
    path = f"{sf_dir.rstrip('/')}/{name}.parquet"
    if name == "events":
        # Dynamic conf: must be set before the read resolves the footer
        # schema AND still set at execution; leave it on for the session.
        # Harmless when the writer used TIMESTAMP(MICROS) — the column then
        # arrives as TIMESTAMP_NTZ and ensure_ts_ntz leaves it alone.
        spark.conf.set(NANOS_AS_LONG_CONF, "true")
        return ensure_ts_ntz(spark.read.parquet(path))
    return spark.read.parquet(path)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for `spark.sql` use
    (replaces the reference's USE DATABASE/SCHEMA namespace dance, A27)."""
    for name in TESTDATA_TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
