"""Ledger Parquet IO — the engine's table sink/source.

The reference's ledger lives as a Snowflake table created by caller DDL
(snowflake_tasks.py:9-62) and queried with day-granularity coarse filters
(overlap_checks.py:52-53). Spark-first equivalent: Parquet PARTITIONED BY
`query_window_start_day`, so the reference's manual day-band pre-filter
becomes real partition pruning — the scan never opens files outside the
band (SURVEY.md §4).

Scale notes (100 TB ledger):
  - Day partitioning bounds every operator in this engine: gap windows,
    overlap self-joins and input-overlap checks all carry a day predicate,
    so work per query is proportional to the band, not the table.
  - Writes repartition by the partition column first so each day lands as
    O(1) files instead of #tasks small files (the classic small-file
    problem on high-cardinality partitioned writes).
  - `mode=append` is the ledger's natural write mode (runs are inserted,
    never rewritten); `overwrite` + dynamic partition overwrite handles
    backfills of specific days without touching the rest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from sample_data_pipeline_project_spark.schema import PIPELINE_RUNS_SCHEMA

PARTITION_COL = "query_window_start_day"


def write_ledger(
    df: DataFrame,
    path: str,
    mode: str = "append",
    files_per_day: int = 1,
) -> None:
    """Write ledger rows partitioned by start day."""
    (
        df.repartition(files_per_day, PARTITION_COL)
        .write.mode(mode)
        .partitionBy(PARTITION_COL)
        .parquet(path)
    )


def read_ledger(spark: SparkSession, path: str) -> DataFrame:
    """Schema-on-read of a partitioned ledger; day filters composed by the
    ledger operators become partition pruning (check PartitionFilters in
    .explain)."""
    df = spark.read.schema(PIPELINE_RUNS_SCHEMA).parquet(path)
    # Partitioned layout moves the partition column last; restore the
    # declared column order so downstream code sees one stable schema.
    return df.select(*[f.name for f in PIPELINE_RUNS_SCHEMA.fields])
