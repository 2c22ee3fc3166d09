"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over the engine's workload registry
(`sample_data_pipeline_project_spark.workloads`): every implemented
operator from SURVEY.md §2 registers there as a named Spark builder plus
(when SQL-expressible) a DuckDB oracle string.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from sample_data_pipeline_project_spark.ledger.derive import derived_ledger
from sample_data_pipeline_project_spark.ledger.tasks import overlap_input_df
from sample_data_pipeline_project_spark.workloads import load_all


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the reference's
    highest-value operator (find_overlapping_records_for_input,
    overlap_checks.py:4-107) over the derived pipeline-run ledger —
    day-band prune + exact half-open interval overlap."""
    ledger = derived_ledger(spark, "/root/testdata/sf0.001")
    return overlap_input_df(
        ledger,
        pipeline_name="view",
        index_name="idx_0",
        start_ts="2024-01-05T00:00:00",
        end_ts="2024-01-15T00:00:00",
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: w.fn for name, w in load_all().items()}


def oracle_sql() -> dict[str, str]:
    """Equivalent ANSI SQL per query, runnable by DuckDB on the same
    parquet tables. Non-SQL-expressible ops are omitted (driver records a
    rows-only check)."""
    return {name: w.oracle for name, w in load_all().items() if w.oracle is not None}
