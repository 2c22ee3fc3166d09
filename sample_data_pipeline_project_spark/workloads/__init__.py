"""Named workload registry: the driver-facing query surface.

Every implemented operator from SURVEY.md §2 registers here as a named
workload: a Spark builder `(spark, sf_dir) -> DataFrame` plus (when the
semantics are SQL-expressible) an ANSI-SQL oracle string DuckDB runs on the
same parquet tables. `__spark_entry__.queries()/oracle_sql()` simply expose
this registry.

Determinism contract (what makes Spark-vs-DuckDB value hashes stable):
  - timestamps are TIMESTAMP_NTZ end-to-end (functions/timeops.py);
  - double aggregates go through exact DECIMAL sums, cast to DOUBLE at the
    end (summation-order-independent, bit-identical across engines);
  - every ORDER BY ... LIMIT has a unique-key tiebreak;
  - aggregate/computed columns are aliased identically on both sides;
  - NEVER cast float->integer directly: Spark truncates, DuckDB rounds.
    Route money through DECIMAL(18,2) first, and wrap fractional index
    arithmetic in explicit FLOOR on BOTH sides (window_rolling_median
    found both divergences);
  - float constants embedded in ORACLE SQL must ride as
    CAST('<repr>' AS DOUBLE), never as bare decimal literals: DuckDB
    parses a bare 16-digit literal as DECIMAL(17,16), and its
    decimal->double conversion can be 1 ulp off the correctly-rounded
    string parse (timeseries_weekly_spectrum found this when the ulp
    moved a ROUND across an exact .5).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Workload:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None
    doc: str = field(default="")


REGISTRY: dict[str, Workload] = {}


def workload(name: str, oracle: str | None = None):
    """Register a named workload; `oracle` is ANSI SQL for DuckDB or None
    for non-SQL-expressible operators (driver falls back to rows-only)."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in REGISTRY:
            raise ValueError(f"duplicate workload {name!r}")
        REGISTRY[name] = Workload(name, fn, oracle, fn.__doc__ or "")
        return fn

    return deco


def load_all() -> dict[str, Workload]:
    """Import all workload modules (registration is an import side-effect)."""
    from sample_data_pipeline_project_spark.workloads import (  # noqa: F401
        analytics_extra,
        analytics_round3,
        analytics_round3c,
        analytics_round3d,
        analytics_round4,
        analytics_round4b,
        analytics_round4c,
        analytics_round4d,
        analytics_round4e,
        analytics_round4f,
        analytics_round4g,
        analytics_round4h,
        analytics_round4i,
        analytics_round4j,
        analytics_round4k,
        analytics_round4l,
        analytics_round4m,
        analytics_round4n,
        analytics_round4o,
        analytics_round6,
        analytics_round7,
        analytics_round8,
        analytics_round9,
        analytics_round10,
        analytics_round11,
        asof_queries,
        curation_queries,
        dedup_queries,
        event_queries,
        governance_queries,
        graph_linkage_queries,
        ledger_queries,
        multimodal_queries,
        relational,
        relational_extra,
        relational_extra3,
        pipeline_queries,
        relational_tpch2,
        similarity_queries,
        streaming_queries,
        table_queries,
        text_queries,
    )

    return REGISTRY
