"""Ledger task functions (Tier A), re-expressed Spark-first.

Reference surface (SURVEY.md §2):
  count_records_by_pipeline_status    A8   snowflake_tasks.py:65-138
  get_oldest_record_by_status         A11  snowflake_tasks.py:140-244
  get_latest_record_by_status         A11  snowflake_tasks.py:246-350
  get_discontinuous_query_windows     A13  snowflake_tasks.py:352-486
  find_overlapping_query_windows      A14  snowflake_tasks.py:488-584
  find_overlapping_records_for_input  A15  overlap_checks.py:4-107
  create_table_if_not_exists          A20  snowflake_tasks.py:9-62

Design: each task has a pure DataFrame *builder* (`*_df`) plus an
envelope-returning API function matching the reference's
`{query_id, payload}` contract (envelope.py). Builders are what the driver
harness (`__spark_entry__.queries`) exercises against the DuckDB oracle;
the envelope functions add the reference's logging/error/ISO-string edge.

Scale notes (100 TB ledger):
  - Every builder filters on `(pipeline_name, index_name)` and/or a day
    band FIRST — sargable predicates that Catalyst pushes into the parquet
    scan; with the ledger written partitioned by `query_window_start_day`
    (sources/ledger_io.py) the day band becomes partition pruning.
  - Gap detection windows are PARTITIONED by (pipeline, index, day) —
    unlike the reference's global-order LAG (snowflake_tasks.py:390-392),
    which would force a single reducer. Parallelism = #groups.
  - The overlap self-join equi-joins on (pipeline, index, overlap-day)
    and applies the theta overlap predicate as a join residual, so Spark
    plans a shuffled hash/sort-merge join instead of the
    BroadcastNestedLoopJoin a pure theta join would get (SURVEY.md §4).
  - Top-1 uses ORDER BY + LIMIT 1: Spark's TakeOrderedAndProject does a
    per-partition top-1 then a driver-side merge — no global sort.
"""

from __future__ import annotations

import datetime as _dt
from typing import Any

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sample_data_pipeline_project_spark.envelope import new_query_id, run_task
from sample_data_pipeline_project_spark.functions.intervals import (
    day_band,
    gap_after_previous,
    overlaps,
)
from sample_data_pipeline_project_spark.log_utils import LogBlock
from sample_data_pipeline_project_spark.schema import PIPELINE_STATUSES

_NAME_COLS = ("pipeline_name", "index_name")
_TS = "query_window_start_ts"
_TE = "query_window_end_ts"
_DS = "query_window_start_day"
_DE = "query_window_end_day"


def _check_status(status: str) -> None:
    if status not in PIPELINE_STATUSES:
        raise ValueError(
            f"invalid pipeline_status {status!r}; expected one of {PIPELINE_STATUSES}"
        )


def _parse_iso_ts(value: str, param: str) -> _dt.datetime:
    """ISO string -> naive datetime; raises ValueError on bad input
    (reference: overlap_checks.py:42-46)."""
    try:
        return _dt.datetime.fromisoformat(value)
    except (TypeError, ValueError) as exc:
        raise ValueError(f"invalid ISO timestamp for {param}: {value!r}") from exc


def _row_to_iso_dict(row: Any) -> dict[str, Any]:
    """Row -> dict with datetimes serialized to ISO strings (reference:
    snowflake_tasks.py:213-216,448-457 — A19)."""
    out = {}
    for k, v in row.asDict().items():
        out[k] = v.isoformat() if isinstance(v, (_dt.datetime, _dt.date)) else v
    return out


# --------------------------------------------------------------------------
# A8 — scalar COUNT by status
# --------------------------------------------------------------------------
def status_count_df(ledger: DataFrame, status: str) -> DataFrame:
    """COUNT(*) of runs in `status` (reference SQL: snowflake_tasks.py:95).
    Aggregation is partial (map-side) then a 1-row merge — no full shuffle."""
    _check_status(status)
    return ledger.filter(F.col("pipeline_status") == status).agg(
        F.count(F.lit(1)).alias("row_count")
    )


def count_records_by_pipeline_status(
    ledger: DataFrame, status: str, logger: LogBlock | None = None
) -> dict[str, Any]:
    """Reference: snowflake_tasks.py:65-138 -> {query_id, row_count}."""

    def _run() -> dict[str, Any]:
        row = status_count_df(ledger, status).first()
        return {"query_id": new_query_id(), "row_count": int(row["row_count"])}

    return run_task("count_records_by_pipeline_status", _run, logger, status=status)


# --------------------------------------------------------------------------
# A11 — oldest / latest record by status (ORDER BY .. LIMIT 1)
# --------------------------------------------------------------------------
def picked_record_df(ledger: DataFrame, status: str, latest: bool = False) -> DataFrame:
    """Top-1 by `query_window_start_ts` (reference: snowflake_tasks.py:
    173-178 ASC / 279-284 DESC). `run_id` tiebreak added for determinism
    (the reference's LIMIT 1 on ties is luck — SURVEY.md §7)."""
    _check_status(status)
    ts = F.col(_TS)
    order = [ts.desc(), F.col("run_id").desc()] if latest else [ts.asc(), F.col("run_id").asc()]
    return (
        ledger.filter(F.col("pipeline_status") == status)
        .orderBy(*order)
        .limit(1)
    )


def _pick_record(
    ledger: DataFrame, status: str, latest: bool, op: str, logger: LogBlock | None
) -> dict[str, Any]:
    def _run() -> dict[str, Any]:
        rows = picked_record_df(ledger, status, latest=latest).collect()
        record = _row_to_iso_dict(rows[0]) if rows else None  # A30 empty->None
        return {"query_id": new_query_id(), "record": record}

    return run_task(op, _run, logger, status=status)


def get_oldest_record_by_status(
    ledger: DataFrame, status: str, logger: LogBlock | None = None
) -> dict[str, Any]:
    """Reference: snowflake_tasks.py:140-244."""
    return _pick_record(ledger, status, False, "get_oldest_record_by_status", logger)


def get_latest_record_by_status(
    ledger: DataFrame, status: str, logger: LogBlock | None = None
) -> dict[str, Any]:
    """Reference: snowflake_tasks.py:246-350."""
    return _pick_record(ledger, status, True, "get_latest_record_by_status", logger)


# --------------------------------------------------------------------------
# A12/A13 — gap (discontinuity) detection via LAG
# --------------------------------------------------------------------------
def gaps_df(
    ledger: DataFrame,
    day: str | None = None,
    pipeline_name: str | None = None,
    index_name: str | None = None,
) -> DataFrame:
    """Rows whose window does not start where the previous one ended
    (reference SQL: snowflake_tasks.py:385-405 — LAG end_ts OVER (ORDER BY
    start_ts), gap where start != prev_end).

    The reference's window is unpartitioned because its filter already pins
    one (pipeline, index, day); we partition by those keys so the same
    query runs on the whole ledger with parallelism = #groups."""
    df = ledger
    if pipeline_name is not None:
        df = df.filter(F.col("pipeline_name") == pipeline_name)
    if index_name is not None:
        df = df.filter(F.col("index_name") == index_name)
    if day is not None:
        df = df.filter(F.col(_DS) == F.to_date(F.lit(day)))
    w = (
        Window.partitionBy("pipeline_name", "index_name", _DS)
        .orderBy(F.col(_TS).asc(), F.col("run_id").asc())
    )
    return (
        df.withColumn("prev_end_ts", F.lag(_TE).over(w))
        .filter(gap_after_previous(F.col(_TS), F.col("prev_end_ts")))
        .select(
            "pipeline_name",
            "index_name",
            F.col(_DS).alias("day"),
            F.col("prev_end_ts").alias("missing_from_ts"),
            F.col(_TS).alias("missing_until_ts"),
        )
    )


def get_discontinuous_query_windows(
    ledger: DataFrame,
    day: str,
    pipeline_name: str,
    index_name: str,
    logger: LogBlock | None = None,
) -> dict[str, Any]:
    """Reference: snowflake_tasks.py:352-486 -> {query_id, is_continuous,
    discontinuities: [ {missing_from_ts, missing_until_ts}, ... ]}."""

    def _run() -> dict[str, Any]:
        rows = gaps_df(ledger, day, pipeline_name, index_name).collect()
        discontinuities = [
            {
                "missing_from_ts": r["missing_from_ts"].isoformat(),
                "missing_until_ts": r["missing_until_ts"].isoformat(),
            }
            for r in rows
        ]
        return {
            "query_id": new_query_id(),
            "is_continuous": not discontinuities,  # A30: empty -> True
            "discontinuities": discontinuities,
        }

    return run_task(
        "get_discontinuous_query_windows",
        _run,
        logger,
        day=day,
        pipeline_name=pipeline_name,
        index_name=index_name,
    )


# --------------------------------------------------------------------------
# A14 — overlap self-join within a day
# --------------------------------------------------------------------------
def overlap_pairs_df(
    ledger: DataFrame,
    pipeline_name: str | None = None,
    index_name: str | None = None,
    day: str | None = None,
) -> DataFrame:
    """Directed pairs of runs whose windows overlap (reference SQL:
    snowflake_tasks.py:530-549: day-filtered CTE self-joined on the
    half-open overlap, self-pairs excluded).

    Scale shape: both sides share the sargable pre-filters, and the join is
    an EQUI-join on (pipeline_name, index_name) with the theta overlap
    predicate as a residual — a shuffled hash join keyed on low-skew
    columns, not a nested-loop cross product. Self-pair exclusion uses
    `run_id`, not the reference's lossy `start_ts != start_ts`
    (snowflake_tasks.py:548), so distinct runs sharing a start_ts are kept.

    The day filter is the reference's exact half-open day interval
    (snowflake_tasks.py:525-537: `start_ts < DATEADD(day, 1, date) AND
    end_ts > 'date 00:00:00'`) — a window ending exactly at the day's
    midnight does NOT belong to the day. The coarse day-band runs first as
    the sargable partition-pruning pre-filter, the timestamp test as the
    exact residual."""
    df = ledger
    if pipeline_name is not None:
        df = df.filter(F.col("pipeline_name") == pipeline_name)
    if index_name is not None:
        df = df.filter(F.col("index_name") == index_name)
    if day is not None:
        d = F.to_date(F.lit(day))
        day_start = d.cast("timestamp_ntz")
        day_end = F.date_add(d, 1).cast("timestamp_ntz")
        df = df.filter(
            day_band(F.col(_DS), F.col(_DE), d, d)
            & (F.col(_TS) < day_end)
            & (F.col(_TE) > day_start)
        )
    t1, t2 = df.alias("t1"), df.alias("t2")
    c = lambda side, name: F.col(f"{side}.{name}")  # noqa: E731
    cond = (
        (c("t1", "pipeline_name") == c("t2", "pipeline_name"))
        & (c("t1", "index_name") == c("t2", "index_name"))
        & overlaps(c("t1", _TS), c("t1", _TE), c("t2", _TS), c("t2", _TE))
        & (c("t1", "run_id") != c("t2", "run_id"))
    )
    return t1.join(t2, cond, "inner").select(
        c("t1", "pipeline_name").alias("pipeline_name"),
        c("t1", "index_name").alias("index_name"),
        c("t1", "run_id").alias("source_run_id"),
        c("t1", _TS).alias("source_window_start_ts"),
        c("t1", _TE).alias("source_window_end_ts"),
        c("t2", "run_id").alias("overlaps_with_run_id"),
        c("t2", _TS).alias("overlaps_with_start_ts"),
        c("t2", _TE).alias("overlaps_with_end_ts"),
    )


def find_overlapping_query_windows(
    ledger: DataFrame,
    pipeline_name: str,
    index_name: str,
    date_str: str,
    logger: LogBlock | None = None,
) -> dict[str, Any]:
    """Reference: snowflake_tasks.py:488-584 -> {query_id, data}."""

    def _run() -> dict[str, Any]:
        data = overlap_pairs_df(ledger, pipeline_name, index_name, date_str).orderBy(
            "source_window_start_ts", "overlaps_with_start_ts", "source_run_id"
        )
        return {"query_id": new_query_id(), "data": data}

    return run_task(
        "find_overlapping_query_windows",
        _run,
        logger,
        pipeline_name=pipeline_name,
        index_name=index_name,
        date_str=date_str,
    )


# --------------------------------------------------------------------------
# A15 — overlap against a caller-supplied interval
# --------------------------------------------------------------------------
def overlap_input_df(
    ledger: DataFrame,
    pipeline_name: str,
    index_name: str,
    start_ts: str,
    end_ts: str,
) -> DataFrame:
    """Runs whose window overlaps the caller's [start_ts, end_ts)
    (reference SQL: overlap_checks.py:48-61). Two-stage refinement kept:
    sargable day band first (scan-prunable), exact half-open test second."""
    s = _parse_iso_ts(start_ts, "start_ts")
    e = _parse_iso_ts(end_ts, "end_ts")
    if e <= s:
        raise ValueError(f"end_ts {end_ts!r} must be after start_ts {start_ts!r}")
    s_day, e_day = F.lit(s.date()), F.lit(e.date())
    s_lit = F.lit(s).cast("timestamp_ntz")
    e_lit = F.lit(e).cast("timestamp_ntz")
    return (
        ledger.filter(
            (F.col("pipeline_name") == pipeline_name)
            & (F.col("index_name") == index_name)
        )
        .filter(day_band(F.col(_DS), F.col(_DE), s_day, e_day))
        .filter(overlaps(F.col(_TS), F.col(_TE), s_lit, e_lit))
    )


def find_overlapping_records_for_input(
    ledger: DataFrame,
    pipeline_name: str,
    index_name: str,
    start_ts: str,
    end_ts: str,
    logger: LogBlock | None = None,
) -> dict[str, Any]:
    """Reference: overlap_checks.py:4-107 -> {query_id, data}."""

    def _run() -> dict[str, Any]:
        data = overlap_input_df(ledger, pipeline_name, index_name, start_ts, end_ts)
        return {"query_id": new_query_id(), "data": data}

    return run_task(
        "find_overlapping_records_for_input",
        _run,
        logger,
        pipeline_name=pipeline_name,
        index_name=index_name,
        start_ts=start_ts,
        end_ts=end_ts,
    )


# --------------------------------------------------------------------------
# A20 — DDL
# --------------------------------------------------------------------------
def create_table_if_not_exists(
    spark: SparkSession, create_query: str, logger: LogBlock | None = None
) -> dict[str, Any]:
    """Reference: snowflake_tasks.py:9-62 — caller supplies the full DDL
    string; engine executes it idempotently -> {query_id, executed}."""

    def _run() -> dict[str, Any]:
        spark.sql(create_query)
        return {"query_id": new_query_id(), "executed": True}

    return run_task("create_table_if_not_exists", _run, logger)
