"""Synthetic `pipeline_runs` fixture (FIXTURES.md §1).

Hand-built ledger rows covering every scenario the reference's SQL can
distinguish (SURVEY.md §5): a continuous day, a gapped day, overlapping
windows (incl. an exactly-touching pair that must NOT match the half-open
overlap, reference overlap_checks.py:59-60), a midnight straddler (day-band
vs exact-ts disagreement, overlap_checks.py:52-53), a full status spread
with a timestamp tie, and empty-match partitions.

Deterministic and tiny (hand-verifiable); tests assert exact expected
outputs against these rows.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession

from sample_data_pipeline_project_spark.schema import PIPELINE_RUNS_SCHEMA

_D = dt.date
_T = dt.datetime


def _row(
    run_id: int,
    pipeline: str,
    index: str,
    status: str,
    start: _T,
    end: _T,
) -> tuple:
    return (run_id, pipeline, index, status, start, end, start.date(), end.date())


def pipeline_runs_rows() -> list[tuple]:
    """The fixture rows. Windows are 1h unless a scenario needs otherwise.

    Layout (pipeline 'etl', index 'idx_a' unless noted):
      2024-03-01  continuous: 00:00-01:00-02:00-03:00 (runs 1-3)
      2024-03-02  gapped: 00:00-01:00, 02:00-03:00, 05:00-06:00 (runs 4-6;
                  gaps [01:00,02:00) and [03:00,05:00))
      2024-03-03  overlaps: 00:00-02:00 x 01:00-03:00 (runs 7-8, true
                  overlap); 03:00-04:00 x 04:00-05:00 (runs 9-10, touching
                  -> NOT an overlap)
      2024-03-04  straddler: 23:00-01:00(+1d) (run 11) + 2024-03-05
                  00:30-01:30 (run 12) — overlap across the midnight line
      status spread on 'rep'/'idx_b' 2024-03-06 (runs 13-17: every status;
      runs 16-17 tie on start_ts, broken by run_id)
      'empty'/'idx_c' has rows ONLY on 2024-03-01 (run 18) so other days
      exercise the empty-result paths.
    """
    E = "etl"
    A = "idx_a"
    rows = [
        # continuous day
        _row(1, E, A, "completed", _T(2024, 3, 1, 0), _T(2024, 3, 1, 1)),
        _row(2, E, A, "completed", _T(2024, 3, 1, 1), _T(2024, 3, 1, 2)),
        _row(3, E, A, "completed", _T(2024, 3, 1, 2), _T(2024, 3, 1, 3)),
        # gapped day
        _row(4, E, A, "completed", _T(2024, 3, 2, 0), _T(2024, 3, 2, 1)),
        _row(5, E, A, "failed", _T(2024, 3, 2, 2), _T(2024, 3, 2, 3)),
        _row(6, E, A, "completed", _T(2024, 3, 2, 5), _T(2024, 3, 2, 6)),
        # overlapping + touching
        _row(7, E, A, "in_progress", _T(2024, 3, 3, 0), _T(2024, 3, 3, 2)),
        _row(8, E, A, "in_progress", _T(2024, 3, 3, 1), _T(2024, 3, 3, 3)),
        _row(9, E, A, "completed", _T(2024, 3, 3, 3), _T(2024, 3, 3, 4)),
        _row(10, E, A, "completed", _T(2024, 3, 3, 4), _T(2024, 3, 3, 5)),
        # midnight straddler overlapping a next-day run
        _row(11, E, A, "completed", _T(2024, 3, 4, 23), _T(2024, 3, 5, 1)),
        _row(12, E, A, "completed", _T(2024, 3, 5, 0, 30), _T(2024, 3, 5, 1, 30)),
        # status spread on another (pipeline, index)
        _row(13, "rep", "idx_b", "pending", _T(2024, 3, 6, 0), _T(2024, 3, 6, 1)),
        _row(14, "rep", "idx_b", "in_progress", _T(2024, 3, 6, 1), _T(2024, 3, 6, 2)),
        _row(15, "rep", "idx_b", "failed", _T(2024, 3, 6, 2), _T(2024, 3, 6, 3)),
        _row(16, "rep", "idx_b", "pending", _T(2024, 3, 6, 4), _T(2024, 3, 6, 5)),
        _row(17, "rep", "idx_b", "pending", _T(2024, 3, 6, 4), _T(2024, 3, 6, 5)),
        # sparse group for empty-path checks
        _row(18, "empty", "idx_c", "completed", _T(2024, 3, 1, 0), _T(2024, 3, 1, 1)),
    ]
    return rows


def pipeline_runs_fixture(spark: SparkSession) -> DataFrame:
    """The fixture as a DataFrame with the engine's ledger schema."""
    return spark.createDataFrame(pipeline_runs_rows(), PIPELINE_RUNS_SCHEMA)
