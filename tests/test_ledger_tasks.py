"""Ledger task semantics against the hand-built fixture (FIXTURES.md §1).

Every scenario the reference's SQL distinguishes gets an exact-expected
assertion: continuity, gaps, true overlaps vs touching windows (half-open),
midnight straddlers, status counts, top-1 determinism, empty paths, and
input validation.
"""

from __future__ import annotations

import datetime as dt

import pytest

from sample_data_pipeline_project_spark.ledger.tasks import (
    count_records_by_pipeline_status,
    find_overlapping_records_for_input,
    gaps_df,
    get_discontinuous_query_windows,
    get_latest_record_by_status,
    get_oldest_record_by_status,
    overlap_input_df,
    overlap_pairs_df,
    picked_record_df,
    status_count_df,
)

_T = dt.datetime


# -- A8 status count ------------------------------------------------------
def test_status_count(ledger):
    assert status_count_df(ledger, "completed").first()["row_count"] == 10
    assert status_count_df(ledger, "pending").first()["row_count"] == 3


def test_status_count_envelope(ledger):
    out = count_records_by_pipeline_status(ledger, "failed")
    assert set(out) == {"query_id", "row_count"}
    assert out["row_count"] == 2


def test_status_count_rejects_bad_status(ledger):
    with pytest.raises(ValueError, match="invalid pipeline_status"):
        status_count_df(ledger, "nope")


# -- A11 oldest/latest ----------------------------------------------------
def test_oldest_latest_and_tie_break(ledger):
    oldest = picked_record_df(ledger, "pending").first()
    assert oldest["run_id"] == 13
    # runs 16 and 17 tie on start_ts; run_id breaks the tie deterministically
    latest = picked_record_df(ledger, "pending", latest=True).first()
    assert latest["run_id"] == 17


def test_record_envelope_serializes_iso(ledger):
    rec = get_oldest_record_by_status(ledger, "pending")["record"]
    assert rec["query_window_start_ts"] == "2024-03-06T00:00:00"
    assert rec["query_window_start_day"] == "2024-03-06"


def test_record_empty_is_none(ledger):
    no_rows = ledger.filter("pipeline_name = 'nothing'")
    assert get_latest_record_by_status(no_rows, "failed")["record"] is None


# -- A12/A13 gaps ---------------------------------------------------------
def test_continuous_day_has_no_gaps(ledger):
    assert gaps_df(ledger, "2024-03-01", "etl", "idx_a").count() == 0


def test_gapped_day_reports_each_gap(ledger):
    rows = gaps_df(ledger, "2024-03-02", "etl", "idx_a").orderBy(
        "missing_from_ts"
    ).collect()
    got = [(r["missing_from_ts"], r["missing_until_ts"]) for r in rows]
    assert got == [
        (_T(2024, 3, 2, 1), _T(2024, 3, 2, 2)),
        (_T(2024, 3, 2, 3), _T(2024, 3, 2, 5)),
    ]


def test_gap_envelope_contract(ledger):
    ok = get_discontinuous_query_windows(ledger, "2024-03-01", "etl", "idx_a")
    assert ok["is_continuous"] is True and ok["discontinuities"] == []
    bad = get_discontinuous_query_windows(ledger, "2024-03-02", "etl", "idx_a")
    assert bad["is_continuous"] is False
    assert bad["discontinuities"][0] == {
        "missing_from_ts": "2024-03-02T01:00:00",
        "missing_until_ts": "2024-03-02T02:00:00",
    }


def test_gaps_empty_partition_is_continuous(ledger):
    out = get_discontinuous_query_windows(ledger, "2024-03-02", "empty", "idx_c")
    assert out["is_continuous"] is True


# -- A14 overlap self-join ------------------------------------------------
def test_overlap_pairs_directed_and_half_open(ledger):
    rows = overlap_pairs_df(ledger, "etl", "idx_a", "2024-03-03").collect()
    pairs = {(r["source_run_id"], r["overlaps_with_run_id"]) for r in rows}
    # both directions of the true overlap; the touching pair (9,10) absent
    assert pairs == {(7, 8), (8, 7)}


def test_overlap_pairs_cross_midnight(ledger):
    rows = overlap_pairs_df(ledger, "etl", "idx_a", "2024-03-05").collect()
    pairs = {(r["source_run_id"], r["overlaps_with_run_id"]) for r in rows}
    assert pairs == {(11, 12), (12, 11)}


# -- A15 overlap vs input window -----------------------------------------
def test_overlap_input_half_open_touching_excluded(ledger):
    # input ends exactly where run 1 starts -> no match (half-open)
    df = overlap_input_df(
        ledger, "etl", "idx_a", "2024-02-29T23:00:00", "2024-03-01T00:00:00"
    )
    assert df.count() == 0
    # one second past the boundary -> run 1 matches
    df2 = overlap_input_df(
        ledger, "etl", "idx_a", "2024-02-29T23:00:00", "2024-03-01T00:00:01"
    )
    assert [r["run_id"] for r in df2.collect()] == [1]


def test_overlap_input_straddler_found_from_next_day(ledger):
    # run 11 (23:00 -> 01:00 next day) must be found by a window that only
    # touches 2024-03-05 — the day-band filter must use BOTH day columns
    df = overlap_input_df(
        ledger, "etl", "idx_a", "2024-03-05T00:00:00", "2024-03-05T00:15:00"
    )
    assert {r["run_id"] for r in df.collect()} == {11}


def test_overlap_input_validation(ledger):
    with pytest.raises(ValueError, match="invalid ISO timestamp"):
        overlap_input_df(ledger, "etl", "idx_a", "not-a-ts", "2024-03-01T00:00:00")
    with pytest.raises(ValueError, match="must be after"):
        overlap_input_df(
            ledger, "etl", "idx_a", "2024-03-02T00:00:00", "2024-03-01T00:00:00"
        )


def test_overlap_input_envelope(ledger):
    out = find_overlapping_records_for_input(
        ledger, "etl", "idx_a", "2024-03-03T00:30:00", "2024-03-03T01:30:00"
    )
    assert set(out) == {"query_id", "data"}
    assert {r["run_id"] for r in out["data"].collect()} == {7, 8}


def test_overlap_pairs_day_plus_one_boundary(spark):
    """Reference DATEADD(day, 1) semantics (snowflake_tasks.py:525-537):
    the day filter is the exact half-open interval [day 00:00, day+1
    00:00), so a window ending exactly at the probed day's midnight does
    NOT belong to that day — even though its end_DAY column equals the
    probed day (the coarse band alone would wrongly admit it)."""
    from sample_data_pipeline_project_spark.schema import PIPELINE_RUNS_SCHEMA

    def row(rid, start, end):
        return (rid, "etl", "idx_d", "completed", start, end,
                start.date(), end.date())

    led = spark.createDataFrame(
        [
            # ends exactly at 03-08 midnight: belongs to 03-07 only
            row(19, _T(2024, 3, 7, 23, 30), _T(2024, 3, 8, 0)),
            # straddler genuinely in both days; overlaps run 19 on 03-07
            row(20, _T(2024, 3, 7, 23), _T(2024, 3, 8, 1)),
        ],
        PIPELINE_RUNS_SCHEMA,
    )
    on_7 = {
        (r["source_run_id"], r["overlaps_with_run_id"])
        for r in overlap_pairs_df(led, "etl", "idx_d", "2024-03-07").collect()
    }
    assert on_7 == {(19, 20), (20, 19)}
    # On 03-08 run 19 is out of scope (end_ts == midnight, not >), so the
    # straddler has nothing to pair with.
    assert overlap_pairs_df(led, "etl", "idx_d", "2024-03-08").count() == 0
