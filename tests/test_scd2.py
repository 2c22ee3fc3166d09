"""SCD type-2 operator: changelog -> versioned history semantics, and
incremental apply_changes == full rebuild (the maintenance invariant)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from sample_data_pipeline_project_spark.operators.scd2 import (
    END_OF_TIME,
    scd2_apply_changes,
    scd2_from_changelog,
)

_EOT = dt.datetime(2262, 1, 1)


def _ts(day: int) -> dt.datetime:
    return dt.datetime(2024, 1, day)


def _changes(spark, rows):
    return spark.createDataFrame(rows, "key string, ts timestamp_ntz, val string, seq long")


def _history(df):
    return {
        (r["key"], r["val"], r["valid_from"], r["valid_to"], r["is_current"])
        for r in df.collect()
    }


def test_basic_history(spark):
    df = _changes(
        spark,
        [
            ("k1", _ts(1), "a", 1),
            ("k1", _ts(3), "b", 2),
            ("k1", _ts(7), "c", 3),
            ("k2", _ts(2), "x", 4),
        ],
    )
    got = _history(scd2_from_changelog(df, ["key"], "ts", ["val"], "seq"))
    assert got == {
        ("k1", "a", _ts(1), _ts(3), False),
        ("k1", "b", _ts(3), _ts(7), False),
        ("k1", "c", _ts(7), _EOT, True),
        ("k2", "x", _ts(2), _EOT, True),
    }


def test_same_ts_duplicates_resolved_by_tiebreak(spark):
    df = _changes(
        spark,
        [
            ("k1", _ts(1), "a", 1),
            ("k1", _ts(5), "loser", 2),
            ("k1", _ts(5), "winner", 9),
        ],
    )
    got = _history(scd2_from_changelog(df, ["key"], "ts", ["val"], "seq"))
    assert got == {
        ("k1", "a", _ts(1), _ts(5), False),
        ("k1", "winner", _ts(5), _EOT, True),
    }


def test_noop_changes_collapse(spark):
    df = _changes(
        spark,
        [
            ("k1", _ts(1), "a", 1),
            ("k1", _ts(3), "a", 2),  # no-op: must not open a version
            ("k1", _ts(6), "b", 3),
            ("k1", _ts(8), "b", 4),  # no-op again
        ],
    )
    got = _history(scd2_from_changelog(df, ["key"], "ts", ["val"], "seq"))
    assert got == {
        ("k1", "a", _ts(1), _ts(6), False),
        ("k1", "b", _ts(6), _EOT, True),
    }


def test_null_attr_versions_null_safely(spark):
    df = _changes(
        spark,
        [
            ("k1", _ts(1), None, 1),
            ("k1", _ts(2), None, 2),  # NULL -> NULL is a no-op
            ("k1", _ts(4), "a", 3),
        ],
    )
    got = _history(scd2_from_changelog(df, ["key"], "ts", ["val"], "seq"))
    assert got == {
        ("k1", None, _ts(1), _ts(4), False),
        ("k1", "a", _ts(4), _EOT, True),
    }


def test_intervals_tile_and_one_current_per_key(spark):
    df = _changes(
        spark,
        [(f"k{i % 5}", _ts(1 + (i * 3) % 20), f"v{i % 4}", i) for i in range(40)],
    )
    hist = scd2_from_changelog(df, ["key"], "ts", ["val"], "seq")
    rows = hist.collect()
    assert all(r["valid_from"] < r["valid_to"] for r in rows)
    per_key: dict[str, list] = {}
    for r in rows:
        per_key.setdefault(r["key"], []).append(r)
    for key_rows in per_key.values():
        key_rows.sort(key=lambda r: r["valid_from"])
        assert sum(r["is_current"] for r in key_rows) == 1
        assert key_rows[-1]["is_current"] and key_rows[-1]["valid_to"] == _EOT
        for a, b in zip(key_rows, key_rows[1:]):
            assert a["valid_to"] == b["valid_from"]  # half-open tiling, no gaps


def test_apply_changes_equals_full_rebuild(spark):
    full = [
        ("k1", _ts(1), "a", 1),
        ("k1", _ts(4), "b", 2),
        ("k2", _ts(2), "x", 3),
        # --- batch boundary ---
        ("k1", _ts(9), "c", 4),
        ("k2", _ts(9), "x", 5),  # no-op change arriving in the batch
        ("k3", _ts(10), "new", 6),  # brand-new key
    ]
    base = _changes(spark, full[:3])
    batch = _changes(spark, full[3:])
    dim = scd2_from_changelog(base, ["key"], "ts", ["val"], "seq")
    merged = scd2_apply_changes(dim, batch, ["key"], "ts", ["val"], "seq")
    rebuilt = scd2_from_changelog(
        _changes(spark, full), ["key"], "ts", ["val"], "seq"
    )
    assert _history(merged) == _history(rebuilt)


def test_apply_changes_batch_wins_same_ts_collision(spark):
    base = _changes(spark, [("k1", _ts(5), "old", 1)])
    dim = scd2_from_changelog(base, ["key"], "ts", ["val"], "seq")
    batch = _changes(spark, [("k1", _ts(5), "corrected", 2)])
    merged = scd2_apply_changes(dim, batch, ["key"], "ts", ["val"], "seq")
    assert _history(merged) == {("k1", "corrected", _ts(5), _EOT, True)}


def test_end_of_time_constant_matches(spark):
    assert dt.datetime.fromisoformat(END_OF_TIME.replace(" ", "T")) == _EOT
    df = _changes(spark, [("k", _ts(1), "v", 1)])
    row = scd2_from_changelog(df, ["key"], "ts", ["val"], "seq").first()
    assert row["valid_to"] == _EOT and bool(row["is_current"])


def test_closed_rows_pass_through_untouched(spark):
    base = _changes(spark, [("k1", _ts(1), "a", 1), ("k1", _ts(3), "b", 2)])
    dim = scd2_from_changelog(base, ["key"], "ts", ["val"], "seq")
    batch = _changes(spark, [("k1", _ts(8), "c", 3)])
    merged = scd2_apply_changes(dim, batch, ["key"], "ts", ["val"], "seq")
    closed = merged.filter(~F.col("is_current"))
    assert _history(closed) == {
        ("k1", "a", _ts(1), _ts(3), False),
        ("k1", "b", _ts(3), _ts(8), False),
    }
