"""As-of join operator semantics: backward match, <= ties, left vs inner,
tiebreak determinism."""

from __future__ import annotations

import datetime as dt

import pytest

from sample_data_pipeline_project_spark.operators.asof import asof_join

_T = dt.datetime


@pytest.fixture(scope="module")
def quotes_trades(spark):
    trades = spark.createDataFrame(
        [
            (1, "A", _T(2024, 1, 1, 10, 0), 100.0),
            (2, "A", _T(2024, 1, 1, 10, 5), 101.0),
            (3, "B", _T(2024, 1, 1, 10, 2), 50.0),
            (4, "C", _T(2024, 1, 1, 10, 0), 7.0),  # no quotes at all
        ],
        "trade_id long, sym string, t_ts timestamp_ntz, price double",
    )
    quotes = spark.createDataFrame(
        [
            (11, "A", _T(2024, 1, 1, 9, 59), 99.5),
            (12, "A", _T(2024, 1, 1, 10, 0), 99.9),   # ties trade 1 exactly
            (13, "A", _T(2024, 1, 1, 10, 4), 100.8),
            (14, "B", _T(2024, 1, 1, 10, 3), 50.5),   # AFTER trade 3
        ],
        "quote_id long, sym string, q_ts timestamp_ntz, bid double",
    )
    return trades, quotes


def _match(rows):
    return {r["trade_id"]: r["quote_id"] for r in rows}


def test_backward_asof_with_equal_ts_tie(quotes_trades):
    trades, quotes = quotes_trades
    out = asof_join(
        trades, quotes, on=["sym"], left_ts="t_ts", right_ts="q_ts",
        right_tiebreak="quote_id",
    ).collect()
    got = _match(out)
    # trade 1 at 10:00 matches quote 12 stamped exactly 10:00 (<=, not <)
    assert got == {1: 12, 2: 13, 3: None, 4: None}


def test_inner_drops_unmatched(quotes_trades):
    trades, quotes = quotes_trades
    out = asof_join(
        trades, quotes, on=["sym"], left_ts="t_ts", right_ts="q_ts",
        right_tiebreak="quote_id", how="inner",
    ).collect()
    assert set(_match(out)) == {1, 2}


def test_simultaneous_right_rows_tiebreak(spark):
    left = spark.createDataFrame(
        [(1, "k", _T(2024, 1, 1, 12))], "lid long, k string, lts timestamp_ntz"
    )
    right = spark.createDataFrame(
        [(21, "k", _T(2024, 1, 1, 11)), (22, "k", _T(2024, 1, 1, 11))],
        "rid long, k string, rts timestamp_ntz",
    )
    out = asof_join(
        left, right, on=["k"], left_ts="lts", right_ts="rts", right_tiebreak="rid"
    ).collect()
    assert out[0]["rid"] == 22  # last in tiebreak order wins


def test_bad_how_rejected(quotes_trades):
    trades, quotes = quotes_trades
    with pytest.raises(ValueError, match="how must be"):
        asof_join(trades, quotes, on=["sym"], left_ts="t_ts", right_ts="q_ts", how="outer")


def test_inner_keeps_match_with_null_payload(spark):
    """A matched right row whose FIRST payload column is legitimately NULL
    must survive how='inner' (match presence is the struct, not a payload
    null-check)."""
    left = spark.createDataFrame(
        [(1, "A", _T(2024, 1, 1, 10, 0)), (2, "B", _T(2024, 1, 1, 10, 0))],
        "lid long, sym string, t_ts timestamp_ntz",
    )
    right = spark.createDataFrame(
        [(None, "A", _T(2024, 1, 1, 9, 0))],
        "bid double, sym string, q_ts timestamp_ntz",
    )
    out = asof_join(
        left, right, on=["sym"], left_ts="t_ts", right_ts="q_ts", how="inner"
    ).collect()
    assert [r["lid"] for r in out] == [1]
    assert out[0]["bid"] is None


def test_asof_forward_and_tolerance(spark):
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [(1, base + dt.timedelta(minutes=m), f"L{m}") for m in (0, 30, 300)],
        "k long, lts timestamp_ntz, lpay string",
    )
    right = spark.createDataFrame(
        [
            (1, base + dt.timedelta(minutes=-5), "R-5"),
            (1, base + dt.timedelta(minutes=30), "R30"),   # exact tie with L30
            (1, base + dt.timedelta(minutes=45), "R45"),
        ],
        "k long, rts timestamp_ntz, rpay string",
    )
    from sample_data_pipeline_project_spark.operators.asof import asof_join

    fwd = {
        r["lpay"]: r["rpay"]
        for r in asof_join(
            left, right, on=["k"], left_ts="lts", right_ts="rts",
            right_tiebreak="rpay", direction="forward",
        ).collect()
    }
    # L0 -> earliest at-or-after = R30; L30 -> tie matches (>=): R30;
    # L300 -> nothing after: null
    assert fwd == {"L0": "R30", "L30": "R30", "L300": None}

    tol = {
        r["lpay"]: r["rpay"]
        for r in asof_join(
            left, right, on=["k"], left_ts="lts", right_ts="rts",
            right_tiebreak="rpay", direction="forward", tolerance="10 MINUTES",
        ).collect()
    }
    # L0's nearest forward match R30 is outside the 10-minute tolerance
    assert tol == {"L0": None, "L30": "R30", "L300": None}

    back_tol = {
        r["lpay"]: r["rpay"]
        for r in asof_join(
            left, right, on=["k"], left_ts="lts", right_ts="rts",
            right_tiebreak="rpay", direction="backward", tolerance="10 MINUTES",
        ).collect()
    }
    # backward: L0 <- R-5 (within 10m); L30 <- R30 (tie); L300's last
    # view R45 is 4h15m back -> nulled
    assert back_tol == {"L0": "R-5", "L30": "R30", "L300": None}
