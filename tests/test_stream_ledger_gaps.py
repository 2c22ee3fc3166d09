"""Streaming ledger-gap detection: cross-batch state (a gap spanning a
micro-batch boundary is caught; a continuous boundary is not) and parity
with the batch LAG formulation on real testdata."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from sample_data_pipeline_project_spark.streaming.eventtime import (
    ledger_gaps_stateful,
)

_RUN_SCHEMA = (
    "run_id long, pipeline_name string, index_name string, "
    "pipeline_status string, query_window_start_ts timestamp_ntz, "
    "query_window_end_ts timestamp_ntz, query_window_start_day date, "
    "query_window_end_day date"
)


def _runs(spark, rows):
    base = dt.datetime(2024, 1, 1)
    data = [
        (
            rid,
            "p",
            "i",
            "completed",
            base + dt.timedelta(minutes=start_m),
            base + dt.timedelta(minutes=end_m),
            base.date(),
            base.date(),
        )
        for rid, start_m, end_m in rows
    ]
    return spark.createDataFrame(data, _RUN_SCHEMA)


def _run_gaps(spark, src, ckpt, sink):
    stream = spark.readStream.schema(_RUN_SCHEMA).parquet(src)
    q = (
        ledger_gaps_stateful(stream)
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    q.stop()


def test_gap_across_batch_boundary_and_continuity(spark, tmp_path):
    src, ckpt, sink = (str(tmp_path / d) for d in ("src", "ckpt", "sink"))
    # batch 1: [0,10) then [10,20) — continuous; state ends at minute 20
    _runs(spark, [(1, 0, 10), (2, 10, 20)]).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    _run_gaps(spark, src, ckpt, sink)
    assert spark.read.parquet(sink).count() == 0

    # batch 2: [30,40) — gap 20->30 ACROSS the batch boundary (state),
    # then [40,50) continuous within the batch
    _runs(spark, [(3, 30, 40), (4, 40, 50)]).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    _run_gaps(spark, src, ckpt, sink)
    out = spark.read.parquet(sink).collect()
    assert len(out) == 1
    gap = out[0]
    base = dt.datetime(2024, 1, 1)
    assert gap["missing_from_ts"] == base + dt.timedelta(minutes=20)
    assert gap["missing_until_ts"] == base + dt.timedelta(minutes=30)


def test_stream_gaps_match_batch_lag_on_testdata(spark):
    from sample_data_pipeline_project_spark.ledger import tasks
    from sample_data_pipeline_project_spark.ledger.derive import derived_ledger
    from sample_data_pipeline_project_spark.workloads import load_all

    sf = "/root/testdata/sf0.001"
    got = {
        tuple(r)
        for r in load_all()["stream_ledger_gaps"].fn(spark, sf).collect()
    }
    want = {
        tuple(r)
        for r in tasks.gaps_df(derived_ledger(spark, sf))
        .select(
            "pipeline_name", "index_name", "day",
            "missing_from_ts", "missing_until_ts",
        )
        .collect()
    }
    assert got == want and len(got) > 0


def _run_gaps_ooo(spark, src, ckpt, sink, delay):
    from sample_data_pipeline_project_spark.streaming.eventtime import (
        ledger_gaps_ooo,
    )

    stream = (
        spark.readStream.schema(_RUN_SCHEMA)
        .option("maxFilesPerTrigger", 1)  # one micro-batch per file
        .parquet(src)
    )
    q = (
        ledger_gaps_ooo(stream, delay=delay)
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    q.stop()


def test_ooo_gaps_reorder_within_watermark(spark, tmp_path):
    """A row arriving LATE but inside the watermark delay must be
    re-sequenced before gap emission: arrival order A,B then C (C's
    event time is between A and B) yields the gap A.end->C.start, and
    NO false gap A.end->B.start."""
    src, ckpt, sink = (str(tmp_path / d) for d in ("src", "ckpt", "sink"))
    base = dt.datetime(2024, 1, 1)
    # minutes: A=[0,10) B=[30,40) arrive first; C=[25,30) arrives late;
    # sentinels D,E only advance the watermark (delay 30 min).
    for batch in ([(1, 0, 10), (2, 30, 40)], [(3, 25, 30)],
                  [(4, 120, 130)], [(5, 180, 190)]):
        _runs(spark, batch).coalesce(1).write.mode("append").parquet(src)
    _run_gaps_ooo(spark, src, ckpt, sink, delay="30 minutes")
    out = spark.read.parquet(sink).collect()
    gaps = {(r["missing_from_ts"], r["missing_until_ts"]) for r in out}
    assert (
        base + dt.timedelta(minutes=10),
        base + dt.timedelta(minutes=25),
    ) in gaps, gaps
    # the naive in-arrival-order gap [10 -> 30) must NOT appear
    assert (
        base + dt.timedelta(minutes=10),
        base + dt.timedelta(minutes=30),
    ) not in gaps, gaps


# ---------------------------------------------------------------------------
# Streaming debounce: cross-batch previous-event state
# ---------------------------------------------------------------------------
_EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _events(spark, rows):
    import datetime as dt

    base = dt.datetime(2024, 3, 1)
    data = [
        (eid, base + dt.timedelta(seconds=sec), uid, etype, 0.0, "{}")
        for eid, sec, uid, etype in rows
    ]
    return spark.createDataFrame(data, _EV_SCHEMA)


def _run_debounce(spark, src, ckpt, sink):
    from sample_data_pipeline_project_spark.streaming.eventtime import (
        debounce_stateful,
    )

    stream = spark.readStream.schema(_EV_SCHEMA).parquet(src)
    q = (
        debounce_stateful(stream)
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    q.stop()


def test_debounce_state_spans_batch_boundary(spark, tmp_path):
    src, ckpt, sink = (str(tmp_path / d) for d in ("esrc", "eckpt", "esink"))
    # batch 1: two view events 10s apart (second dropped), one click
    _events(
        spark, [(1, 0, 7, "view"), (2, 10, 7, "view"), (3, 20, 7, "click")]
    ).coalesce(1).write.mode("append").parquet(src)
    _run_debounce(spark, src, ckpt, sink)
    got = {r["event_id"]: r["dropped"] for r in spark.read.parquet(sink).collect()}
    assert got == {1: 0, 2: 1, 3: 0}

    # batch 2: a view 60s after batch 1's last view -> dropped via STATE;
    # a view 400s later -> kept (gap > 5 min); other user unaffected
    _events(
        spark, [(4, 70, 7, "view"), (5, 470, 7, "view"), (6, 480, 9, "view")]
    ).coalesce(1).write.mode("append").parquet(src)
    _run_debounce(spark, src, ckpt, sink)
    got = {r["event_id"]: r["dropped"] for r in spark.read.parquet(sink).collect()}
    assert got[4] == 1, "within-5-min repeat across batch boundary must drop"
    assert got[5] == 0, "gap beyond 5 min must keep"
    assert got[6] == 0, "first event for a new key must keep"


# ---------------------------------------------------------------------------
# Streaming overlap detection: pairs across micro-batch boundaries
# ---------------------------------------------------------------------------
def _run_overlaps(spark, src, ckpt, sink):
    from sample_data_pipeline_project_spark.streaming.eventtime import (
        ledger_overlaps_stateful,
    )

    stream = spark.readStream.schema(_RUN_SCHEMA).parquet(src)
    q = (
        ledger_overlaps_stateful(stream)
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    q.stop()


def test_overlap_pair_across_batch_boundary(spark, tmp_path):
    src, ckpt, sink = (str(tmp_path / d) for d in ("osrc", "ockpt", "osink"))
    # batch 1: [0,10) and [20,30) — no overlap
    _runs(spark, [(1, 0, 10), (2, 20, 30)]).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    _run_overlaps(spark, src, ckpt, sink)
    assert spark.read.parquet(sink).count() == 0

    # batch 2: [5,25) — overlaps BOTH batch-1 intervals via state;
    # each unordered pair appears as two ordered rows
    _runs(spark, [(3, 5, 25)]).coalesce(1).write.mode("append").parquet(src)
    _run_overlaps(spark, src, ckpt, sink)
    out = spark.read.parquet(sink).collect()
    pairs = {(r["source_run_id"], r["overlaps_with_run_id"]) for r in out}
    assert pairs == {(1, 3), (3, 1), (2, 3), (3, 2)}
    assert len(out) == 4
