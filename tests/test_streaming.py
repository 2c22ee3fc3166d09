"""Structured Streaming: stream-vs-batch parity and stateful processing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sample_data_pipeline_project_spark.sources.catalog import load_table
from sample_data_pipeline_project_spark.streaming.eventtime import (
    dedup_stream,
    hourly_counts_stream,
    run_stream_to_table,
    session_counts_stream,
    stream_events,
    user_totals_stateful,
)

_SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_stream(spark):
    df = stream_events(spark, _SF_DIR)
    assert df.isStreaming
    return df


def test_hourly_stream_equals_batch(spark, events_stream):
    got = run_stream_to_table(hourly_counts_stream(events_stream))
    batch = (
        load_table(spark, _SF_DIR, "events")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
    )
    s = {(r["window_start"], r["event_type"]): r["n_events"] for r in got.collect()}
    b = {(r["window_start"], r["event_type"]): r["n_events"] for r in batch.collect()}
    assert s == b and len(s) > 0


def test_session_stream_total_events_conserved(spark, events_stream):
    got = run_stream_to_table(session_counts_stream(events_stream))
    rows = got.collect()
    assert sum(r["n_events"] for r in rows) == load_table(
        spark, _SF_DIR, "events"
    ).count()
    # session windows must be disjoint per user
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(
            (r["session_start"], r["session_end"])
        )
    for sessions in by_user.values():
        sessions.sort()
        for (s1, e1), (s2, e2) in zip(sessions, sessions[1:]):
            assert e1 <= s2, f"overlapping sessions {s1}-{e1} and {s2}-{e2}"


def test_stateful_user_totals_match_batch(spark, events_stream):
    got = run_stream_to_table(user_totals_stateful(events_stream), "update")
    batch = (
        load_table(spark, _SF_DIR, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    s = {r["user_id"]: r["n_events"] for r in got.collect()}
    b = {r["user_id"]: r["n_events"] for r in batch.collect()}
    assert s == b


def test_stream_dedup_recovers_original(spark):
    """Doubling the stream (union with itself) then streaming dedup on
    event_id must recover exactly the original events."""
    doubled = stream_events(spark, _SF_DIR).unionAll(stream_events(spark, _SF_DIR))
    got = run_stream_to_table(dedup_stream(doubled), "append")
    n_orig = load_table(spark, _SF_DIR, "events").count()
    rows = got.collect()
    assert len(rows) == n_orig
    ids = {r["event_id"] for r in rows}
    assert len(ids) == n_orig


def test_stream_minhash_dedup_equals_one_shot(spark, tmp_path):
    from pyspark.sql import functions as F

    from sample_data_pipeline_project_spark.operators.dedup import (
        minhash_lsh_candidates_incremental,
        minhash_signatures,
    )
    from sample_data_pipeline_project_spark.workloads.dedup_queries import (
        _INC_DELTA_MOD,
        _NUM_HASHES,
    )
    from sample_data_pipeline_project_spark.workloads.streaming_queries import (
        stream_minhash_dedup,
    )

    texts = ["alpha beta gamma delta", "alpha beta gamma epsilon",
             "unrelated words entirely here", "alpha beta gamma delta"]
    rows = [
        (i, texts[i % 4] + (" pad" + str(i // 4) if i % 7 == 0 else ""), "en",
         "s", 10)
        for i in range(60)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    streamed = {
        (r["a"], r["b"]) for r in stream_minhash_dedup(spark, str(tmp_path)).collect()
    }
    base = df.filter(F.col("doc_id") % _INC_DELTA_MOD != 0)
    delta = df.filter(F.col("doc_id") % _INC_DELTA_MOD == 0)
    one_shot = {
        (r["a"], r["b"])
        for r in minhash_lsh_candidates_incremental(
            minhash_signatures(base, _NUM_HASHES), delta, _NUM_HASHES
        ).collect()
    }
    assert streamed == one_shot and len(streamed) > 0


def test_ooo_gaps_batch_width_invariant(spark, monkeypatch):
    """Round-8 scale guard: stream_ledger_gaps_ooo's staging targets
    constant rows per micro-batch, so the batch COUNT scales with the
    corpus. The flushed gap set must be identical at any split width
    (ascending value ranges mean no row ever arrives below the
    watermark; the terminal availableNow batch flushes everything up to
    max - delay). Pin it: same data, default width (nb=4) vs forced
    10-batch staging -> identical rows."""
    from sample_data_pipeline_project_spark.workloads import (
        streaming_queries as sq,
    )

    sf = "/root/testdata/sf0.001"
    base = sorted(
        map(tuple, sq.stream_ledger_gaps_ooo(spark, sf).collect())
    )
    monkeypatch.setattr(sq, "_OOO_ROWS_PER_BATCH", 100)  # 1000 runs -> nb=10
    wide = sorted(
        map(tuple, sq.stream_ledger_gaps_ooo(spark, sf).collect())
    )
    assert base and base == wide


def test_run_stream_to_table_append_empty_source(spark, tmp_path):
    """An availableNow stream over a source with NO files executes no
    batch, so the file sink never creates its data directory; the
    append path must return an empty table (like the memory sink did),
    not raise PATH_NOT_FOUND."""
    src = tmp_path / "empty_src"
    src.mkdir()
    stream = (
        spark.readStream.schema("event_id long, user_id long")
        .parquet(str(src))
    )
    got = run_stream_to_table(stream, "append")
    assert got.count() == 0
    assert [f.name for f in got.schema.fields] == ["event_id", "user_id"]
