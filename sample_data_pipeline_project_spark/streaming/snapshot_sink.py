"""Exactly-once streaming sink: foreachBatch + snapshot manifest commits.

Structured Streaming's parquet sink is at-least-once at the FILE level on
retries; pairing `foreachBatch` with the manifest commit protocol from
`sources/snapshots.py` upgrades it: each micro-batch commits one snapshot
version tagged with its batch id, and a replayed batch (same id — Spark
replays with identical ids after failure/restart) is detected from the
last manifest and SKIPPED, so downstream readers of the latest version
see every input row exactly once. This is the idempotent-sink pattern a
100 TB ingest pipeline pairs with checkpointed sources; the manifest is
the atomic commit point, so a crash between data write and manifest write
leaves only invisible orphan files, never a partial version.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame

from sample_data_pipeline_project_spark.sources.snapshots import (
    _manifest_dir,
    latest_version,
    snapshot_write,
)


def _last_committed_batch(path: str) -> int | None:
    v = latest_version(path)
    if v is None:
        return None
    with open(os.path.join(_manifest_dir(path), f"v{v}.json")) as fh:
        return json.load(fh).get("batch_id")


def _commit_batch(batch_df: DataFrame, batch_id: int, path: str) -> None:
    last = _last_committed_batch(path)
    if last is not None and batch_id <= last:
        return  # replayed batch — already committed, exactly-once preserved
    # batch_id rides inside the manifest itself, so the manifest link is
    # the single atomic commit point: a crash/retry either sees no new
    # version (and rewrites it idempotently) or a version that already
    # carries its batch_id — never a committed version without one.
    snapshot_write(batch_df, path, mode="append", extra={"batch_id": batch_id})


def write_stream_snapshots(stream_df: DataFrame, path: str, checkpoint: str):
    """Run `stream_df` to completion (availableNow) committing one snapshot
    version per micro-batch, idempotent on batch id. Returns after the
    stream drains; read the result with `snapshot_read(spark, path)`."""
    q = (
        stream_df.writeStream.foreachBatch(
            lambda df, bid: _commit_batch(df, bid, path)
        )
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    q.stop()
