"""Checkpointed incremental processing: restarting a streaming query from
its checkpoint must process ONLY data that arrived since the last run —
the exactly-once file-source contract a 100 TB ingest pipeline relies on
(each restart re-reading the full corpus would be quadratic)."""

from __future__ import annotations

from pyspark.sql import functions as F


def _run_once(spark, src, ckpt, sink):
    stream = (
        spark.readStream.schema("event_id long, user_id long, value double")
        .parquet(src)
        .withColumn("doubled", F.col("value") * 2)
    )
    q = (
        stream.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    q.stop()


def test_checkpoint_resume_processes_only_new_files(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")
    batch1 = spark.range(0, 100).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 7).alias("user_id"),
        (F.col("id") * 1.5).alias("value"),
    )
    batch1.coalesce(1).write.mode("append").parquet(src)
    _run_once(spark, src, ckpt, sink)
    assert spark.read.parquet(sink).count() == 100

    batch2 = spark.range(100, 150).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 7).alias("user_id"),
        (F.col("id") * 1.5).alias("value"),
    )
    batch2.coalesce(1).write.mode("append").parquet(src)
    _run_once(spark, src, ckpt, sink)

    out = spark.read.parquet(sink)
    # every event exactly once across both runs — no reprocessing, no loss
    assert out.count() == 150
    assert out.select("event_id").distinct().count() == 150
    assert out.filter(F.col("doubled") != F.col("value") * 2).count() == 0
