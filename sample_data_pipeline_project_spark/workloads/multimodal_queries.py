"""Multimodal workloads over real parquet data (rows-only checks).

The multimodal operators (multimodal/ops.py) are mapInPandas plumbing with
a stubbed codec — here they run against the driver's `documents` table by
treating each document's UTF-8 bytes as an opaque media payload (exactly
how a real pipeline treats undecoded JPEG/WAV blobs: bytes + metadata).
That scales the operators with the scale factor and puts them in the bench
loop. No SQL oracle exists for byte-level raster math, so these register
rows-only (the driver records the weaker check; unit tests in
tests/test_multimodal.py pin the numeric semantics on known rasters).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sample_data_pipeline_project_spark.multimodal.ops import (
    image_features,
    sample_frames,
)
from sample_data_pipeline_project_spark.sources.catalog import load_table
from sample_data_pipeline_project_spark.workloads import workload


def _docs_as_media(spark: SparkSession, sf_dir: str, kind: str, n_frames: int = 4) -> DataFrame:
    """documents -> MEDIA_SCHEMA-shaped frame: payload is the raw UTF-8
    byte blob, metadata synthesized (no codec in this container). Payload
    length is arbitrary per row — the ops only assume bytes+meta."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        F.col("doc_id").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            F.lit(16).alias("width"),
            (F.length(F.encode(F.col("text"), "UTF-8")) / 16)
            .cast("int")
            .alias("height"),
            F.lit(1).alias("channels"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(n_frames).alias("n_frames"),
        ).alias("meta"),
    )


@workload("multimodal_doc_features", oracle=None)
def multimodal_doc_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched feature extraction (mean/std/min/max intensity) over
    every document payload — the image-featurization hot path with the
    decode stubbed to identity. One numpy pass per blob, no per-row Python
    in the JVM boundary."""
    media = _docs_as_media(spark, sf_dir, "image")
    return image_features(media)


@workload("multimodal_frame_sample", oracle=None)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-style frame sampling: each payload split into 4 equal 'frames',
    every 2nd kept (posexplode shape — output rows > input rows). Returns
    frame sizes rather than frame bytes so the driver's collect stays
    light; the binary frames themselves are materialized inside the
    executors."""
    media = _docs_as_media(spark, sf_dir, "video", n_frames=4)
    frames = sample_frames(media, every_n=2)
    return frames.select(
        "media_id", "frame_idx", F.length(F.col("frame")).alias("frame_bytes")
    )


@workload("multimodal_audio_windows", oracle=None)
def multimodal_audio_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-style windowed feature extraction: every document payload
    treated as a uint8 sample stream, split into 256-sample windows with
    per-window RMS / peak / midpoint-crossing features (the speech-pipeline
    framing shape). Rows-only check; numeric semantics pinned on known
    waveforms in tests/test_multimodal.py."""
    from sample_data_pipeline_project_spark.multimodal.ops import (
        audio_window_energy,
    )

    media = _docs_as_media(spark, sf_dir, "audio")
    return audio_window_energy(media, window_samples=256)
