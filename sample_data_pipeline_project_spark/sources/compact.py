"""Small-file compaction: the table-maintenance pass every long-running
ingest needs.

Streaming and micro-batch writers (streaming/*, sources/cow.py) leave
many small parquet files behind; at cluster scale small files destroy
scan throughput (per-file open cost, tiny row groups, starved column
pruning) and overload the file listing. Compaction bin-packs each leaf
partition directory back to ~target-sized files.

Two forms:

- `compact_dir`: in-place, per leaf directory of a plain parquet layout.
  The rewrite itself is Spark-side (`coalesce(n)` — a NARROW repack, no
  shuffle); only file listing/renaming happens on the driver, which is
  how a real cluster does it too (driver lists, executors rewrite). The
  swap is not atomic for concurrent readers (plain parquet dirs have no
  commit protocol) — pair with `compact_snapshot` when readers are live.

- `compact_snapshot`: compaction as a manifest commit on a
  `sources/snapshots.py` table. Rewritten files land in the shared data
  pool and a NEW version manifest points at them; concurrent readers of
  any committed version are untouched and time travel keeps working.
  This is the lakehouse OPTIMIZE shape (Delta/Iceberg rewrite+commit).

Local-filesystem listing (os.walk) mirrors what a Hadoop FileSystem
listing would do on HDFS/S3; the Spark rewrite path is identical there.
"""

from __future__ import annotations

import math
import os
import shutil
import uuid

from pyspark.sql import SparkSession

from sample_data_pipeline_project_spark.sources.snapshots import (
    latest_version,
    snapshot_read,
    snapshot_write,
)


def _leaf_dirs(root: str) -> list[str]:
    """Directories under root that directly contain parquet part files."""
    out = []
    for dirpath, _dirnames, filenames in os.walk(root):
        if any(f.endswith(".parquet") and not f.startswith(".") for f in filenames):
            out.append(dirpath)
    return sorted(out)


def _part_files(d: str) -> list[str]:
    return sorted(
        os.path.join(d, f)
        for f in os.listdir(d)
        if f.endswith(".parquet") and not f.startswith(".")
    )


def compact_dir(
    spark: SparkSession, path: str, target_bytes: int = 128 * 1024 * 1024
) -> list[dict]:
    """Compact every leaf partition directory under `path` whose parquet
    files are smaller than they need to be. Returns a per-directory report
    [{dir, files_before, files_after, bytes}] (directories already compact
    are skipped and not reported)."""
    report: list[dict] = []
    for leaf in _leaf_dirs(path):
        files = _part_files(leaf)
        total = sum(os.path.getsize(f) for f in files)
        n_out = max(1, math.ceil(total / target_bytes))
        if n_out >= len(files):
            continue  # already at (or below) target granularity
        tmp = os.path.join(leaf, f"_compact_tmp_{uuid.uuid4().hex[:12]}")
        # Read the explicit file list (not the dir) so a partitioned
        # layout's directory-encoded columns are neither required nor
        # re-materialized — rows go back into the same leaf.
        spark.read.parquet(*files).coalesce(n_out).write.mode("error").parquet(tmp)
        new_files = _part_files(tmp)
        for f in files:
            os.remove(f)
        kept = []
        for f in new_files:
            dst = os.path.join(leaf, f"compact-{uuid.uuid4().hex[:12]}.parquet")
            os.rename(f, dst)
            kept.append(dst)
        shutil.rmtree(tmp)
        report.append(
            {
                "dir": leaf,
                "files_before": len(files),
                "files_after": len(kept),
                "bytes": total,
            }
        )
    return report


def compact_snapshot(
    spark: SparkSession, path: str, target_bytes: int = 128 * 1024 * 1024
) -> dict:
    """Rewrite the LATEST snapshot version's files into ~target-sized
    files and commit the result as a new version (old versions stay
    readable; concurrent readers never see a half-compacted table).
    Returns {version, files_before, files_after}."""
    v = latest_version(path)
    if v is None:
        raise ValueError(f"no snapshot versions at {path}")
    current = snapshot_read(spark, path, v)
    files = current.inputFiles()
    total = sum(os.path.getsize(f.removeprefix("file:")) for f in files)
    n_out = max(1, math.ceil(total / target_bytes))
    compacted = current.coalesce(n_out)
    new_v = snapshot_write(compacted, path, mode="overwrite")
    return {
        "version": new_v,
        "files_before": len(files),
        "files_after": len(snapshot_read(spark, path, new_v).inputFiles()),
    }
