"""Snapshot versioning: time travel, append sharing, overwrite isolation,
atomic-commit visibility."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sample_data_pipeline_project_spark.sources.snapshots import (
    latest_version,
    snapshot_read,
    snapshot_write,
)


def test_append_versions_and_time_travel(spark, tmp_path):
    path = str(tmp_path / "snap")
    v1 = snapshot_write(spark.range(0, 10).withColumn("tag", F.lit("a")), path)
    v2 = snapshot_write(spark.range(10, 15).withColumn("tag", F.lit("b")), path)
    assert (v1, v2) == (1, 2)
    assert latest_version(path) == 2
    assert snapshot_read(spark, path).count() == 15          # latest
    assert snapshot_read(spark, path, 1).count() == 10       # time travel
    assert snapshot_read(spark, path, 2).filter("tag = 'b'").count() == 5


def test_overwrite_keeps_old_versions_readable(spark, tmp_path):
    path = str(tmp_path / "snap_ow")
    snapshot_write(spark.range(0, 100), path)
    snapshot_write(spark.range(0, 3), path, mode="overwrite")
    assert snapshot_read(spark, path).count() == 3
    assert snapshot_read(spark, path, 1).count() == 100


def test_unknown_version_raises(spark, tmp_path):
    path = str(tmp_path / "snap_missing")
    snapshot_write(spark.range(0, 1), path)
    with pytest.raises(ValueError):
        snapshot_read(spark, path, 99)
    with pytest.raises(ValueError):
        snapshot_read(spark, str(tmp_path / "nothing"))
