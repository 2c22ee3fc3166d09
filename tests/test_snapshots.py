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


def test_streaming_snapshot_sink_exactly_once(spark, tmp_path):
    """foreachBatch + manifest commits: one version per micro-batch,
    replayed batch ids are skipped, restart processes only new input."""
    from sample_data_pipeline_project_spark.streaming.snapshot_sink import (
        _commit_batch,
        write_stream_snapshots,
    )

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    spark.range(0, 40).coalesce(1).write.mode("append").parquet(src)
    spark.range(40, 70).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema("id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    write_stream_snapshots(stream, out, ckpt)
    assert latest_version(out) == 2  # one version per micro-batch
    assert snapshot_read(spark, out).count() == 70

    # replayed batch id (failure rerun) must be a no-op
    _commit_batch(spark.range(0, 40), 0, out)
    assert latest_version(out) == 2
    assert snapshot_read(spark, out).count() == 70

    # restart with the same checkpoint: only newly-arrived input commits
    spark.range(70, 75).coalesce(1).write.mode("append").parquet(src)
    stream2 = (
        spark.readStream.schema("id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    write_stream_snapshots(stream2, out, ckpt)
    final = snapshot_read(spark, out)
    assert final.count() == 75
    assert final.select("id").distinct().count() == 75


def test_expire_versions_keeps_live_data(spark, tmp_path):
    from sample_data_pipeline_project_spark.sources.snapshots import (
        expire_versions,
        latest_version,
        snapshot_read,
        snapshot_write,
    )

    path = str(tmp_path / "vac")
    for i in range(4):
        snapshot_write(spark.range(i * 10, (i + 1) * 10), path, mode="append")
    before = sorted(r["id"] for r in snapshot_read(spark, path).collect())

    out = expire_versions(path, keep_last=2)
    assert out["versions_dropped"] == 2
    # append-mode manifests share files: v3's files are all live via v4,
    # so only files referenced by NO surviving manifest get deleted
    assert out["files_deleted"] == 0
    assert sorted(r["id"] for r in snapshot_read(spark, path).collect()) == before
    assert latest_version(path) == 4

    # overwrite orphans the old pool; vacuum to 1 version reclaims it
    snapshot_write(spark.range(5), path, mode="overwrite")
    out = expire_versions(path, keep_last=1)
    assert out["versions_dropped"] == 2 and out["files_deleted"] > 0
    assert out["bytes_deleted"] > 0
    assert snapshot_read(spark, path).count() == 5


def test_expire_versions_old_version_unreadable_after(spark, tmp_path):
    import pytest

    from sample_data_pipeline_project_spark.sources.snapshots import (
        expire_versions,
        snapshot_read,
        snapshot_write,
    )

    path = str(tmp_path / "vac2")
    snapshot_write(spark.range(3), path)
    snapshot_write(spark.range(3, 6), path, mode="append")
    expire_versions(path, keep_last=1)
    with pytest.raises(ValueError):
        snapshot_read(spark, path, 1)


def test_extra_metadata_in_committed_manifest(spark, tmp_path):
    """`extra` rides inside the manifest that the atomic link commits —
    no second rewrite after the commit point."""
    import json
    import os

    from sample_data_pipeline_project_spark.sources.snapshots import _manifest_dir

    path = str(tmp_path / "snap_extra")
    v = snapshot_write(spark.range(3), path, extra={"batch_id": 7})
    with open(os.path.join(_manifest_dir(path), f"v{v}.json")) as fh:
        mf = json.load(fh)
    assert mf["batch_id"] == 7
    assert mf["version"] == v


def test_concurrent_writer_race_rebases_not_clobbers(spark, tmp_path):
    """If another writer commits the version this writer computed, the
    exclusive link fails and the writer rebases to the next version —
    the winner's manifest survives untouched."""
    import json
    import os

    from sample_data_pipeline_project_spark.sources import snapshots as S

    path = str(tmp_path / "snap_race")
    snapshot_write(spark.range(5).withColumn("tag", F.lit("a")), path)

    # Simulate a racing writer: the moment this writer reads latest_version,
    # the rival commits v2 out from under it.
    real_latest = S.latest_version
    fired = {"done": False}

    def racing_latest(p):
        v = real_latest(p)
        if not fired["done"]:
            fired["done"] = True
            mdir = S._manifest_dir(p)
            rival = os.path.join(mdir, "v2.json")
            with open(rival, "w") as fh:
                json.dump({"version": 2, "files": S._read_manifest(p, 1)}, fh)
        return v

    S.latest_version, orig = racing_latest, S.latest_version
    try:
        v = snapshot_write(spark.range(5, 9).withColumn("tag", F.lit("b")), path)
    finally:
        S.latest_version = orig
    assert v == 3  # rebased past the rival's v2, did not clobber it
    with open(os.path.join(S._manifest_dir(path), "v2.json")) as fh:
        assert json.load(fh)["version"] == 2  # winner intact
    assert snapshot_read(spark, path, 3).count() == 9  # rebase includes rival files
