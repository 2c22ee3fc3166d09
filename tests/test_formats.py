"""Multi-format IO: roundtrip fidelity for every format, schema
enforcement, timestamp preservation across text formats."""

from __future__ import annotations

import pytest

from sample_data_pipeline_project_spark.schema import PIPELINE_RUNS_SCHEMA
from sample_data_pipeline_project_spark.sources.formats import read_table, write_table


@pytest.mark.parametrize("fmt", ["parquet", "orc", "csv", "json"])
def test_roundtrip_all_formats(spark, ledger, tmp_path, fmt):
    path = str(tmp_path / f"out_{fmt}")
    write_table(ledger, path, fmt=fmt)
    back = read_table(spark, path, fmt=fmt, schema=PIPELINE_RUNS_SCHEMA)
    # nullability is not preserved by file formats; names+types are
    assert [(f.name, f.dataType) for f in back.schema.fields] == [
        (f.name, f.dataType) for f in ledger.schema.fields
    ]
    assert {tuple(r) for r in back.collect()} == {tuple(r) for r in ledger.collect()}


def test_text_formats_require_schema(spark, tmp_path):
    with pytest.raises(ValueError, match="no reliable embedded schema"):
        read_table(spark, str(tmp_path), fmt="csv")


def test_unknown_format_rejected(spark, ledger, tmp_path):
    with pytest.raises(ValueError, match="unsupported format"):
        write_table(ledger, str(tmp_path / "x"), fmt="avro")


def test_partitioned_write_file_cap(spark, ledger, tmp_path):
    import glob

    path = str(tmp_path / "capped")
    write_table(
        ledger,
        path,
        fmt="parquet",
        partition_by=["query_window_start_day"],
        files_per_partition=1,
    )
    for day_dir in glob.glob(f"{path}/query_window_start_day=*"):
        files = [f for f in glob.glob(f"{day_dir}/*.parquet")]
        assert len(files) == 1, day_dir


def test_parquet_schema_evolution_mergeschema(spark, tmp_path):
    """Schema evolution over a growing table: files written before a column
    existed read back as NULL for that column under mergeSchema — the
    additive-evolution contract a long-lived 100 TB table needs (no
    rewrite of old files to add a column)."""
    from pyspark.sql import functions as F

    path = str(tmp_path / "evolving")
    spark.range(0, 5).select("id").write.mode("append").parquet(path)
    spark.range(5, 8).select(
        "id", (F.col("id") * 10).alias("score")
    ).write.mode("append").parquet(path)
    df = spark.read.option("mergeSchema", True).parquet(path)
    assert set(df.columns) == {"id", "score"}
    assert df.count() == 8
    assert df.filter(F.col("score").isNull()).count() == 5
    assert df.filter(F.col("score") == 70).count() == 1
