"""Partitioned ledger IO: roundtrip fidelity + partition pruning proof."""

from __future__ import annotations

from pyspark.sql import functions as F

from sample_data_pipeline_project_spark.sources.fixtures import pipeline_runs_fixture
from sample_data_pipeline_project_spark.sources.ledger_io import (
    read_ledger,
    write_ledger,
)


def test_roundtrip_and_schema_order(spark, ledger, tmp_path):
    path = str(tmp_path / "ledger")
    write_ledger(ledger, path)
    back = read_ledger(spark, path)
    assert back.columns == ledger.columns
    assert back.count() == ledger.count()
    a = {tuple(r) for r in ledger.collect()}
    b = {tuple(r) for r in back.collect()}
    assert a == b


def test_day_filter_prunes_partitions(spark, ledger, tmp_path):
    path = str(tmp_path / "ledger2")
    write_ledger(ledger, path)
    back = read_ledger(spark, path).filter(
        F.col("query_window_start_day") == "2024-03-02"
    )
    plan = back._jdf.queryExecution().executedPlan().toString()
    # the day predicate must appear as a partition filter on the scan,
    # not a post-scan data filter
    assert "PartitionFilters: [" in plan
    assert "2024-03-02" in plan.split("PartitionFilters", 1)[1].split("]", 1)[0]
    assert back.count() == 3


def test_dynamic_partition_pruning(spark, ledger, tmp_path):
    """Runtime partition pruning: joining the day-partitioned ledger to a
    small filtered dimension on the partition column must plan a
    DynamicPruningExpression on the scan — at scale this skips whole
    day partitions the dimension filter excludes, without a static
    predicate on the fact side."""
    import datetime as dt

    path = str(tmp_path / "ledger3")
    write_ledger(ledger, path)
    fact = read_ledger(spark, path)
    dim = spark.createDataFrame(
        [(dt.date(2024, 3, 2), "keep"), (dt.date(2024, 3, 1), "drop")],
        "day date, tag string",
    ).filter(F.col("tag") == "keep")
    joined = fact.join(dim, fact["query_window_start_day"] == dim["day"])
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower()
    assert joined.count() == 3
