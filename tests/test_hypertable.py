"""Hypertable rollup: each coarser tier (re-aggregated from the finer one)
must equal aggregating the raw events directly at that resolution."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from sample_data_pipeline_project_spark.workloads.event_queries import (
    events_hypertable_rollup,
)


@pytest.fixture(scope="module")
def events_path(spark, tmp_path_factory):
    """Small synthetic events parquet spanning hour/day/week boundaries.
    `ts` is stored as epoch-NANOSECONDS long, the same shape load_table
    handles for the driver's TIMESTAMP(NANOS) events table."""
    epoch = dt.datetime(1970, 1, 1)
    base = dt.datetime(2024, 1, 7, 22, 0, 0)  # Sunday -> week rolls back across day
    rows = []
    for i in range(200):
        ts = base + dt.timedelta(minutes=17 * i)  # crosses days + one week edge
        ts_ns = int((ts - epoch).total_seconds()) * 1_000_000_000
        rows.append((i, ts_ns, i % 7, "t", float(i % 13) / 4.0, "{}"))
    df = spark.createDataFrame(
        rows, "event_id long, ts long, user_id long, event_type string, value double, props string"
    )
    out = str(tmp_path_factory.mktemp("ht")) + "/events.parquet"
    df.coalesce(1).write.mode("overwrite").parquet(out)
    return out.rsplit("/events.parquet", 1)[0]


def _direct(spark, sf_dir, unit):
    from sample_data_pipeline_project_spark.functions.timeops import ns_epoch_to_ntz

    e = spark.read.parquet(f"{sf_dir}/events.parquet").withColumn(
        "ts", ns_epoch_to_ntz("ts")
    )
    return {
        tuple(r)
        for r in e.groupBy(F.date_trunc(unit, "ts").alias("b"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("s"),
        )
        .collect()
    }


@pytest.mark.parametrize("res,unit", [("hour", "hour"), ("day", "day"), ("week", "week")])
def test_tier_equals_direct_aggregation(spark, events_path, res, unit):
    out = events_hypertable_rollup(spark, events_path)
    got = {
        (r.bucket_start, r.n_events, r.sum_value)
        for r in out.filter(F.col("resolution") == res).collect()
    }
    assert got == _direct(spark, events_path, unit)


def test_counts_conserved_across_tiers(spark, events_path):
    out = events_hypertable_rollup(spark, events_path).cache()
    totals = (
        out.groupBy("resolution").agg(F.sum("n_events").alias("n")).collect()
    )
    by_res = {r.resolution: r.n for r in totals}
    assert by_res["hour"] == by_res["day"] == by_res["week"] == 200
