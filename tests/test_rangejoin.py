"""Bucketed range join == naive theta join, including overlapping bands,
multi-bucket bands, and boundary (half-open) semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sample_data_pipeline_project_spark.operators.rangejoin import band_range_join


@pytest.fixture(scope="module")
def points(spark):
    # values chosen to sit on bucket edges, band edges, and in overlaps
    vals = [0.0, 4.9, 5.0, 9.99, 10.0, 12.5, 19.9, 20.0, 33.3, 50.0, 99.9]
    return spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "pid long, val double"
    )


@pytest.fixture(scope="module")
def bands(spark):
    # overlapping, unaligned, and one spanning many buckets
    rows = [
        (0, 0.0, 5.0),     # half-open: 5.0 must NOT match
        (1, 4.0, 13.0),    # overlaps band 0 and spans buckets
        (2, 12.5, 20.0),   # starts mid-bucket
        (3, 10.0, 90.0),   # spans 8+ buckets
        (4, 95.0, 100.0),
    ]
    return spark.createDataFrame(rows, "band_id long, lo double, hi double")


def _naive(points, bands):
    return points.join(
        bands, (F.col("val") >= F.col("lo")) & (F.col("val") < F.col("hi")), "inner"
    )


def _pairs(df):
    return sorted((r.pid, r.band_id) for r in df.select("pid", "band_id").collect())


@pytest.mark.parametrize("width", [1.0, 7.0, 10.0, 1000.0])
def test_matches_theta_join(spark, points, bands, width):
    got = band_range_join(points, "val", bands, "lo", "hi", bucket_width=width)
    assert _pairs(got) == _pairs(_naive(points, bands))


def test_half_open_boundaries(spark, points, bands):
    got = band_range_join(points, "val", bands, "lo", "hi", bucket_width=10.0)
    pairs = _pairs(got)
    assert (2, 0) not in pairs  # val 5.0 excluded from [0,5)
    assert (2, 1) in pairs  # val 5.0 included in [4,13)
    assert (4, 1) in pairs and (4, 3) in pairs  # 10.0 in two overlapping bands


def test_no_helper_columns_leak(spark, points, bands):
    got = band_range_join(points, "val", bands, "lo", "hi", bucket_width=10.0)
    assert "__bucket" not in got.columns


def test_rejects_bad_width(points, bands):
    with pytest.raises(ValueError):
        band_range_join(points, "val", bands, "lo", "hi", bucket_width=0.0)


def test_plan_is_hash_join_not_nested_loop(spark, points, bands):
    """The point of bucketing: the physical plan joins on the bucket key
    with a hash join; no BroadcastNestedLoopJoin / CartesianProduct."""
    got = band_range_join(points, "val", bands, "lo", "hi", bucket_width=10.0)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    # any equi-join strategy on the bucket key qualifies
    assert "HashJoin" in plan or "SortMergeJoin" in plan
