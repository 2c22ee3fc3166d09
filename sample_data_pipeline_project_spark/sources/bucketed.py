"""Bucketed table layout: pre-shuffled storage for co-located joins.

The biggest shuffle in the TPC-H-ish schema is orders |><| lineitem —
both fact tables, neither broadcastable at scale. Bucketing is the
write-once answer: store both tables hash-partitioned into the same
number of buckets ON THE JOIN KEY, and every future join/aggregation on
that key reads co-located buckets with NO Exchange at all. At 100 TB the
one-time bucketed write replaces a per-query 2-sided shuffle of the whole
fact table — the canonical storage-layout optimization this engine's
ledger uses for day partitioning, applied to join keys.

Implementation notes:
  - `saveAsTable` (path-backed) records the bucketing spec in the session
    catalog; with the default in-memory catalog the FILES survive a
    session but the bucket metadata does not, so tables are (re)written
    once per session and reused within it (`tableExists` guard).
  - `sortBy` within buckets lets the join skip its per-partition sort
    when Spark can prove one file per bucket (it falls back to sorting
    otherwise — still no shuffle).
  - Bucket counts must MATCH on both sides (or divide evenly) for the
    co-located read; we write both with the same count.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession

from sample_data_pipeline_project_spark.sources.catalog import load_table

_BUCKET_KEYS = {"orders": "o_orderkey", "lineitem": "l_orderkey"}


def _sf_tag(sf_dir: str) -> str:
    base = os.path.basename(sf_dir.rstrip("/"))
    return re.sub(r"[^A-Za-z0-9_]", "_", base)


def ensure_bucketed_table(
    spark: SparkSession, sf_dir: str, table: str, num_buckets: int = 8
) -> str:
    """Write a bucketed+sorted copy of `table` into the warehouse (once per
    session per sf) and return its catalog name."""
    if table not in _BUCKET_KEYS:
        raise ValueError(f"no bucket key defined for {table!r}")
    key = _BUCKET_KEYS[table]
    name = f"{table}_bucketed_{_sf_tag(sf_dir)}"
    if not spark.catalog.tableExists(name):
        # The in-memory catalog forgets tables across sessions but their
        # warehouse directories persist; saveAsTable refuses to reuse an
        # orphaned location (LOCATION_ALREADY_EXISTS), so clear it first.
        warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
        stale = os.path.join(re.sub(r"^file:/*", "/", warehouse), name)
        if os.path.isdir(stale):
            import shutil

            shutil.rmtree(stale, ignore_errors=True)
        (
            load_table(spark, sf_dir, table)
            .write.bucketBy(num_buckets, key)
            .sortBy(key)
            .mode("overwrite")  # clobber stale files from a prior session
            .format("parquet")
            .saveAsTable(name)
        )
    return name


def bucketed_join(
    spark: SparkSession, sf_dir: str, num_buckets: int = 8
) -> DataFrame:
    """orders |><| lineitem on the order key via co-located bucketed reads:
    the physical plan contains NO shuffle Exchange for the join (asserted
    in tests/test_bucketed.py with broadcast disabled)."""
    o = spark.table(ensure_bucketed_table(spark, sf_dir, "orders", num_buckets))
    l = spark.table(ensure_bucketed_table(spark, sf_dir, "lineitem", num_buckets))
    return l.join(o, l["l_orderkey"] == o["o_orderkey"])
