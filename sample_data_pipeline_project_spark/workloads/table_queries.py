"""Table-format workloads on the driver gate: CDC merge-apply (the A21
DML surface — UPDATE/DELETE/MERGE via copy-on-write) and snapshot
time-travel, each certified by a DuckDB oracle that restates the mutation
in pure SQL over the ORIGINAL parquet.

These put `sources/cow.py` and `sources/snapshots.py` — previously pinned
only by pytest — on the driver's value-hash gate: the workload performs
real writes into a scratch table, then aggregates the mutated/time-
traveled state; the oracle derives the same aggregate from the untouched
input with CASE/filter logic. A hash match certifies the storage-layer
mutation end-to-end (reference parity: execute_dml_query,
snowflake_query_client.py:254-294, whose rows_affected contract cow.py
implements).

Determinism: the changelog is DERIVED from the data by key arithmetic
(custkey mod classes) — no RNG, no clock; money stays DECIMAL(18,2)
through every mutation.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sample_data_pipeline_project_spark.sources.catalog import load_table
from sample_data_pipeline_project_spark.sources.scratch import scratch_dir
from sample_data_pipeline_project_spark.workloads import workload


def _scratch(name: str) -> str:
    return scratch_dir(name)


# --------------------------------------------------------------------------
# CDC merge-apply: a derived changelog (U/D/I) applied via copy-on-write
# --------------------------------------------------------------------------
_CDC_ORACLE = """
WITH base AS (
  SELECT c_custkey, c_mktsegment,
         CAST(c_acctbal AS DECIMAL(18,2)) AS bal
  FROM customer
),
after_del AS (
  SELECT * FROM base WHERE c_custkey % 10 != 5
),
after_upd AS (
  SELECT c_custkey, c_mktsegment,
         CASE WHEN c_custkey % 10 = 0
              THEN bal + CAST(1000.00 AS DECIMAL(18,2))
              ELSE bal END AS bal
  FROM after_del
),
inserts AS (
  SELECT c_custkey + 1000000 AS c_custkey, c_mktsegment,
         CAST(0.00 AS DECIMAL(18,2)) AS bal
  FROM base WHERE c_custkey % 100 = 0
),
final AS (
  SELECT * FROM after_upd UNION ALL SELECT * FROM inserts
)
SELECT c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(bal) AS DOUBLE) AS total_balance
FROM final GROUP BY c_mktsegment
"""


@workload("cdc_merge_apply", oracle=_CDC_ORACLE)
def cdc_merge_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC APPLY through the engine's copy-on-write DML (A21): a derived
    changelog — DELETE keys =5 mod 10, UPDATE (+1000.00) keys =0 mod 10,
    INSERT new keys via MERGE — lands on a scratch copy of `customer`
    through cow_delete / cow_merge, and the mutated table's per-segment
    balance aggregate is value-hashed against an oracle that restates
    the same mutations in SQL over the ORIGINAL parquet. Certifies the
    storage mutation path (partition-scoped rewrites, upsert semantics,
    rows_affected accounting) on the driver gate, not just in pytest.
    At scale the copy-on-write rewrite touches only partitions holding
    matched keys (dynamic partition overwrite)."""
    from sample_data_pipeline_project_spark.sources.cow import (
        cow_delete,
        cow_merge,
    )

    root = _scratch("cdc_apply")
    path = f"{root}/customer"
    base = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_mktsegment",
        F.col("c_acctbal").cast("decimal(18,2)").alias("bal"),
    )
    base.write.parquet(path)

    cow_delete(spark, path, F.col("c_custkey") % 10 == 5)

    # upserts: updated rows (key % 10 == 0, bal + 1000.00) + fresh inserts
    updates = base.filter(F.col("c_custkey") % 10 == 0).select(
        "c_custkey",
        "c_mktsegment",
        (F.col("bal") + F.lit("1000.00").cast("decimal(18,2)"))
        .cast("decimal(18,2)")
        .alias("bal"),
    )
    inserts = base.filter(F.col("c_custkey") % 100 == 0).select(
        (F.col("c_custkey") + F.lit(1000000)).alias("c_custkey"),
        "c_mktsegment",
        F.lit("0.00").cast("decimal(18,2)").alias("bal"),
    )
    cow_merge(spark, path, updates.unionByName(inserts), ["c_custkey"])

    return (
        spark.read.parquet(path)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.sum("bal").cast("double").alias("total_balance"),
        )
    )


# --------------------------------------------------------------------------
# Snapshot time-travel: versioned reads over the manifest store
# --------------------------------------------------------------------------
_TT_ORACLE = """
WITH y95 AS (
  SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DECIMAL(18,2)) AS price
  FROM orders WHERE EXTRACT(YEAR FROM o_orderdate) = 1995
),
y96 AS (
  SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DECIMAL(18,2)) AS price
  FROM orders WHERE EXTRACT(YEAR FROM o_orderdate) = 1996
)
SELECT 1 AS version,
       CAST((SELECT COUNT(*) FROM y95) AS BIGINT) AS n_orders,
       CAST((SELECT SUM(price) FROM y95) AS DOUBLE) AS total_price
UNION ALL
SELECT 2 AS version,
       CAST((SELECT COUNT(*) FROM y95) + (SELECT COUNT(*) FROM y96) AS BIGINT),
       CAST((SELECT SUM(price) FROM y95) + (SELECT SUM(price) FROM y96) AS DOUBLE)
"""


@workload("snapshot_time_travel", oracle=_TT_ORACLE)
def snapshot_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SNAPSHOT TIME TRAVEL on the driver gate: commit 1995 orders as
    version 1, append 1996 orders as version 2, then read BOTH versions
    — v1 via explicit time travel after v2 exists — and aggregate each.
    The oracle states what each version must contain from the original
    parquet, so a hash match certifies manifest isolation (later commits
    invisible to earlier versions) end-to-end. Commits are atomic
    manifest creations (sources/snapshots.py); reads load exactly the
    manifest's file list — at any scale a version read is planning-time
    file pruning, never a directory scan."""
    from sample_data_pipeline_project_spark.sources.snapshots import (
        snapshot_read,
        snapshot_write,
    )

    root = _scratch("tt_orders")
    path = f"{root}/orders"
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
        F.year("o_orderdate").alias("yr"),
    )
    v1 = snapshot_write(orders.filter(F.col("yr") == 1995), path, mode="overwrite")
    v2 = snapshot_write(orders.filter(F.col("yr") == 1996), path, mode="append")

    def agg(df: DataFrame, version: int) -> DataFrame:
        return df.agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("price").cast("double").alias("total_price"),
        ).select(F.lit(version).alias("version"), "n_orders", "total_price")

    return agg(snapshot_read(spark, path, v1), 1).unionAll(
        agg(snapshot_read(spark, path, v2), 2)
    )


# --------------------------------------------------------------------------
# Table reconciliation diff: fingerprint anti-entropy between two versions
# --------------------------------------------------------------------------
from sample_data_pipeline_project_spark.functions.text import (  # noqa: E402
    md5_prefix_uint32_sql,
)

_DIFF_U32 = md5_prefix_uint32_sql("'diff|' || CAST(o_orderkey AS STRING)")

_DIFF_ORACLE = f"""
WITH h AS (
  SELECT o_orderkey, ({_DIFF_U32}) % 100 AS cls FROM orders
)
SELECT o_orderkey, 'D' AS change_type FROM h WHERE cls < 2
UNION ALL
SELECT o_orderkey, 'U' AS change_type FROM h WHERE cls >= 2 AND cls < 5
UNION ALL
SELECT o_orderkey + 100000000 AS o_orderkey, 'I' AS change_type
FROM h WHERE cls >= 5 AND cls < 6
"""


@workload("table_diff_reconcile", oracle=_DIFF_ORACLE)
def table_diff_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Version reconciliation (operators/diff.py): build v2 of orders by a
    DERIVED mutation set (md5-keyed classes: 2% deleted, 3% repriced, 1%
    cloned as inserts — no RNG), then diff v2 against v1 by 16-byte row
    fingerprints on a full-outer key join. The oracle restates the
    mutation arithmetic directly, so a hash match certifies the diff
    finds EXACTLY the changed keys with the right class — any
    fingerprint or join defect surfaces as a mismatch. Scale shape: both
    sides reduce to (key, md5) before the shuffle; output is
    change-volume-sized, not table-sized."""
    from sample_data_pipeline_project_spark.operators.diff import table_diff

    orders = load_table(spark, sf_dir, "orders")
    cols = orders.columns
    cls = (F.expr(_DIFF_U32) % 100).alias("cls")
    v1 = orders
    tagged = orders.select(*cols, cls)
    kept = tagged.filter(F.col("cls") >= 2)
    updated = kept.select(
        *[
            F.when(F.col("cls") < 5, F.col("o_totalprice") + F.lit(1.0))
            .otherwise(F.col("o_totalprice"))
            .alias(c)
            if c == "o_totalprice"
            else F.col(c)
            for c in cols
        ],
        "cls",
    )
    inserts = tagged.filter((F.col("cls") >= 5) & (F.col("cls") < 6)).select(
        *[
            (F.col("o_orderkey") + F.lit(100000000)).alias(c)
            if c == "o_orderkey"
            else F.col(c)
            for c in cols
        ]
    )
    v2 = updated.drop("cls").unionAll(inserts)
    return table_diff(v1, v2, key_cols=["o_orderkey"], compare_cols=cols)
