"""Round-4n workloads: GROUPING()/GROUPING_ID() semantics and the
conditional scalar surface.

Determinism notes: grouping-id bit order (first listed column = most
significant bit) is identical in Spark and DuckDB (probed before
registering); the conditional functions are pure scalar logic over
injected NULLs with exact integer outputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sample_data_pipeline_project_spark.sources.catalog import load_table
from sample_data_pipeline_project_spark.workloads import workload

# --------------------------------------------------------------------------
# C203 — GROUPING() / GROUPING_ID() over a cube: which cell is which rollup
# --------------------------------------------------------------------------

_GID_ORACLE = """
SELECT o_orderstatus, o_orderpriority,
       CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
       CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_priority,
       CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders
GROUP BY CUBE(o_orderstatus, o_orderpriority)
"""


@workload("agg_grouping_id_cube", oracle=_GID_ORACLE)
def agg_grouping_id_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING() / GROUPING_ID() semantics over a two-dimension cube:
    the bitmask that tells a report renderer whether a NULL cell means
    'subtotal over this dimension' or 'the data really was NULL' — the
    disambiguator every rollup consumer needs. Bit order (first listed
    column = most significant) is identical across engines, which this
    workload pins under the value hash; one cube aggregation, 4x the
    group cells of a plain groupBy, fully partial-aggregatable."""
    o = load_table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.grouping("o_orderstatus").cast("long").alias("g_status"),
        F.grouping("o_orderpriority").cast("long").alias("g_priority"),
        F.grouping_id().cast("long").alias("gid"),
        F.count(F.lit(1)).cast("long").alias("n_orders"),
    )


# --------------------------------------------------------------------------
# C204 — conditional scalar surface (coalesce / nullif / greatest / least)
# --------------------------------------------------------------------------

_COND_ORACLE = """
WITH x AS (
  SELECT o_orderkey,
         NULLIF(o_orderstatus, 'P') AS status_np,
         CASE WHEN o_orderkey % 3 = 0 THEN NULL ELSE o_custkey END AS cust_n
  FROM orders
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN status_np IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_nullified,
       CAST(SUM(COALESCE(cust_n, -1)) AS BIGINT) AS sum_coalesced,
       CAST(SUM(GREATEST(o_orderkey % 7, o_orderkey % 5)) AS BIGINT)
         AS sum_greatest,
       CAST(SUM(LEAST(o_orderkey % 7, o_orderkey % 5)) AS BIGINT) AS sum_least,
       CAST(SUM(CASE WHEN COALESCE(status_np, 'P') = 'P' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_roundtrip
FROM x
"""


@workload("scalar_conditional_funcs", oracle=_COND_ORACLE)
def scalar_conditional_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The conditional scalar vocabulary — NULLIF (inject NULLs),
    COALESCE (recover them), GREATEST/LEAST (n-ary comparisons) — pinned
    under exact integer aggregates, including the NULLIF->COALESCE
    round-trip identity (n_roundtrip counts rows where un-nullifying
    restores the original sentinel). Pure whole-stage-codegen
    expressions; the NULL-injection pattern is how every ingest pipeline
    normalizes magic sentinel values."""
    o = load_table(spark, sf_dir, "orders")
    x = o.select(
        "o_orderkey",
        F.nullif(F.col("o_orderstatus"), F.lit("P")).alias("status_np"),
        F.when(F.col("o_orderkey") % 3 == 0, F.lit(None).cast("long"))
        .otherwise(F.col("o_custkey"))
        .alias("cust_n"),
    )
    return x.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(F.when(F.col("status_np").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_nullified"),
        F.sum(F.coalesce(F.col("cust_n"), F.lit(-1).cast("long")))
        .cast("long")
        .alias("sum_coalesced"),
        F.sum(F.greatest(F.col("o_orderkey") % 7, F.col("o_orderkey") % 5))
        .cast("long")
        .alias("sum_greatest"),
        F.sum(F.least(F.col("o_orderkey") % 7, F.col("o_orderkey") % 5))
        .cast("long")
        .alias("sum_least"),
        F.sum(
            F.when(F.coalesce(F.col("status_np"), F.lit("P")) == "P", 1).otherwise(0)
        )
        .cast("long")
        .alias("n_roundtrip"),
    )
