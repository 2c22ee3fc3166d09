"""Round-4m workloads: boolean aggregate surface and dynamic partition
pruning certification.

Determinism notes: boolean aggregates are exact logical folds (DuckDB
bool_and/bool_or/count_if are the same functions by name); the DPP
workload's output is plain per-partition counts, while the PLAN property
(a dynamic-pruning subquery on the partition column) is hard-asserted
inside the workload so a planner regression fails loudly rather than
silently scanning every partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sample_data_pipeline_project_spark.sources.catalog import load_table
from sample_data_pipeline_project_spark.sources.scratch import scratch_dir
from sample_data_pipeline_project_spark.workloads import workload

# --------------------------------------------------------------------------
# C201 — boolean aggregate surface (bool_and / bool_or / count_if)
# --------------------------------------------------------------------------

_BOOL_ORACLE = """
SELECT o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       bool_and(o_totalprice > 1000) AS all_over_1k,
       bool_or(o_totalprice > 400000) AS any_over_400k,
       CAST(count_if(o_orderpriority = '1-URGENT') AS BIGINT) AS n_urgent,
       bool_and(o_orderdate >= TIMESTAMP '1995-01-01') AS all_after_95,
       bool_or(o_custkey % 1000 = 0) AS any_round_cust
FROM orders
GROUP BY o_orderstatus
"""


@workload("agg_boolean_aggregates", oracle=_BOOL_ORACLE)
def agg_boolean_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The boolean aggregate vocabulary — bool_and / bool_or (SQL EVERY /
    ANY) and count_if — as grouped data-quality assertions over orders:
    'does EVERY order in this status exceed $1k', 'does ANY cross
    $400k', 'how many are urgent'. These are the aggregate forms DQ
    expectation suites compile to (a failed bool_and IS the violated
    expectation); all three are single-pass partial-aggregatable folds,
    named identically on both engines."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.bool_and(F.col("o_totalprice") > 1000).alias("all_over_1k"),
        F.bool_or(F.col("o_totalprice") > 400000).alias("any_over_400k"),
        F.count_if(F.col("o_orderpriority") == "1-URGENT")
        .cast("long")
        .alias("n_urgent"),
        F.bool_and(
            F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp_ntz")
        ).alias("all_after_95"),
        F.bool_or(F.col("o_custkey") % 1000 == 0).alias("any_round_cust"),
    )


# --------------------------------------------------------------------------
# C202 — dynamic partition pruning certification
# --------------------------------------------------------------------------

_DPP_ORACLE = """
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
            AS BIGINT) AS rev_cents
FROM orders
WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
GROUP BY o_orderpriority
"""


@workload("join_dynamic_partition_pruning", oracle=_DPP_ORACLE)
def join_dynamic_partition_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DYNAMIC partition pruning certified end to end: the fact table is
    written hive-partitioned by priority, the dimension carries the
    selective predicate (flagged priorities only), and the join key is
    the partition column — so Catalyst must inject a dynamic-pruning
    subquery into the fact scan's PartitionFilters, reusing the
    broadcast dim to decide AT RUNTIME which partitions to read. The
    workload HARD-FAILS unless `dynamicpruning` appears in the physical
    plan: at 100 TB, DPP on a star join is the difference between
    scanning two partitions and scanning the table, and a silent planner
    regression must not pass as green. Output is the per-priority
    rollup, equal to a static filter on the original table (which is the
    oracle)."""
    o = load_table(spark, sf_dir, "orders")
    root = scratch_dir("dpp_fact")
    o.write.partitionBy("o_orderpriority").mode("overwrite").parquet(root)
    fact = spark.read.parquet(root)
    dim = spark.createDataFrame(
        [
            ("1-URGENT", 1),
            ("2-HIGH", 1),
            ("3-MEDIUM", 0),
            ("4-NOT SPECIFIED", 0),
            ("5-LOW", 0),
        ],
        "prio string, flag int",
    )
    joined = fact.join(
        dim.filter(F.col("flag") == 1),
        fact["o_orderpriority"] == F.col("prio"),
    )
    out = joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum((F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long"))
        .cast("long")
        .alias("rev_cents"),
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    if "dynamicpruning" not in plan.lower():
        raise AssertionError(
            "expected a dynamic-pruning subquery on the partitioned fact "
            "scan; plan:\n" + plan
        )
    return out
