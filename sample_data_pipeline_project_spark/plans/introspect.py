"""Physical-plan introspection.

The reference never sees a query plan (Snowflake executes remotely,
SURVEY.md §3); in this engine the plan is a first-class artifact. These
helpers turn `df.explain()` text into checkable facts so tests assert the
*physical* properties that matter at 100 TB — filters reached the scan,
dimensions broadcast, codegen fused the hot path — instead of trusting
that a passing result implies a good plan.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame, mode: str = "extended") -> str:
    qe = df._jdf.queryExecution()
    return qe.executedPlan().toString() if mode == "executed" else qe.toString()


def formatted_plan(df: DataFrame) -> str:
    """The `.explain('formatted')` text, returned instead of printed."""
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across the plan's file scans."""
    plan = formatted_plan(df)
    return re.findall(r"PushedFilters: \[([^\]]*)\]", plan)


def partition_filters(df: DataFrame) -> list[str]:
    plan = physical_plan(df, "executed")
    return re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)


def scan_schemas(df: DataFrame) -> list[str]:
    """ReadSchema of every file scan — proves column pruning."""
    plan = formatted_plan(df)
    return re.findall(r"ReadSchema: struct<([^>]*)>", plan)


def join_strategies(df: DataFrame) -> list[str]:
    """Physical join node names in plan order (BroadcastHashJoin,
    SortMergeJoin, ShuffledHashJoin, BroadcastNestedLoopJoin...)."""
    plan = physical_plan(df, "executed")
    return re.findall(
        r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
        r"BroadcastNestedLoopJoin|CartesianProduct)",
        plan,
    )


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle exchanges (the scale currency of a plan)."""
    plan = physical_plan(df, "executed")
    return len(re.findall(r"Exchange (?:hashpartitioning|rangepartitioning|SinglePartition)", plan))


def wholestage_codegen_ids(df: DataFrame) -> list[str]:
    """WholeStageCodegen span ids — wider/fewer spans = more fusion.
    (Printed as `WholeStageCodegen (n)` in formatted mode and as a `*(n)`
    operator prefix in the tree string.)"""
    plan = physical_plan(df, "executed")
    ids = re.findall(r"WholeStageCodegen \((\d+)\)", plan) + re.findall(
        r"\*\((\d+)\)", plan
    )
    return sorted(set(ids))


def scan_output_rows(df: DataFrame) -> int:
    """Sum of `numOutputRows` across the executed plan's leaf (file-scan)
    nodes — rows that SURVIVED parquet row-group min/max pruning plus the
    pushed predicate. Requires the query to have executed (metrics are
    runtime values). The direct measure of whether a storage layout's
    clustering actually narrowed IO."""
    plan = df._jdf.queryExecution().executedPlan()
    leaves = plan.collectLeaves()
    total = 0
    for i in range(leaves.size()):
        m = leaves.apply(i).metrics()
        if m.contains("numOutputRows"):
            total += m.apply("numOutputRows").value()
    return total
