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


def _tree_nodes(plan: str) -> list[tuple[int, str]]:
    """(indent_depth, node_text) per line of an explain tree string.
    Depth is the column where the operator name starts (tree markers
    `+-`, `:-`, `:`, `|` and spaces stripped); parent of a line is the
    nearest earlier line with a smaller depth."""
    nodes = []
    for line in plan.splitlines():
        stripped = line.lstrip(" :+|-")
        if not stripped:
            continue
        nodes.append((len(line) - len(stripped), stripped))
    return nodes


# Nodes that may legally sit between a Window and the shuffle that feeds
# it: anything else (a join, an aggregate, another exchange) means the
# single-partition exchange belongs to a DIFFERENT operator further down
# the tree (e.g. a bounded limit inside a broadcast subtree).
_WINDOW_FEED_PASSTHROUGH = (
    "Sort",
    "Project",
    "Filter",
    "WindowGroupLimit",
    "InputAdapter",
    "WholeStageCodegen",
    "AQEShuffleRead",
    "ShuffleQueryStage",
    "ColumnarToRow",
)


def single_partition_window_sites(df: DataFrame) -> list[str]:
    """Every `Exchange SinglePartition` that DIRECTLY feeds a Window node
    (only sort/project-class nodes in between) — i.e. a window function
    whose input was coalesced to one partition, the textbook 100x-scale
    killer: the whole windowed input funnels through a single task.
    Returns the offending Window node texts; empty list == the plan has
    no global-window bottleneck.

    An `Exchange SinglePartition` that feeds some bounded operator inside
    a Window's wider subtree (a k-row limit below a broadcast join, the
    final agg of a partial aggregate) is NOT flagged — only a direct
    Window feed is."""
    plan = physical_plan(df, "executed")
    nodes = _tree_nodes(plan)
    offenders = []
    for i, (depth, text) in enumerate(nodes):
        if "Exchange SinglePartition" not in text:
            continue
        d = depth
        for j in range(i - 1, -1, -1):
            pdepth, ptext = nodes[j]
            if pdepth >= d:
                continue  # sibling subtree, not an ancestor
            d = pdepth
            name = ptext.lstrip("*(0123456789) ").split(" ")[0].split("[")[0]
            if name.startswith("Window") and "WindowGroupLimit" not in name:
                offenders.append(ptext)
                break
            if not any(name.startswith(p) for p in _WINDOW_FEED_PASSTHROUGH):
                break  # chain interrupted: exchange feeds something else
            if d == 0:
                break
    return offenders
