"""Partition-count hygiene for iterative/broadcast-heavy operators.

Two inverse defects share one root cause — partition counts inherited
from the WRONG side of the plan instead of derived from the data and the
cluster (optimization guide §2.2/§2.5, round 11):

- A frame materialized by `localCheckpoint` keeps the partitioning of
  its job's final stage. With AQE's wide-start shuffle configuration
  (initialPartitionNum=256, engine.py) that final stage is often NOT
  read-coalesced, so an edge list of a few MB materializes as 256
  blocks — and every round of an iterative operator (connected
  components, PageRank, k-core, BFS, LPA) then re-scans it with 256
  near-empty tasks, twice per round after symmetrization. Measured on
  `dedup_connected_components` at sf0.1: the top stages were 256/512
  tasks with max task 0.02-0.09 s — pure scheduling overhead.

- A corpus read from ONE unsplittable parquet file (single row group)
  scans as ONE partition, and every broadcast-join map side downstream
  (k-means assignment, PQ encode — the expensive per-row distance work)
  runs on one core. Measured on `sim_ivfpq_topk` at sf0.1: ~15
  consecutive single-task stages of 0.7-0.9 s each.

Both helpers derive the target from `sparkContext.defaultParallelism` —
the cluster's core count, not a constant — so they are no-ops exactly
when the data already matches the cluster:

- `cap_parts(df)`: `coalesce` (narrow, no shuffle, no job) down to the
  default parallelism. On a real cluster a 256-partition edge list is
  already at or below total cores and nothing changes; partitions only
  ever merge, so per-task memory can only grow by the merge factor of
  an already-small frame.
- `widen(df)`: round-robin `repartition` UP to the default parallelism
  when the input is narrower — the guide's standing fix for
  unsplittable inputs. On a real corpus (many files / row groups) the
  scan is already wider than the cluster and nothing changes. The
  shuffle it adds moves the frame once, amortized over the iterative
  work that reads it many times.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _default_parallelism(df: DataFrame) -> int:
    return max(1, df.sparkSession.sparkContext.defaultParallelism)


def cap_parts(df: DataFrame) -> DataFrame:
    """Merge partitions down to the session's default parallelism
    (narrow coalesce — no shuffle, no job). Apply just before a
    `localCheckpoint` whose output is re-read many times."""
    return df.coalesce(_default_parallelism(df))


def widen(df: DataFrame) -> DataFrame:
    """Round-robin repartition UP to the session's default parallelism
    when the frame is narrower (the unsplittable-single-file fix); no-op
    when the frame is already at least that wide. `df` should be a
    scan-level frame — `.rdd` compiles the plan to read its partition
    count, which is cheap there."""
    target = _default_parallelism(df)
    try:
        cur = df.rdd.getNumPartitions()
    except Exception:
        return df
    return df.repartition(target) if cur < target else df
