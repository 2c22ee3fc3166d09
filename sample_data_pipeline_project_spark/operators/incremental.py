"""Incremental aggregate maintenance: merge mergeable partial aggregates.

The snapshot+delta pattern: a standing aggregate state and a new batch's
partial aggregate, merged by RE-AGGREGATING the partials — exactly the
map-side-combine algebra Spark itself uses inside a shuffle, lifted to
the pipeline level so a nightly 100 TB job touches only the delta
partition. Works for any commutative monoid: COUNT merges as SUM,
SUM as SUM (decimal partials keep it exact), MIN/MAX as themselves,
HLL/quantile sketches via their union aggregates (see the
`sketch_hll_mergeable_rollup` workload for the sketch form).

The streaming twin is `streaming/eventtime.py`'s stateful aggregations
(state store = the standing partials); the storage twin is
`sources/snapshots.py` (each version holds the merged state).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_partial_aggs(
    state: DataFrame,
    delta: DataFrame,
    key_cols: list[str],
    sum_cols: list[str],
    min_cols: list[str] | None = None,
    max_cols: list[str] | None = None,
) -> DataFrame:
    """Merge two partial-aggregate tables keyed on `key_cols`.

    `sum_cols` merge additively (COUNT partials included — a count is a
    sum of 1-partials), `min_cols`/`max_cols` by min/max. Keys present in
    only one side pass through (union semantics, not join — a full-outer
    join would turn absent keys into NULL arithmetic). One shuffle, sized
    by |state| + |delta| — both already aggregate-sized, not raw-data-sized.
    """
    aggs = [F.sum(c).alias(c) for c in sum_cols]
    aggs += [F.min(c).alias(c) for c in (min_cols or [])]
    aggs += [F.max(c).alias(c) for c in (max_cols or [])]
    cols = key_cols + sum_cols + (min_cols or []) + (max_cols or [])
    return (
        state.select(*cols)
        .unionByName(delta.select(*cols))
        .groupBy(*key_cols)
        .agg(*aggs)
    )
