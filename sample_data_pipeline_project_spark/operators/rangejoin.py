"""Bucketed range join: value-in-interval joins without a nested loop.

The reference's only non-equi join is the interval-overlap self-join
(`snowflake_tasks.py:488-584`), which we day-bucket in ledger/tasks.py. This
module generalizes that trick to the classic *band/range join*: match left
rows whose scalar value falls inside a right-side `[lo, hi)` interval.

Naively that predicate is pure theta — Spark plans BroadcastNestedLoopJoin
(fine when one side broadcasts, quadratic disaster when both sides are
large). The scalable form used by every range-join-capable engine
(Databricks' range-join hints, DuckDB's IEJoin) maps both sides onto
fixed-width buckets:

  - left row  -> bucket floor(value / W)           (exactly one bucket)
  - interval  -> every bucket it overlaps          (explode sequence(...))

then equi-joins on the bucket id with the exact range predicate as a
residual. The join becomes a shuffle/broadcast HASH join on the bucket key —
partitionable, AQE-skew-splittable, and linear in data size for bounded
interval width. Choose W near the median interval width: wider W = fewer
duplicated interval rows, narrower W = fewer false candidates per bucket.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["band_range_join"]


def band_range_join(
    left: DataFrame,
    value_col: str,
    bands: DataFrame,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
) -> DataFrame:
    """Inner-join `left` to `bands` where `lo <= value < hi`, as a bucketed
    equi-join + residual instead of a nested loop.

    Intervals may overlap and may be arbitrarily placed — a band spanning
    multiple buckets is exploded into one candidate row per bucket, and a
    final exact filter removes false candidates, so results are identical
    to the theta join (tests assert this).
    """
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")
    w = F.lit(float(bucket_width))
    lo, hi = F.col(lo_col), F.col(hi_col)
    # [lo, hi) overlaps buckets floor(lo/W) .. floor(hi/W); including the
    # bucket containing hi itself is harmless (residual filters it).
    bands_b = bands.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(lo / w).cast("long"), F.floor(hi / w).cast("long")
            )
        ),
    )
    left_b = left.withColumn("__bucket", F.floor(F.col(value_col) / w).cast("long"))
    out = left_b.join(
        bands_b,
        (left_b["__bucket"] == bands_b["__bucket"])
        & (F.col(value_col) >= lo)
        & (F.col(value_col) < hi),
        "inner",
    )
    return out.drop("__bucket")
