"""As-of (time-travel) join — the canonical time-series operator Spark's
DataFrame API lacks as a primitive.

For every left row, attach the single right row with the greatest
`right_ts <= left_ts` within the same key group (backward as-of; the shape
DuckDB spells `ASOF JOIN` and kdb spells `aj`).

Implementation is the UNION-MERGE form, not a range join:
  tag both inputs, union them, and run one window pass per key ordered by
  (ts, side): `last(right_payload, ignorenulls=true)` over rows-unbounded-
  preceding carries the most recent right payload forward onto each left
  row. Right rows sort before left rows at equal ts, so ties match
  (<= semantics).

Scale shape: ONE shuffle on the key columns + a sort within partitions —
the same cost as a single sort-merge join stage, with no risk of the
quadratic per-key blow-up a `BETWEEN`-style range join suffers when keys
repeat. Skewed keys behave like any windowed aggregation (AQE-visible).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_tiebreak: str | None = None,
    how: str = "left",
    direction: str = "backward",
    tolerance: str | None = None,
) -> DataFrame:
    """As-of join, backward (default) or forward.

    Args:
      on: equality key columns (present in both inputs).
      left_ts / right_ts: event-time columns.
      right_tiebreak: column ordering simultaneous right rows (the LAST one
        in this order wins, matching "latest record" semantics);
        deterministic only if provided.
      how: 'left' keeps unmatched left rows (right columns null);
        'inner' drops them.
      direction: 'backward' matches the greatest right_ts <= left_ts;
        'forward' the smallest right_ts >= left_ts (same union-merge pass,
        scanned in descending time order).
      tolerance: optional SQL interval literal body (e.g. '1 HOUR'): a
        match farther than this from left_ts is nulled out (pandas
        merge_asof / kdb wj semantics). Applied AFTER the window pass —
        one extra projection, no extra shuffle.

    Right payload columns are returned with their own names; name-collide
    columns (the keys, the ts) are exposed as `right_<name>`.
    """
    if how not in ("left", "inner"):
        raise ValueError(f"how must be 'left' or 'inner', got {how!r}")
    if direction not in ("backward", "forward"):
        raise ValueError(
            f"direction must be 'backward' or 'forward', got {direction!r}"
        )
    key_cols = list(on)
    left_payload = [c for c in left.columns if c not in key_cols and c != left_ts]
    right_payload = [c for c in right.columns if c not in key_cols]

    def _right_out(name: str) -> str:
        return f"right_{name}" if name in left.columns else name

    r_struct = F.struct(
        *[F.col(c).alias(_right_out(c)) for c in right_payload]
    ).alias("__r")
    # Tiebreak lives inside the right payload struct (left rows carry a
    # null struct, which sorts first and never displaces a right row).
    order_tail = (
        [F.expr(f"__r.{_right_out(right_tiebreak)}").asc()] if right_tiebreak else []
    )

    l_tagged = left.select(
        *key_cols,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.struct(*left_payload).alias("__l"),
        F.lit(None).cast(
            right.select(r_struct).schema["__r"].dataType
        ).alias("__r"),
    )
    r_tagged = right.select(
        *key_cols,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(
            left.select(F.struct(*left_payload).alias("__l")).schema["__l"].dataType
        ).alias("__l"),
        r_struct,
    )
    # At equal __ts the right row (side 0) precedes the left row in scan
    # order, so a right event stamped exactly at left_ts is matchable
    # (<= backward, >= forward). Forward is the same pass scanned in
    # DESCENDING time: the last right seen before a left row is then the
    # EARLIEST right at-or-after it.
    ts_order = (
        F.col("__ts").asc() if direction == "backward" else F.col("__ts").desc()
    )
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(ts_order, F.col("__side").asc(), *order_tail)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = (
        l_tagged.unionByName(r_tagged)
        .withColumn("__match", F.last("__r", ignorenulls=True).over(w))
        .filter(F.col("__side") == 1)
    )
    if tolerance is not None:
        match_ts = F.col(f"__match.{_right_out(right_ts)}")
        if direction == "backward":
            in_range = match_ts >= F.expr(f"__ts - INTERVAL {tolerance}")
        else:
            in_range = match_ts <= F.expr(f"__ts + INTERVAL {tolerance}")
        merged = merged.withColumn(
            "__match", F.when(in_range, F.col("__match"))
        )
    out_cols = (
        [F.col(k) for k in key_cols]
        + [F.col("__ts").alias(left_ts)]
        + [F.col(f"__l.{c}").alias(c) for c in left_payload]
        + [F.col(f"__match.{_right_out(c)}").alias(_right_out(c)) for c in right_payload]
    )
    if how == "inner":
        # Filter on the carried struct itself: a matched right row whose
        # payload columns are all legitimately NULL still has a non-null
        # struct, so it is kept (null-checking a payload column would
        # wrongly drop it).
        merged = merged.filter(F.col("__match").isNotNull())
    return merged.select(*out_cols)
