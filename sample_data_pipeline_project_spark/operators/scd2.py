"""Slowly-changing-dimension type-2 history building and maintenance.

The reference's ledger is append-only run telemetry (snowflake_tasks.py:
9-62 DDL surface); a production pipeline around it also needs the classic
warehouse primitive the reference leaves to Snowflake: turning a change
log into a versioned dimension (valid_from / valid_to / is_current) and
incrementally merging new change batches into that history.

Two entry points:

- `scd2_from_changelog`: full rebuild from a change log. One window
  pipeline — dedupe same-timestamp changes, collapse consecutive no-op
  changes, then frame each surviving change with `lead()`. All three
  windows share ONE partitioning (the business key), so the whole
  operator is a single shuffle on the key: at 100 TB the change log
  shuffles once and every window function rides the same sort.

- `scd2_apply_changes`: incremental maintenance. Closed-out history rows
  pass through untouched (never re-shuffled, never rewritten); only the
  current slice of the dimension plus the new batch — the tiny hot end of
  the table — is re-derived through the same changelog pipeline. This is
  the copy-on-write MERGE shape (sources/cow.py) specialized to
  versioned-history semantics.

Determinism: same-timestamp duplicate changes are resolved by a caller
supplied tiebreak column (highest wins), so rebuild and incremental paths
produce byte-identical history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Open-ended-version sentinel. Deliberately INSIDE pandas' ns-resolution
# range (max 2262-04-11): a 9999-12-31 sentinel crashes every
# toPandas/Arrow-ns fetch path — including the driver gate's — with
# "Casting from timestamp[us] to timestamp[ns] would result in out of
# bounds timestamp" (found by the driver-canon checker).
END_OF_TIME = "2262-01-01 00:00:00"


def scd2_from_changelog(
    changes: DataFrame,
    key_cols: list[str],
    ts_col: str,
    attr_cols: list[str],
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Build SCD2 history from a change log.

    changes: one row per observed (key, ts, attrs) change event.
    Returns key_cols + attr_cols + (valid_from, valid_to, is_current),
    where rows for a key tile the time axis half-open [from, to) and the
    final row per key is open-ended at END_OF_TIME with is_current=true.
    """
    keys = [F.col(c) for c in key_cols]
    if tiebreak_col is not None:
        # Same-ts duplicates: keep the highest tiebreak (last writer
        # wins). Ordering the KEY-partitioned window by (ts, tiebreak
        # desc) makes the winner the first row of each ts run, so the
        # dedup shares the same exchange+sort as every later window —
        # a (key, ts)-partitioned window here would cost a second
        # shuffle for nothing.
        w_dedup = Window.partitionBy(*keys).orderBy(
            F.col(ts_col).asc(), F.col(tiebreak_col).desc()
        )
        changes = (
            changes.withColumn("_prev_ts", F.lag(F.col(ts_col)).over(w_dedup))
            .filter(
                F.col("_prev_ts").isNull() | (F.col("_prev_ts") != F.col(ts_col))
            )
            .drop("_prev_ts")
        )
    w_key = Window.partitionBy(*keys).orderBy(F.col(ts_col).asc())
    attrs = F.struct(*[F.col(c) for c in attr_cols])
    # Collapse runs of identical attribute values: a "change" event that
    # changes nothing must not open a new version (null-safe compare so a
    # NULL attribute does not spuriously re-open versions every event).
    collapsed = (
        changes.withColumn("_prev", F.lag(attrs).over(w_key))
        .filter(F.col("_prev").isNull() | ~attrs.eqNullSafe(F.col("_prev")))
        .drop("_prev")
    )
    nxt = F.lead(F.col(ts_col)).over(w_key)
    return collapsed.select(
        *key_cols,
        *attr_cols,
        F.col(ts_col).alias("valid_from"),
        F.coalesce(nxt, F.lit(END_OF_TIME).cast(changes.schema[ts_col].dataType)).alias(
            "valid_to"
        ),
        nxt.isNull().alias("is_current"),
    )


def scd2_apply_changes(
    dim: DataFrame,
    batch: DataFrame,
    key_cols: list[str],
    ts_col: str,
    attr_cols: list[str],
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Merge a new change batch into an existing SCD2 dimension.

    dim: output shape of `scd2_from_changelog` (has valid_from/valid_to/
    is_current). batch: new change rows (key_cols + ts_col + attr_cols
    [+ tiebreak_col]); every batch ts must be >= the key's current
    valid_from (late data older than the open version is the caller's
    problem — route it to a full rebuild).

    Only the is_current slice is re-derived; closed rows stream through
    unchanged. Equivalent to rebuilding from the full concatenated
    changelog (tested property in tests/test_scd2.py).
    """
    closed = dim.filter(~F.col("is_current"))
    open_as_changes = dim.filter(F.col("is_current")).select(
        *key_cols,
        F.col("valid_from").alias(ts_col),
        *attr_cols,
    )
    if tiebreak_col is not None:
        # Same-ts collision between the open version and a batch row:
        # the batch wins (new information replaces the open version).
        # Open rows carry a NULL tiebreak; desc() sorts NULLs last, so
        # any non-null batch row outranks them in the dedup window.
        open_as_changes = open_as_changes.withColumn(
            tiebreak_col,
            F.lit(None).cast(batch.schema[tiebreak_col].dataType),
        )
    rebuilt = scd2_from_changelog(
        open_as_changes.unionByName(batch.select(*open_as_changes.columns)),
        key_cols,
        ts_col,
        attr_cols,
        tiebreak_col=tiebreak_col,
    )
    return closed.select(rebuilt.columns).unionByName(rebuilt)
