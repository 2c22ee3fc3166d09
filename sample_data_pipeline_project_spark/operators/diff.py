"""Table reconciliation diff: classify rows of two table versions as
Inserted / Deleted / Updated by comparing 16-byte row fingerprints.

The anti-entropy shape used to reconcile replicas, certify a migration,
or audit a CDC apply (the read-side complement of `sources/cow.py`'s A21
DML surface — reference parity: execute_dml_query rows_affected,
snowflake_query_client.py:254-294, verified here from the data itself).

Scale shape (100 TB): each side is reduced map-side to
(key, md5-of-row) BEFORE the shuffle, so the full-outer join moves
16-byte fingerprints, never full rows; the join shuffles on the key —
the same hash partitioning both sides share, no skew beyond the key
distribution itself. Unchanged rows (the overwhelming majority in a
reconciliation) are dropped by a post-join filter, so the output is
proportional to the CHANGE volume, not the table size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Unit separator / NUL make the fingerprint injective over column
# boundaries ("ab","c" never collides with "a","bc"; NULL never
# collides with the empty string).
_SEP = "\x1f"
_NULL = "\x00"


def row_fingerprint(df: DataFrame, compare_cols: list[str]) -> F.Column:
    """16-byte md5 fingerprint over `compare_cols` (canonical string
    casts, NULL-safe). Only Spark-side self-consistency is required —
    both diff sides run this same expression."""
    parts = [
        F.coalesce(F.col(c).cast("string"), F.lit(_NULL)) for c in compare_cols
    ]
    return F.md5(F.concat_ws(_SEP, *parts))


def table_diff(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Diff `right` (new version) against `left` (old version).

    Returns one row per CHANGED key: (*key_cols, change_type) where
    change_type is 'D' (key only in left), 'I' (key only in right), or
    'U' (key in both, fingerprint differs). Unchanged keys are dropped.
    Assumes `key_cols` uniquely identify rows on each side.
    """
    lf = left.select(
        *key_cols, row_fingerprint(left, compare_cols).alias("_fp_l")
    )
    rf = right.select(
        *key_cols, row_fingerprint(right, compare_cols).alias("_fp_r")
    )
    j = lf.join(rf, on=key_cols, how="full_outer")
    change = (
        F.when(F.col("_fp_r").isNull(), F.lit("D"))
        .when(F.col("_fp_l").isNull(), F.lit("I"))
        .when(F.col("_fp_l") != F.col("_fp_r"), F.lit("U"))
    )
    return (
        j.select(*key_cols, change.alias("change_type"))
        .filter(F.col("change_type").isNotNull())
    )
