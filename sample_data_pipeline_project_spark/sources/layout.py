"""Clustered (sort-ordered) parquet layout — scan pruning without an index.

Parquet keeps min/max statistics per row group; a reader skips any row
group whose stats exclude the pushed predicate. That only pays off if the
data is CLUSTERED on the filter column — in arrival order, every row
group spans the whole value domain and nothing is skipped. This module is
the write-side half: range-partition by the cluster columns (global
order, skew-balanced by sampling) and sort within partitions, so each
file covers a narrow, non-overlapping slice of the key space. The
single-column analogue of Z-ordering; at 100 TB this is the difference
between touching ~1/N of the row groups and touching all of them for a
point/range predicate on the cluster key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_clustered(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    num_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Write `df` as parquet clustered on `cluster_cols`: global range
    partitioning (one narrow key slice per output file) + within-file
    sort, making parquet row-group min/max stats selective for any
    predicate on a prefix of `cluster_cols`."""
    n = num_files or df.sparkSession.sparkContext.defaultParallelism
    (
        df.repartitionByRange(n, *cluster_cols)
        .sortWithinPartitions(*cluster_cols)
        .write.mode(mode)
        .parquet(path)
    )


def zorder_value(cols: list[str], bits: int = 16):
    """Z-order (Morton) key: interleave the low `bits` bits of each column
    so files sorted by the key stay clustered on EVERY participating
    column at once — row-group min/max stats then prune predicates on any
    of them, not just the leading sort column. Columns must be
    non-negative integers < 2**bits (rank/bucket-encode first if not).
    Pure bitwise JVM expressions — codegen-friendly, no UDF."""
    from pyspark.sql import functions as F

    n = len(cols)
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(cols):
            bit = F.shiftright(F.col(c).cast("long"), i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * n + j))
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    zorder_cols: list[str],
    num_files: int | None = None,
    bits: int = 8,
    mode: str = "overwrite",
) -> None:
    """Write parquet Z-ordered on `zorder_cols`: normalize each column to
    the full `bits`-wide range (min/max linear scaling — one tiny
    aggregate; without it a narrow-domain column contributes only
    constant-zero high bits and gets no pruning), interleave, then
    range-partition + sort by the key and drop it. The multi-column
    generalization of `write_clustered` — one layout serves point/range
    predicates on any participating column."""
    from pyspark.sql import functions as F

    stats = df.agg(
        *[F.min(c).alias(f"mn_{c}") for c in zorder_cols],
        *[F.max(c).alias(f"mx_{c}") for c in zorder_cols],
    ).first()
    top = (1 << bits) - 1
    scaled = df
    norm_cols = []
    for c in zorder_cols:
        mn, mx = stats[f"mn_{c}"], stats[f"mx_{c}"]
        span = max(int(mx) - int(mn), 1)
        nc = f"__z_{c}__"
        scaled = scaled.withColumn(
            nc,
            ((F.col(c).cast("long") - F.lit(int(mn))) * top / F.lit(span)).cast(
                "long"
            ),
        )
        norm_cols.append(nc)
    zcol = "__zorder__"
    keyed = scaled.withColumn(zcol, zorder_value(norm_cols, bits))
    n = num_files or df.sparkSession.sparkContext.defaultParallelism
    (
        keyed.repartitionByRange(n, zcol)
        .sortWithinPartitions(zcol)
        .drop(zcol, *norm_cols)
        .write.mode(mode)
        .parquet(path)
    )
