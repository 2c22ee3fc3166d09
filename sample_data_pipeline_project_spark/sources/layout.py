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
