"""Deterministic training-shard writer.

The last step of a curation pipeline: materialize the corpus as N
equal-ish shards whose contents and intra-shard order are a pure function
of (data, seed) — so a re-run after a crash, or on a different cluster
layout, produces byte-identical shards, and downstream training jobs can
resume / compare across runs. The usual `df.repartition(n)` gives
round-robin placement that depends on input split sizes and task
scheduling; this writer derives placement from row CONTENT:

  shard  = pmod(xxhash64(key, seed), n_shards)      -- placement
  order  = xxhash64(key, seed + 1)                  -- deterministic
                                                       within-shard shuffle

One repartition (shuffle on the derived shard id) + an in-partition sort;
no global sort, no driver involvement. xxhash64 spreads any key domain
uniformly, so shards stay balanced regardless of key skew (tested); a
seed change produces an independent permutation — epoch reshuffling
without touching the source.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_training_shards(
    df: DataFrame,
    path: str,
    key: str,
    n_shards: int,
    seed: int = 0,
) -> None:
    """Write df as exactly `n_shards` parquet files under `path`,
    partition-dir `shard=K`, content and order determined by (key, seed).
    `key` must be unique per row for a well-defined global order."""
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    sharded = df.withColumn(
        "shard", F.pmod(F.xxhash64(F.col(key), F.lit(seed)), F.lit(n_shards))
    ).withColumn("_ord", F.xxhash64(F.col(key), F.lit(seed + 1)))
    (
        sharded.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "_ord")
        .drop("_ord")
        .write.partitionBy("shard")
        .mode("overwrite")
        .parquet(path)
    )


def read_shard(spark, path: str, shard: int) -> DataFrame:
    """Read one shard (partition pruning: only that directory is scanned)."""
    return spark.read.parquet(path).filter(F.col("shard") == shard)
