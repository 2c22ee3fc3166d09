"""Bloom-filter join pruning — the runtime-filter pattern, explicit.

A selective dimension/filter side is summarized into a Bloom bitset that
is broadcast into the fact-side SCAN, so rows that cannot join are
dropped before the join's shuffle ever moves them. At 100 TB this is the
difference between shuffling the whole fact table and shuffling the
matching fraction; engines apply it implicitly (Spark's own
`spark.sql.optimizer.runtime.bloomFilter.enabled` injects the same
shape), and making it an explicit operator lets a pipeline reuse one
built filter across many probe queries.

Correctness contract: the Bloom pass admits a SUPERSET of the true
matches (false positives only, never false negatives — membership tests
bits set by the build pass), and the exact join afterwards removes the
false positives. Results are therefore bit-identical to the unpruned
join; the filter only cuts shuffle volume.

Implementation: k=3 xxhash64 seeds map each key to bit positions in an
m-bit space; the build side aggregates bits per 64-bit block
(`bit_or` of `shiftleft`) — one small shuffle sized by m/64, not by the
build row count — and the resulting blocks are collected (m/64 longs,
e.g. 16 KiB for m=2^20) and re-broadcast as a literal array the probe
filter indexes with `element_at`. All JVM-side; no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SEEDS = (0x9E3779B9, 0x85EBCA6B, 0xC2B2AE35)


def _bit_positions(key: Column, m_bits: int) -> list[Column]:
    return [
        F.pmod(F.xxhash64(key, F.lit(seed)), F.lit(m_bits)) for seed in _SEEDS
    ]


def build_bloom(build: DataFrame, key_col: str, m_bits: int = 1 << 20) -> list[int]:
    """Aggregate the build side's keys into an m-bit Bloom bitset,
    returned as a dense list of m/64 longs (python ints)."""
    n_blocks = (m_bits + 63) // 64
    pos = build.select(
        F.explode(F.array(*_bit_positions(F.col(key_col), m_bits))).alias("pos")
    )
    blocks = (
        pos.select(
            (F.col("pos") / 64).cast("long").alias("blk"),
            F.call_function(
                "shiftleft", F.lit(1).cast("long"), (F.col("pos") % 64).cast("int")
            ).alias("bit"),
        )
        .groupBy("blk")
        .agg(F.bit_or("bit").alias("bits"))
        .collect()
    )
    dense = [0] * n_blocks
    for r in blocks:
        dense[r["blk"]] = r["bits"]
    return dense


def bloom_might_contain(
    key: Column, bloom_blocks: list[int], m_bits: int
) -> Column:
    """Membership predicate: all k bit positions of `key` are set. The
    bitset rides into the plan as one literal array (a broadcast, in
    cluster terms) and each test is k element_at + mask ops — cheap
    enough to sit inside the probe scan's WholeStageCodegen."""
    arr = F.lit(bloom_blocks)
    pred = None
    for pos in _bit_positions(key, m_bits):
        blk = (pos / 64).cast("long")
        bit = F.call_function(
            "shiftleft", F.lit(1).cast("long"), (pos % 64).cast("int")
        )
        test = F.element_at(arr, (blk + 1).cast("int")).bitwiseAND(bit) != 0
        pred = test if pred is None else (pred & test)
    return pred


def bloom_pruned_join(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str,
    m_bits: int = 1 << 20,
    how: str = "inner",
) -> DataFrame:
    """probe |><| build with the probe side pre-pruned by a Bloom filter
    built from the build side's keys. Bit-identical to the plain join.

    Only join types where dropping non-matching PROBE rows is semantics-
    preserving are allowed: an outer join must keep them (null-extended),
    so pre-filtering the probe side would silently lose rows."""
    if how not in ("inner", "left_semi", "semi"):
        raise ValueError(
            "bloom pruning drops non-matching probe rows pre-join; "
            f"only inner/semi joins preserve semantics, got how={how!r}"
        )
    blocks = build_bloom(build, build_key, m_bits)
    pruned = probe.filter(bloom_might_contain(F.col(probe_key), blocks, m_bits))
    return pruned.join(
        build, pruned[probe_key] == build[build_key], how
    )
