"""Salted equi-join for skewed keys.

When one join key carries a disproportionate share of the fact rows, the
shuffle hash-partitions everything with that key onto ONE reducer and the
stage runs as long as its hottest partition. AQE's skew-join splitting
handles this when sizes are visible at runtime; this operator is the
explicit form — needed when AQE can't see it (pre-shuffled inputs,
non-sort-merge plans) or when the skew is known up front.

Mechanics: the fact side gets a deterministic salt in [0, R) derived by
hashing a per-row column (NOT rand(): retries/speculative re-executions
must re-derive the same salt or a task retry silently duplicates rows).
The dimension side is replicated R times via an explode over the salt
range. The join key becomes (key, salt): each hot key now spreads across
R reducers, and the dimension's R copies meet every shard. Row-for-row
identical to the plain join (tests/test_skewjoin.py proves equality).

Cost model: replication multiplies the dim shuffle volume by R — use for
SMALL-but-not-broadcastable dims, or cap R. For dims that fit in memory
`F.broadcast` is strictly better (no shuffle at all); the salt path is
for the middle regime and for skewed agg-after-join pipelines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt_from: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join fact to dim on `key`, spreading each fact key over `n_salts`
    reducers. `salt_from` is a fact column hashed to derive the salt
    (pick one with per-row variety, e.g. the fact's primary key).
    Returns fact columns + dim's non-key columns, like a plain join."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    f = fact.withColumn("__salt", F.pmod(F.xxhash64(F.col(salt_from)), F.lit(n_salts)))
    d = dim.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    joined = f.join(d, [key, "__salt"], how)
    return joined.drop("__salt")
