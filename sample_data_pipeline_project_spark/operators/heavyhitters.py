"""Misra-Gries heavy-hitters summary: the deterministic, mergeable
frequent-items sketch (Misra & Gries 1982; mergeability per Agarwal et al.,
"Mergeable Summaries", PODS'12).

Why this exists alongside the Count-Min workload (C17): CM is a randomized
overestimating hash sketch; Misra-Gries is its deterministic UNDERestimating
dual with the classic guarantee

    true_count - n/(k+1)  <=  est  <=  true_count

for every item, where n is the stream length and k the counter budget —
so every item with true_count > n/(k+1) is guaranteed present in the
summary. That guarantee survives merging: each decrement event (in a shard
pass or in the merge) destroys >= k+1 units of total count mass, and total
mass is n, so cumulative underestimation of any single item is <= n/(k+1)
regardless of how the stream was split into shards.

Distributed shape (the 100 TB layout):
  - the stream is hash-sharded by a DETERMINISTIC key expression; each
    shard runs the O(k)-memory sequential MG pass over its rows in a
    pinned (sort-key) order via applyInPandas — constant memory per task,
    arbitrary stream length;
  - per-shard summaries are <= k rows each; the N-way merge (sum counters,
    subtract the (k+1)-th largest combined value, keep positives) runs on
    the driver over the shards x k bounded row set — the same
    "bounded collect at the API edge" contract as the bloom-filter blocks.

Determinism: shard assignment, in-shard order, and the merge rule are all
deterministic, so the summary is bit-identical run-to-run — but its exact
counter VALUES depend on the shard/order layout, so workloads certify the
oracle-stateable invariants (guaranteed-present set, underestimate, error
bound) rather than hashing raw estimates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_pass(values, k: int) -> dict:
    """Sequential Misra-Gries over an iterable of items, k counters."""
    counters: dict = {}
    for v in values:
        if v in counters:
            counters[v] += 1
        elif len(counters) < k:
            counters[v] = 1
        else:
            dead = []
            for t in counters:
                counters[t] -= 1
                if counters[t] == 0:
                    dead.append(t)
            for t in dead:
                del counters[t]
    return counters


def mg_merge(summaries: list[dict], k: int) -> dict:
    """N-way Misra-Gries merge: sum counters, then reduce back to <= k by
    subtracting the (k+1)-th largest combined value from every counter and
    dropping non-positives. Order-independent and error-preserving (the
    subtraction removes >= (k+1) * offset total mass)."""
    combined: dict = {}
    for s in summaries:
        for t, c in s.items():
            combined[t] = combined.get(t, 0) + int(c)
    if len(combined) <= k:
        return combined
    offset = sorted(combined.values(), reverse=True)[k]
    return {t: c - offset for t, c in combined.items() if c - offset > 0}


def mg_summary(
    items: DataFrame,
    k: int,
    item_col: str = "item",
    order_cols: list[str] | None = None,
    num_shards: int = 32,
) -> dict:
    """Distributed Misra-Gries: returns the merged {item: est} summary
    (<= k entries) for the item stream in `items`.

    `order_cols` pins the in-shard stream order (deterministic summaries);
    sharding hashes the first order column so one shard never exceeds
    1/num_shards of the stream in expectation. The merged summary is
    driver-side because it is bounded by num_shards * k rows — the
    API-edge collect contract.
    """
    import pandas as pd

    order_cols = order_cols or [item_col]
    schema = "item string, est long"

    def per_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_cols, kind="mergesort")
        counters = _mg_pass(pdf[item_col].tolist(), k)
        return pd.DataFrame(
            {"item": list(counters.keys()), "est": list(counters.values())}
        )

    sharded = items.withColumn(
        "__shard", F.pmod(F.hash(F.col(order_cols[0])), F.lit(num_shards))
    )
    summaries = (
        sharded.groupBy("__shard")
        .applyInPandas(per_shard, schema)
        .collect()  # bounded: num_shards * k rows
    )
    # the N-way merge only sums before its single reduction, so feeding
    # each row as a singleton summary is identical to per-shard dicts
    return mg_merge([{r["item"]: r["est"]} for r in summaries], k)
