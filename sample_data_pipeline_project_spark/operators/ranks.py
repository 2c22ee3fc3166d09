"""Distributed global row-numbering WITHOUT a single-partition stage.

`Window.orderBy(...)` with no partition spec funnels the entire input
through one task — the plan class this engine structurally bans
(tests/test_plans.py registry guard). When a true global 1..N rank is
semantically required (exact order statistics, global token ranking),
this module computes it scale-safely:

  1. bucket rows by VALUE RANGE — deterministic arithmetic on the
     collected min/max (no sampling, unlike `repartitionByRange`, whose
     sampled bounds can differ between the count job and the rank job);
  2. rank within each bucket (partitioned window, parallel);
  3. add the summed row counts of lower buckets (one constant-size
     collect of `n_buckets` counts, broadcast back).

Because buckets are monotone in the leading sort value and total within
it, bucket-local rank + offset IS the global rank. Skewed buckets cost
only balance, never correctness. Users: `sketch_approx_quantiles`
(exact quantile certification) and the `jaccard_pairs_prefix`
large-vocabulary token ranking (operators/dedup.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def bucketed_global_rank(
    df: DataFrame,
    value_col: str,
    tiebreak_cols: list[str],
    n_buckets: int = 64,
    out_col: str = "rn",
) -> tuple[DataFrame, int]:
    """Global row_number 1..N by (value_col ASC, *tiebreak_cols ASC),
    computed distributed (see module docstring). `value_col` must be
    numeric (bucket arithmetic); `(value_col, *tiebreak_cols)` should be
    a unique key for a deterministic total order. Returns (ranked_df,
    total_row_count) — the count falls out of the offset pass for free.
    """
    nb = n_buckets
    mn, mx = df.agg(F.min(value_col), F.max(value_col)).first()
    if mn is None:  # empty input: no rows to rank
        return df.withColumn(out_col, F.lit(None).cast("long")), 0
    mnf, mxf = float(mn), float(mx)
    span = (mxf - mnf) if mxf > mnf else 1.0
    bkt = F.least(
        F.lit(nb - 1),
        F.floor(
            (F.col(value_col).cast("double") - F.lit(mnf)) / F.lit(span) * nb
        ),
    ).cast("int")
    b = df.withColumn("__bkt", bkt)
    counts = {
        r["__bkt"]: r["cnt"]
        for r in b.groupBy("__bkt").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    offsets, acc = [], 0
    for i in range(nb):
        offsets.append((i, acc))
        acc += counts.get(i, 0)
    off = df.sparkSession.createDataFrame(offsets, "__bkt int, __off long")
    w = Window.partitionBy("__bkt").orderBy(
        F.col(value_col).asc(), *[F.col(c).asc() for c in tiebreak_cols]
    )
    ranked = (
        b.join(F.broadcast(off), "__bkt")
        .withColumn(out_col, F.row_number().over(w) + F.col("__off"))
        .drop("__bkt", "__off")
    )
    return ranked, acc
