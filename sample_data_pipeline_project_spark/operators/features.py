"""Typed feature-engineering operators: the engine-facing API keeps real
Spark types (`array<bigint>` feature vectors), while the registered
workloads request the scalar-serialized form the driver gate can hash.

Why two shapes: the per-round correctness gate canonicalizes results
with pandas sort_values/factorize, which cannot hash Array/Map/Struct
cells (the r04 red row `features_hashing_trick` proved it empirically).
A real feature store, though, wants `array<bigint>`, not comma-joined
strings. So the operator owns BOTH: `as_array=True` (default — typed
API for engine users) and `as_array=False` (gate-safe serialization,
used by the registered workloads). The serialization is the LAST step
of an otherwise identical plan, so the oracle-verified arithmetic is
the same plan the typed API runs.

Reference parity note: the reference client (snowflake_tasks.py) has no
featurization surface; these extend Tier B's training-data pipeline
mandate (SURVEY.md B4/C111/C129).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sample_data_pipeline_project_spark.functions.text import (
    md5_prefix_uint32_sql,
    tokens,
)


def hash_features(
    docs: DataFrame,
    n_buckets: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    as_array: bool = True,
) -> DataFrame:
    """FEATURE HASHING (the hashing trick): fold each document's token
    counts into a fixed `n_buckets`-bucket sparse vector via the portable
    md5-u32 bucket hash — vocabulary-free featurization that needs no
    dictionary broadcast or vocabulary shuffle at any corpus size.

    Returns one row per document: the sparse encoding as two PARALLEL
    SORTED sequences (buckets asc, aligned counts) plus `nnz`. With
    `as_array=True` the sequences are `array<bigint>` columns; with
    `as_array=False` they are comma-joined strings (the driver-gate
    schema). Shuffle is keyed (doc, bucket), bounded by docs x buckets.
    """
    bucket_expr = md5_prefix_uint32_sql("'fh|' || tok") + f" % {n_buckets}"
    toks = docs.select(
        id_col, F.explode(tokens(text_col)).alias("tok")
    ).filter(F.col("tok") != "")
    bt = (
        toks.select(id_col, F.expr(bucket_expr).alias("bucket"))
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    sorted_pairs = "array_sort(collect_list(struct(bucket, cnt)))"
    buckets = F.expr(f"transform({sorted_pairs}, x -> CAST(x.bucket AS BIGINT))")
    counts = F.expr(f"transform({sorted_pairs}, x -> CAST(x.cnt AS BIGINT))")
    if not as_array:
        buckets = F.array_join(buckets.cast("array<string>"), ",")
        counts = F.array_join(counts.cast("array<string>"), ",")
    return bt.groupBy(id_col).agg(
        buckets.alias("buckets"),
        counts.alias("counts"),
        F.count(F.lit(1)).cast("long").alias("nnz"),
    )


def recent_history(
    events: DataFrame,
    k: int = 3,
    user_col: str = "user_id",
    id_col: str = "event_id",
    ts_col: str = "ts",
    as_array: bool = True,
) -> DataFrame:
    """Per-user recent history: each user's k most recent event ids as a
    SORTED sequence (one row per user) — the feature-store
    "recent history" column. Ranks ride a user-partitioned window with a
    unique (ts, id) tiebreak; the sequence sorts ascending so collect
    order can't leak into downstream hashes. `as_array=True` emits
    `array<bigint>`; `as_array=False` emits the comma-joined string the
    driver gate hashes."""
    w = Window.partitionBy(user_col).orderBy(
        F.col(ts_col).desc(), F.col(id_col).desc()
    )
    ranked = events.select(
        user_col, id_col, F.row_number().over(w).alias("rn")
    ).filter(F.col("rn") <= k)
    seq = F.sort_array(F.collect_list(id_col))
    if not as_array:
        seq = F.array_join(seq.cast("array<string>"), ",")
    return ranked.groupBy(user_col).agg(
        seq.alias("recent_event_ids"),
        F.count(F.lit(1)).cast("long").alias("n_recent"),
    )


def embedding_transforms(
    embeddings: DataFrame,
    clip: float = 0.25,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    as_array: bool = True,
) -> DataFrame:
    """TYPED twin of the C59 array-HOF workload (`scalar_array_hof_funcs`):
    per-vector element-wise transforms plus their scalar folds, all
    JVM-side codegen HOFs, pure projection (zero shuffle at any scale).

    With `as_array=True` (engine API) the result carries the TYPED
    intermediate arrays an ML pipeline actually wants —
    `abs_values array<double>`, `positives array<float>` (the filtered
    subsequence, element type preserved), `clipped_values array<double>`
    — alongside the scalar folds. With `as_array=False` only the scalar
    folds remain: exactly the registered workload's gate-safe shape, and
    the SAME plan minus the three array projections, so the
    oracle-verified arithmetic is what the typed API runs."""
    absd = f"transform({vec_col}, x -> abs(CAST(x AS DOUBLE)))"
    clipd = (
        f"transform({vec_col}, x -> LEAST(GREATEST(CAST(x AS DOUBLE),"
        f" -{clip!r}), {clip!r}))"
    )
    cols = [
        F.col(id_col),
        F.expr(f"CAST(size({vec_col}) AS BIGINT)").alias("dim"),
        F.expr(
            f"CAST(size(filter({vec_col}, x -> x > 0)) AS BIGINT)"
        ).alias("n_pos"),
        F.expr(
            f"aggregate({absd}, CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
        ).alias("l1_norm"),
        F.expr(
            f"aggregate({absd}, CAST(0.0 AS DOUBLE),"
            " (acc, v) -> CASE WHEN v > acc THEN v ELSE acc END)"
        ).alias("max_abs"),
        F.expr(
            f"aggregate({clipd}, CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
        ).alias("clipped_sum"),
    ]
    if as_array:
        cols += [
            F.expr(absd).alias("abs_values"),
            F.expr(f"filter({vec_col}, x -> x > 0)").alias("positives"),
            F.expr(clipd).alias("clipped_values"),
        ]
    return embeddings.select(*cols)


def event_type_share_map(
    events: DataFrame,
    min_share: float = 0.25,
    user_col: str = "user_id",
    type_col: str = "event_type",
    as_map: bool = True,
) -> DataFrame:
    """TYPED twin of the C100 map-HOF workload (`scalar_map_hof_funcs`):
    per-user dominant event types. With `as_map=True` (engine API) the
    result is one row per user carrying the real
    `map<string, struct<n_type bigint, share double>>` column
    (`dominant`) a feature store would persist; with `as_map=False` the
    map is exploded to the registered workload's gate-safe row shape
    (user_id, event_type, n_type, share). Both shapes share the plan up
    to the final entries-explode: one keyed shuffle into the per-user
    map build, map HOFs all JVM-side."""
    cnt = events.groupBy(user_col, type_col).agg(
        F.count(F.lit(1)).alias("n_type")
    )
    m = cnt.groupBy(user_col).agg(
        F.map_from_entries(
            F.collect_list(F.struct(type_col, "n_type"))
        ).alias("type_counts")
    )
    with_share = m.select(
        user_col,
        F.expr(
            "map_filter("
            "  transform_values(type_counts,"
            "    (k, v) -> struct(CAST(v AS BIGINT) AS n_type,"
            "      CAST(v AS DOUBLE) / CAST(aggregate(map_values(type_counts),"
            "        0L, (acc, x) -> acc + x) AS DOUBLE) AS share)),"
            f"  (k, v) -> v.share >= {min_share!r})"
        ).alias("dominant"),
    )
    if as_map:
        return with_share
    return with_share.select(
        user_col, F.explode(F.map_entries("dominant")).alias("e")
    ).select(
        user_col,
        F.col("e.key").alias(type_col),
        F.col("e.value.n_type").alias("n_type"),
        F.col("e.value.share").alias("share"),
    )
