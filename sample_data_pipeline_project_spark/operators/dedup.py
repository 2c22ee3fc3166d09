"""Deduplication operators (B1/B2): exact, n-gram Jaccard, MinHash-LSH.

All variants are pure DataFrame compositions — no UDFs — so they scale as
ordinary shuffles and stay inside whole-stage codegen. Hashing is md5
(portable across engines; see functions/text.py).

Scale shapes (100 TB corpus):
  - exact dedup: one hash-aggregate on the dedup key. For long texts key on
    `md5(text)` (16 bytes) instead of the text itself so the shuffle moves
    fingerprints, not documents.
  - n-gram Jaccard: the token->doc inverted-index join explodes on frequent
    tokens (stopword skew). Mitigations built in: distinct tokens per doc,
    and an optional document-frequency cap that drops tokens appearing in
    more than `max_df` docs (standard trick — ubiquitous tokens carry no
    discriminative signal but dominate the join).
  - MinHash-LSH: signatures are k grouped mins (one shuffle), banding turns
    the quadratic candidate search into an equi-join on (band, band_hash) —
    the LSH guarantee: only probable near-dups ever meet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sample_data_pipeline_project_spark.functions.text import tokens


def exact_dedup(
    df: DataFrame, key_cols: list[str], tiebreak: str
) -> DataFrame:
    """Keep exactly one row per key: the one with the smallest `tiebreak`.
    Equivalent to dropDuplicates(key_cols) but deterministic (B1)."""
    w = Window.partitionBy(*key_cols).orderBy(F.col(tiebreak).asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def dedup_groups(df: DataFrame, key_cols: list[str], tiebreak: str) -> DataFrame:
    """Per dedup-key summary: canonical (min-tiebreak) id + copy count."""
    return df.groupBy(*key_cols).agg(
        F.min(tiebreak).alias("canonical_id"),
        F.count(F.lit(1)).alias("n_copies"),
    )


def token_sets(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, token) pairs with per-doc distinct tokens — the inverted index."""
    return docs.select(
        F.col(id_col), F.explode(F.array_distinct(tokens(text_col))).alias("tok")
    )


def jaccard_pairs(
    docs: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df: int | None = None,
) -> DataFrame:
    """Unordered doc pairs (a < b) with token-set Jaccard >= threshold (B2,
    n-gram Jaccard with n=1; swap `tokens` for `word_ngrams` for higher n).

    Plan: explode distinct tokens -> self equi-join on token (only docs
    sharing a token ever meet) -> count shared -> jaccard = shared /
    (|a| + |b| - shared). `max_df` drops tokens present in more than that
    many docs before the join (skew guard)."""
    toks = token_sets(docs, id_col, text_col)
    if max_df is not None:
        df_counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
        toks = (
            toks.join(F.broadcast(df_counts.filter(F.col("df") <= max_df)), "tok")
            .drop("df")
        )
    sizes = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_tok"))
    a = toks.select(F.col(id_col).alias("a"), "tok")
    b = toks.select(F.col(id_col).alias("b"), "tok")
    shared = (
        a.join(b, "tok")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    return (
        shared.join(sizes.select(F.col(id_col).alias("a"), F.col("n_tok").alias("n_a")), "a")
        .join(sizes.select(F.col(id_col).alias("b"), F.col("n_tok").alias("n_b")), "b")
        .withColumn(
            "jaccard",
            F.col("shared").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("shared")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "shared", "n_a", "n_b", "jaccard")
    )


def jaccard_pairs_prefix(
    docs: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact Jaccard-threshold pairs via PREFIX FILTERING (Bayardo et al.
    "Scaling Up All Pairs Similarity Search", WWW'07; Xiao et al. PPJoin):
    same output as `jaccard_pairs`, asymptotically smaller join.

    Theorem: order tokens globally (rarest first). If J(x, y) >= t, then x
    and y share at least one token among each one's first
    |x| - ceil(t*|x|) + 1 tokens. So: index ONLY those prefix tokens,
    equi-join on them (candidates), then verify the exact Jaccard with one
    array_intersect over the full sorted token arrays.

    Scale shape: the naive inverted-index join is sum(df_tok^2) rows — on a
    stopword-heavy corpus that is quadratic. The prefix index holds ~
    (1-t)*|d| tokens per doc, and because tokens are ranked by ascending
    document frequency the indexed ones are precisely the rarest, so the
    candidate join collapses. Verification touches candidates only.
    """
    toks = token_sets(docs, id_col, text_col)
    # Global token order: ascending document frequency, token as tiebreak.
    # The vocabulary of distinct tokens is small relative to the corpus
    # (else there'd be no frequent-token blow-up to fix) — broadcast it.
    rank_w = Window.orderBy(F.col("df").asc(), F.col("tok").asc())
    tok_rank = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("df"))
        .withColumn("rank", F.row_number().over(rank_w))
        .select("tok", "rank")
    )
    # Adaptive verify strategy (an AQE-style stats decision, made once,
    # driver-side, from a tiny aggregate): with <= 64 distinct tokens a
    # doc's token SET is one 64-bit word, so verification is
    # bit_count(mask_a & mask_b) — three integer ops per candidate instead
    # of an O(|a|+|b|) array_intersect. Degenerate small-vocabulary
    # corpora are exactly the ones whose candidate sets explode, so the
    # cheap-verify path kicks in precisely when candidate volume peaks.
    vocab_size = tok_rank.count()
    ranked = toks.join(F.broadcast(tok_rank), "tok").select(id_col, "rank")
    agg_cols = [
        F.sort_array(F.collect_list("rank")).alias("ranks"),
        F.count(F.lit(1)).alias("n_tok"),
    ]
    use_bitmask = vocab_size <= 64
    if use_bitmask:
        agg_cols.append(
            F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), rank - 1)")).alias("mask")
        )
    per_doc = ranked.groupBy(id_col).agg(*agg_cols)
    prefix_len = (
        F.col("n_tok") - F.ceil(F.lit(threshold) * F.col("n_tok")) + F.lit(1)
    ).cast("int")
    prefix = per_doc.select(
        F.col(id_col),
        F.explode(F.slice("ranks", 1, prefix_len)).alias("rank"),
    )
    # No pre-verify distinct: a pair appears once per shared prefix token
    # (a small constant), and deduping AFTER the threshold filter shuffles
    # only qualifying pairs instead of every candidate.
    cands = (
        prefix.select(F.col(id_col).alias("a"), "rank")
        .join(prefix.select(F.col(id_col).alias("b"), "rank"), "rank")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
    )
    if use_bitmask:
        side_cols = lambda side: [  # noqa: E731
            F.col(id_col).alias(side),
            F.col("mask").alias(f"mask_{side}"),
            F.col("n_tok").alias(f"n_{side}"),
        ]
        shared_col = F.bit_count(
            F.col("mask_a").bitwiseAND(F.col("mask_b"))
        ).cast("long")
    else:
        side_cols = lambda side: [  # noqa: E731
            F.col(id_col).alias(side),
            F.col("ranks").alias(f"ranks_{side}"),
            F.col("n_tok").alias(f"n_{side}"),
        ]
        shared_col = F.size(F.array_intersect("ranks_a", "ranks_b")).cast("long")
    verified = (
        # AQE converts these to broadcast joins when the per-doc summary
        # side is small; at corpus scale they stay shuffle joins keyed on
        # the candidate ids (no hint — the right physical choice differs
        # by three orders of magnitude between test and production data).
        cands.join(per_doc.select(*side_cols("a")), "a")
        .join(per_doc.select(*side_cols("b")), "b")
        .withColumn("shared", shared_col)
        .withColumn(
            "jaccard",
            F.col("shared").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("shared")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "shared", "n_a", "n_b", "jaccard")
    )
    return verified.distinct()


def minhash_signatures(
    docs: DataFrame,
    num_hashes: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-doc MinHash signature: for seed i, min over the token set of
    md5(i || '|' || token). md5-hex min (lexicographic) is a valid minwise
    hash and is byte-identical in any engine. One explode + one grouped
    aggregate with `num_hashes` MIN columns — a single shuffle."""
    toks = token_sets(docs, id_col, text_col)
    mins = [
        F.min(F.md5(F.concat(F.lit(f"{i}|"), F.col("tok")))).alias(f"mh_{i}")
        for i in range(num_hashes)
    ]
    return toks.groupBy(id_col).agg(*mins)


def minhash_lsh_candidates(
    docs: DataFrame,
    num_hashes: int = 12,
    bands: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """LSH banding over MinHash signatures: hash each band of r = k/bands
    signature values; docs colliding on any (band_idx, band_hash) are
    candidate near-dup pairs (B2). Returns distinct unordered pairs.

    The band join is an equi-join on the band hash — at scale only
    colliding docs shuffle to the same reducer; no quadratic blow-up."""
    if num_hashes % bands:
        raise ValueError("num_hashes must be divisible by bands")
    r = num_hashes // bands
    sig = minhash_signatures(docs, num_hashes, id_col, text_col)
    band_cols = [
        F.struct(
            F.lit(bi).alias("band_idx"),
            F.md5(F.concat_ws(",", *[F.col(f"mh_{bi * r + j}") for j in range(r)])).alias(
                "band_hash"
            ),
        )
        for bi in range(bands)
    ]
    banded = sig.select(
        F.col(id_col), F.explode(F.array(*band_cols)).alias("bk")
    ).select(id_col, F.col("bk.band_idx").alias("band_idx"), F.col("bk.band_hash").alias("band_hash"))
    a = banded.select(F.col(id_col).alias("a"), "band_idx", "band_hash")
    b = banded.select(F.col(id_col).alias("b"), "band_idx", "band_hash")
    return (
        a.join(b, ["band_idx", "band_hash"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
