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

from sample_data_pipeline_project_spark.functions.text import tokens, word_ngrams

# Vocabulary size above which jaccard_pairs_prefix switches from a
# driver-collected token ranking to the distributed bucket-offset rank
# (module-level so tests can force the distributed path on small data).
VOCAB_COLLECT_CAP = 100_000


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


def token_sets(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram_n: int | None = None,
) -> DataFrame:
    """(id, token) pairs with per-doc distinct tokens — the inverted index.
    `ngram_n` switches the unit from single tokens to word n-gram shingles
    (the usual choice for near-dup detection: n in 2..5)."""
    toked = docs.withColumn("__toks", tokens(text_col))
    unit = (
        F.col("__toks") if ngram_n is None else word_ngrams("__toks", ngram_n)
    )
    return toked.select(
        F.col(id_col), F.explode(F.array_distinct(unit)).alias("tok")
    )


def jaccard_pairs(
    docs: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df: int | None = None,
    ngram_n: int | None = None,
) -> DataFrame:
    """Unordered doc pairs (a < b) with token-set Jaccard >= threshold (B2;
    `ngram_n` switches the set unit to word n-gram shingles).

    Plan: explode distinct tokens -> self equi-join on token (only docs
    sharing a token ever meet) -> count shared -> jaccard = shared /
    (|a| + |b| - shared). `max_df` drops tokens present in more than that
    many docs before the join (skew guard)."""
    toks = token_sets(docs, id_col, text_col, ngram_n)
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
    ngram_n: int | None = None,
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

    Caching contract: the returned DataFrame and internal signature
    tables are `.cache()`'d (they are referenced multiple times in-plan);
    the CALLER owns the lifecycle — call `spark.catalog.clearCache()` (or
    `.unpersist()` the result) between repeated invocations in one
    session, as bench.py does, or cached blocks accumulate.
    """
    # Tokenize ONCE: the token table feeds both the document-frequency
    # ranking and the per-doc signature build; without the cache the
    # tokenize/explode subplan executes three times (df-rank job, rank-join
    # side, per-doc side). In a deployment this is the materialized
    # inverted index; in-plan we cache it for the operator's lifetime.
    toks = token_sets(docs, id_col, text_col, ngram_n).cache()
    # Global token order: ascending document frequency, token as tiebreak.
    # Small vocabularies (the common shingle case after distinct-per-doc)
    # are collected to the driver and rebroadcast as a literal relation, so
    # building the rank join side never re-runs a ranking subplan and the
    # same pass yields the vocabulary size for the verify-strategy
    # decision. A shingle vocabulary too big to collect (real 100 TB
    # corpora) takes the distributed path: df-descending row_number — a
    # rank exchange sized by |vocab|, not the corpus.
    df_counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    vocab = df_counts.orderBy(F.col("df").asc(), F.col("tok").asc()).take(
        VOCAB_COLLECT_CAP + 1
    )
    if len(vocab) <= VOCAB_COLLECT_CAP:
        vocab_size = len(vocab)
        tok_rank = docs.sparkSession.createDataFrame(
            [(r["tok"], i + 1) for i, r in enumerate(vocab)], "tok string, rank int"
        )
    else:
        # Distributed two-level rank — NO global window (a vocab-sized
        # single-partition sort is the plan class the engine bans):
        # operators/ranks.py buckets tokens by df value range, ranks
        # within each bucket, and offsets by lower-bucket counts; the
        # vocabulary size falls out of the same pass.
        from sample_data_pipeline_project_spark.operators.ranks import (
            bucketed_global_rank,
        )

        ranked_vocab, vocab_size = bucketed_global_rank(
            df_counts, "df", ["tok"], n_buckets=256, out_col="rank"
        )
        tok_rank = ranked_vocab.select(
            "tok", F.col("rank").cast("int").alias("rank")
        )
    # Adaptive verify strategy (an AQE-style stats decision, made once,
    # driver-side, from a tiny aggregate): with <= 64 distinct tokens a
    # doc's token SET is one 64-bit word, so verification is
    # bit_count(mask_a & mask_b) — three integer ops per candidate instead
    # of an O(|a|+|b|) array_intersect. Degenerate small-vocabulary
    # corpora are exactly the ones whose candidate sets explode, so the
    # cheap-verify path kicks in precisely when candidate volume peaks.
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
    # per_doc is referenced 4x downstream (both prefix sides, both verify
    # sides); without persistence Spark re-runs the whole tokenize/explode/
    # rank/collect pipeline for each reference. It is N rows of small
    # arrays — the classic "materialize signatures once" step (a real
    # deployment writes this table; in-plan we cache it).
    per_doc = ranked.groupBy(id_col).agg(*agg_cols).cache()
    prefix_len = (
        F.col("n_tok") - F.ceil(F.lit(threshold) * F.col("n_tok")) + F.lit(1)
    ).cast("int")
    prefix = per_doc.select(
        F.col(id_col),
        F.col("n_tok"),
        F.posexplode(F.slice("ranks", 1, prefix_len)).alias("pos0", "rank"),
    ).withColumn("pos", F.col("pos0") + 1).drop("pos0")
    # No pre-verify distinct: a pair appears once per shared prefix token
    # (a small constant), and deduping AFTER the threshold filter shuffles
    # only qualifying pairs instead of every candidate. Two more exact
    # PPJoin pruning rules run at candidate generation, before any verify
    # work: the LENGTH filter (J>=t forces t*|a| <= |b| <= |a|/t) and the
    # POSITIONAL filter (a token at prefix position p leaves at most
    # n - p + 1 tokens that can still overlap; J>=t needs overlap >=
    # ceil(t/(1+t) * (|a|+|b|))).
    pa = prefix.select(
        F.col(id_col).alias("a"), F.col("n_tok").alias("n_a"), "rank",
        F.col("pos").alias("pos_a"),
    )
    pb = prefix.select(
        F.col(id_col).alias("b"), F.col("n_tok").alias("n_b"), "rank",
        F.col("pos").alias("pos_b"),
    )
    min_overlap = F.ceil(
        F.lit(threshold) / (1 + threshold) * (F.col("n_a") + F.col("n_b"))
    )
    cands = (
        pa.join(pb, "rank")
        .filter(F.col("a") < F.col("b"))
        .filter(F.col("n_b") >= F.lit(threshold) * F.col("n_a"))
        .filter(F.col("n_a") >= F.lit(threshold) * F.col("n_b"))
        .filter(
            1 + F.least(F.col("n_a") - F.col("pos_a"), F.col("n_b") - F.col("pos_b"))
            >= min_overlap
        )
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
    # Cache the (tiny) verified pair set: multiple consumers in one session
    # run this identical plan — the pair workload itself plus the
    # connected-components clustering built on the same pairs — and Spark's
    # plan-equality cache turns the second execution into a memory read.
    # A real deployment materializes the near-dup pair table once for the
    # same reason; pairs are O(dups), orders of magnitude below the corpus.
    return verified.distinct().cache()


def simhash_bit_sql(md5_expr: str, j: int) -> str:
    """Bit j (LSB-first) of the 32-bit value encoded by the first 8 hex
    chars of `md5_expr` — written with only substr/instr/shift arithmetic,
    which evaluate identically in Spark SQL and DuckDB (the oracle builds
    the same string), so fingerprints are engine-portable."""
    char = f"substr({md5_expr}, {8 - j // 4}, 1)"
    return f"(((instr('0123456789abcdef', {char}) - 1) >> {j % 4}) & 1)"


SIMHASH_BITS = 32


def simhash_fingerprints(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram_n: int | None = None,
) -> DataFrame:
    """Per-doc 32-bit SimHash (Charikar, STOC'02): each distinct token
    votes +1/-1 on every bit position according to its own hash; fingerprint
    bit j is 1 iff the positive votes win (ties -> 0, deterministic).
    One explode + one grouped aggregate with 32 SUM columns — a single
    shuffle of (id, 32 ints), exactly the MinHash signature shape."""
    toks = token_sets(docs, id_col, text_col, ngram_n)
    h = "md5(tok)"
    votes = [
        F.sum(F.expr(f"{simhash_bit_sql(h, j)} * 2 - 1")).alias(f"s_{j}")
        for j in range(SIMHASH_BITS)
    ]
    fp = None
    for j in range(SIMHASH_BITS):
        term = F.expr(f"CASE WHEN s_{j} > 0 THEN CAST({1 << j} AS BIGINT) ELSE 0 END")
        fp = term if fp is None else fp + term
    return toks.groupBy(id_col).agg(*votes).select(id_col, fp.alias("simhash"))


def banded_hamming_pairs(
    sig: DataFrame,
    bits: int,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    fp_col: str = "fp",
    bands: int = 4,
) -> DataFrame:
    """Generic banded Hamming self-join over any integer fingerprint
    column: unordered pairs (a < b) with bit_count(xor) <= `max_hamming`.
    EXACT, not approximate: with `bands` equal bit-slices and
    max_hamming < bands, the pigeonhole principle guarantees every
    qualifying pair agrees on at least one whole slice — so the banded
    equi-join loses nothing, and bit_count(xor) verifies candidates.
    Shared by SimHash text near-dup and the multimodal content dHash.
    Returns (a, b, fp_a, fp_b, hamming)."""
    if max_hamming >= bands:
        raise ValueError("exactness requires max_hamming < bands")
    if bits % bands:
        raise ValueError("bands must divide the fingerprint width")
    width = bits // bands
    band_cols = [
        F.struct(
            F.lit(b).alias("band_idx"),
            F.expr(f"({fp_col} >> {b * width}) & {(1 << width) - 1}").alias(
                "band_val"
            ),
        )
        for b in range(bands)
    ]
    banded = sig.select(
        F.col(id_col), F.col(fp_col), F.explode(F.array(*band_cols)).alias("bk")
    ).select(
        id_col,
        fp_col,
        F.col("bk.band_idx").alias("band_idx"),
        F.col("bk.band_val").alias("band_val"),
    )
    a = banded.select(
        F.col(id_col).alias("a"), F.col(fp_col).alias("fp_a"), "band_idx", "band_val"
    )
    b = banded.select(
        F.col(id_col).alias("b"), F.col(fp_col).alias("fp_b"), "band_idx", "band_val"
    )
    return (
        a.join(b, ["band_idx", "band_val"])
        .filter(F.col("a") < F.col("b"))
        .withColumn(
            "hamming",
            F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b"))).cast("long"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("a", "b", "fp_a", "fp_b", "hamming")
        .distinct()
    )


def simhash_pairs(
    docs: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram_n: int | None = None,
    bands: int = 4,
) -> DataFrame:
    """Unordered doc pairs (a < b) with SimHash Hamming distance <=
    `max_hamming` — `banded_hamming_pairs` over the SimHash fingerprints.
    Same filter-verify scale shape as the prefix-filtered Jaccard join."""
    if max_hamming >= bands:
        raise ValueError("exactness requires max_hamming < bands")
    # Cached for the same both-sides-of-the-band-join reason as MinHash.
    sig = simhash_fingerprints(docs, id_col, text_col, ngram_n).cache()
    return banded_hamming_pairs(
        sig,
        SIMHASH_BITS,
        max_hamming,
        id_col=id_col,
        fp_col="simhash",
        bands=bands,
    ).select(
        "a",
        "b",
        F.col("fp_a").alias("simhash_a"),
        F.col("fp_b").alias("simhash_b"),
        "hamming",
    )


def minhash_signatures(
    docs: DataFrame,
    num_hashes: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram_n: int | None = None,
) -> DataFrame:
    """Per-doc MinHash signature: for seed i, min over the token set of
    md5(i || '|' || token). md5-hex min (lexicographic) is a valid minwise
    hash and is byte-identical in any engine. One explode + one grouped
    aggregate with `num_hashes` MIN columns — a single shuffle.
    `ngram_n` switches the set unit from single tokens to word n-gram
    shingles — the 100 TB configuration: shingles decorrelate documents
    that merely share vocabulary, collapsing band-collision rates."""
    toks = token_sets(docs, id_col, text_col, ngram_n)
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
    ngram_n: int | None = None,
) -> DataFrame:
    """LSH banding over MinHash signatures: hash each band of r = k/bands
    signature values; docs colliding on any (band_idx, band_hash) are
    candidate near-dup pairs (B2). Returns distinct unordered pairs.

    The band join is an equi-join on the band hash — at scale only
    colliding docs shuffle to the same reducer; no quadratic blow-up.

    Pair dedup is the FIRST-COLLIDING-BAND rule, not a distinct(): a
    pair colliding in several bands is emitted only from the join row
    whose band_idx is its minimal colliding band — a row-wise filter
    over each side's (tiny, bands-length) band-hash array. A distinct()
    here would re-shuffle the full candidate-pair set, which is the
    single largest intermediate of the whole dedup pipeline (76M rows at
    sf1, measured in SCALING.md); the filter removes that exchange
    entirely while producing the identical pair set. The band-hash array
    rides the (corpus-sized, pair-free) join INPUT, so the payload cost
    is bands x 32 bytes per banded row — noise next to the avoided
    pair-sized shuffle."""
    if num_hashes % bands:
        raise ValueError("num_hashes must be divisible by bands")
    # Both join sides read the signature table; cache so the token explode
    # + k-way min aggregation runs once (see jaccard_pairs_prefix note).
    sig = minhash_signatures(docs, num_hashes, id_col, text_col, ngram_n).cache()
    banded = _band_explode(sig, num_hashes, bands, id_col, keep_all=True)
    a = banded.select(
        F.col(id_col).alias("a"),
        "band_idx",
        "band_hash",
        *[F.col(f"h{j}").alias(f"a_h{j}") for j in range(bands - 1)],
    )
    b = banded.select(
        F.col(id_col).alias("b"),
        "band_idx",
        "band_hash",
        *[F.col(f"h{j}").alias(f"b_h{j}") for j in range(bands - 1)],
    )
    # Scalar (codegen-friendly, no higher-order boxing) form of "this
    # pair already collided at a lower band". Only bands-1 hash columns
    # ride each side: the last band's hash can never be an EARLIER
    # collision, and band j's own hash is the join key.
    earlier = F.lit(False)
    for j in range(bands - 1):
        earlier = earlier | (
            (F.col("band_idx") > j) & (F.col(f"a_h{j}") == F.col(f"b_h{j}"))
        )
    return (
        a.join(b, ["band_idx", "band_hash"])
        .filter(F.col("a") < F.col("b"))
        .filter(~earlier)
        .select("a", "b")
    )


def _band_explode(
    sig: DataFrame, num_hashes: int, bands: int, id_col: str, keep_all: bool = False
) -> DataFrame:
    """(id, band_idx, band_hash) rows: each band of r = k/bands signature
    values hashed to one key — the LSH bucket id. With `keep_all`, each
    row additionally carries h0..h{bands-2}, the lower bands' hashes as
    SCALAR columns (for the first-colliding-band pair-dedup filter —
    scalar so the filter stays inside whole-stage codegen)."""
    r = num_hashes // bands
    hash_cols = [
        F.md5(
            F.concat_ws(",", *[F.col(f"mh_{bi * r + j}") for j in range(r)])
        )
        for bi in range(bands)
    ]
    # Project each band md5 to a NAMED COLUMN first, then build the
    # exploded struct array from those columns: Catalyst does not share
    # subexpressions across an explode, so referencing the raw md5
    # expression both inside the struct array and as the keep_all
    # ride-along scalar would compute each digest twice per row. (The
    # two projections stay separate — CollapseProject only inlines
    # cheap, single-referenced aliases, and md5 is neither.)
    hashed = sig.select(
        F.col(id_col),
        *[h.alias(f"h{bi}") for bi, h in enumerate(hash_cols)],
    )
    band_cols = [
        F.struct(
            F.lit(bi).alias("band_idx"), F.col(f"h{bi}").alias("band_hash")
        )
        for bi in range(bands)
    ]
    base = hashed.select(
        F.col(id_col),
        F.explode(F.array(*band_cols)).alias("bk"),
        *([f"h{j}" for j in range(bands - 1)] if keep_all else []),
    )
    return base.select(
        id_col,
        F.col("bk.band_idx").alias("band_idx"),
        F.col("bk.band_hash").alias("band_hash"),
        *([f"h{j}" for j in range(bands - 1)] if keep_all else []),
    )


def minhash_lsh_candidates_incremental(
    base_sigs: DataFrame,
    delta_docs: DataFrame,
    num_hashes: int = 12,
    bands: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """INCREMENTAL LSH: candidate pairs introduced by a DELTA batch of new
    documents against an EXISTING corpus whose MinHash signatures are
    already materialized (`base_sigs`, e.g. read back from the signature
    store) — the daily-crawl-versus-100-TB-corpus dedup shape. Base
    documents are never re-tokenized or re-hashed; only the delta is
    signed, and the band join is delta-bands against (base + delta)
    bands, so shuffle volume is sized by the DELTA plus its colliding
    buckets — not the corpus. Returns distinct unordered pairs touching
    at least one delta doc: exactly the full-corpus candidate set minus
    the base-base pairs already found by earlier runs."""
    if num_hashes % bands:
        raise ValueError("num_hashes must be divisible by bands")
    delta_sigs = minhash_signatures(delta_docs, num_hashes, id_col, text_col).cache()
    all_banded = _band_explode(
        base_sigs.unionByName(delta_sigs), num_hashes, bands, id_col
    )
    delta_banded = _band_explode(delta_sigs, num_hashes, bands, id_col)
    d = delta_banded.select(F.col(id_col).alias("a"), "band_idx", "band_hash")
    e = all_banded.select(F.col(id_col).alias("b"), "band_idx", "band_hash")
    return (
        d.join(e, ["band_idx", "band_hash"])
        .filter(F.col("a") != F.col("b"))
        .select(
            F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b")
        )
        .distinct()
    )


def edit_distance_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    block_col: str = "lang",
    prefix_len: int = 40,
    threshold: int = 2,
    q: int = 12,
) -> DataFrame:
    """Exact edit-distance near-dup pairs via q-gram prefilter + banded DP.

    Pigeonhole guarantee: one edit destroys at most q of a string's
    (prefix_len - q + 1) q-grams, so two prefixes within edit distance t
    share at least (prefix_len - q + 1) - t*q q-grams — positive for the
    chosen (prefix_len=40, q=12, t=2), hence the gram equi-join loses NO
    true pair. Candidates therefore come from a sparse shuffle join on
    (block, gram) instead of the quadratic per-block cross join, and only
    they pay the DP verify (threshold-banded levenshtein, O(t*len)).

    At corpus scale the gram join's fan-out is the count of *shared*
    grams — near-dup clusters plus rare random collisions — so the plan
    stays proportional to the true pair set, not to block_size^2.
    Returns (doc_a, doc_b, prefix_edit_distance), doc_a < doc_b.
    """
    p = docs.select(
        F.col(id_col).alias("_id"),
        F.col(block_col).alias("_blk"),
        F.substring(F.col(text_col), 1, prefix_len).alias("_p"),
    )
    n_grams = prefix_len - q + 1
    grams = p.select(
        "_id",
        "_blk",
        "_p",
        F.explode(
            F.array(*[F.substring("_p", i + 1, q) for i in range(n_grams)])
        ).alias("_g"),
    )
    a, b = grams.alias("a"), grams.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a._blk") == F.col("b._blk"))
            & (F.col("a._g") == F.col("b._g"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("doc_a"),
            F.col("b._id").alias("doc_b"),
            F.col("a._p").alias("p_a"),
            F.col("b._p").alias("p_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    dist = F.levenshtein(F.col("p_a"), F.col("p_b"), threshold)
    return (
        cand.select("doc_a", "doc_b", dist.alias("prefix_edit_distance"))
        .filter(F.col("prefix_edit_distance") >= 0)
    )


def containment_pairs_prefix(
    docs: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram_n: int | None = None,
) -> DataFrame:
    """ASYMMETRIC near-dup detection: ordered pairs (a, b), a != b, with
    token-set CONTAINMENT |A∩B| / |A| >= threshold — "document a is
    (nearly) contained in document b", the quote-expansion / boilerplate-
    wrapper / near-superset relation symmetric Jaccard cannot see (a
    short doc fully quoted inside a long one has low Jaccard but
    containment 1.0). The dedup policy it feeds: keep the superset,
    drop the contained copy.

    Lossless prefix filter, one-sided (the containment analogue of the
    Bayardo/PPJoin prefix theorem): if |A∩B| >= ceil(t*|A|), then among
    A's first |A| - ceil(t*|A|) + 1 rarest-ranked tokens at least one is
    in B (pigeonhole). So only the PROBE side (a) indexes a prefix; the
    candidate side (b) indexes every token — there is no prefix bound on
    b because a shared token may sit anywhere in a superset. Candidates
    are then verified exactly.

    All threshold arithmetic is EXACT-RATIONAL: t is taken as p/q
    (Fraction), ceil(t*n) = (p*n + q - 1) div q, and the keep test is
    q*shared >= p*n_a — integer compares end-to-end, so boundary pairs
    (containment exactly t) can never be lost to IEEE rounding and the
    quadratic SQL oracle states the identical integer inequality.

    Scale shape: rank-by-df (bucketed two-level rank — no global
    window), prefix-vs-full inverted-index equi-join on the token rank,
    |B| >= t*|A| length pruning at candidate generation, verify on
    candidates only. Caching contract as jaccard_pairs_prefix: caller
    owns clearCache between repeated invocations.
    """
    from fractions import Fraction

    from sample_data_pipeline_project_spark.operators.ranks import (
        bucketed_global_rank,
    )

    frac = Fraction(threshold).limit_denominator(1_000_000)
    p, q = frac.numerator, frac.denominator
    toks = token_sets(docs, id_col, text_col, ngram_n).cache()
    df_counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    ranked_vocab, _ = bucketed_global_rank(
        df_counts, "df", ["tok"], n_buckets=256, out_col="rank"
    )
    tok_rank = ranked_vocab.select("tok", F.col("rank").cast("int").alias("rank"))
    ranked = toks.join(F.broadcast(tok_rank), "tok").select(id_col, "rank")
    per_doc = ranked.groupBy(id_col).agg(
        F.sort_array(F.collect_list("rank")).alias("ranks"),
        F.count(F.lit(1)).alias("n_tok"),
    ).cache()
    # prefix_len = n - ceil(t*n) + 1, in exact integers
    ceil_tn = F.expr(f"CAST(({p} * n_tok + {q} - 1) AS BIGINT) div {q}")
    prefix_len = (F.col("n_tok") - ceil_tn + F.lit(1)).cast("int")
    pa = per_doc.select(
        F.col(id_col).alias("a"),
        F.col("n_tok").alias("n_a"),
        F.explode(F.slice("ranks", 1, prefix_len)).alias("rank"),
    )
    pb = per_doc.select(
        F.col(id_col).alias("b"),
        F.col("n_tok").alias("n_b"),
        F.explode("ranks").alias("rank"),
    )
    cands = (
        pa.join(pb, "rank")
        .filter(F.col("a") != F.col("b"))
        .filter(F.lit(q) * F.col("n_b") >= F.lit(p) * F.col("n_a"))
        .select("a", "b")
        .distinct()
    )
    verified = (
        cands.join(
            per_doc.select(
                F.col(id_col).alias("a"),
                F.col("ranks").alias("ranks_a"),
                F.col("n_tok").alias("n_a"),
            ),
            "a",
        )
        .join(
            per_doc.select(
                F.col(id_col).alias("b"),
                F.col("ranks").alias("ranks_b"),
                F.col("n_tok").alias("n_b"),
            ),
            "b",
        )
        .withColumn(
            "shared", F.size(F.array_intersect("ranks_a", "ranks_b")).cast("long")
        )
        .filter(F.lit(q) * F.col("shared") >= F.lit(p) * F.col("n_a"))
    )
    return verified.select(
        "a",
        "b",
        "shared",
        F.col("n_a").cast("long"),
        F.col("n_b").cast("long"),
        (F.col("shared").cast("double") / F.col("n_a").cast("double")).alias(
            "containment"
        ),
    )
