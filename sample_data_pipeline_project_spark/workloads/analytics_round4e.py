"""Round-4e workloads: language-model count smoothing (Good-Turing,
Kneser-Ney), KMV distinct-count sketching with error certification, and
integer-keyspace gap detection.

Determinism notes:
  - Smoothing estimators are rationals over exact integer count tables
    (count-of-counts, continuation counts) evaluated in ONE fixed shared
    double expression; the discount D=0.75 is an exactly-representable
    double literal.
  - The KMV estimator hashes values with the portable md5-u32 fragment,
    so the k-th smallest hash is the same integer on both engines and the
    estimate is one fixed division.
  - Scalar statistics (total bigram types, true distinct counts) reach
    row expressions via a constant-key equi-join (broadcast hash join),
    never a cross join — the registry-wide plan invariant forbids
    CartesianProduct.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sample_data_pipeline_project_spark.functions.text import (
    md5_prefix_uint32_sql,
    tokens,
    word_bigrams,
)
from sample_data_pipeline_project_spark.sources.catalog import load_table
from sample_data_pipeline_project_spark.workloads import workload

# --------------------------------------------------------------------------
# C181 — Good-Turing count-of-counts and adjusted counts
# --------------------------------------------------------------------------

_GT_TOP_R = 50

_GT_ORACLE = f"""
WITH toks AS (
  SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok
  FROM documents
),
tc AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS c FROM toks GROUP BY tok),
coc AS (SELECT c AS r, CAST(COUNT(*) AS BIGINT) AS n_r FROM tc GROUP BY c)
SELECT a.r, a.n_r,
       CAST((a.r + 1) * b.n_r AS DOUBLE) / CAST(a.n_r AS DOUBLE) AS r_star
FROM coc a LEFT JOIN coc b ON b.r = a.r + 1
ORDER BY a.r ASC LIMIT {_GT_TOP_R}
"""


@workload("text_good_turing_counts", oracle=_GT_ORACLE)
def text_good_turing_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Good-Turing frequency re-estimation over the corpus vocabulary:
    the count-of-counts table N_r (how many token types occur exactly r
    times) and the adjusted count r* = (r+1) * N_{r+1} / N_r — the
    classic estimator of unseen-event mass (r*=NULL where N_{r+1}=0, the
    point where practical SGT switches to a fitted line). Two grouped
    aggregations (token counts, then count-of-counts); the N_r table is
    at most #distinct-frequencies rows, so the r+1 self-join is tiny at
    any corpus size. Exact integer counts; the single division is the
    only double op."""
    d = load_table(spark, sf_dir, "documents")
    tc = (
        d.select(F.explode(tokens("text")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    coc = tc.groupBy(F.col("c").alias("r")).agg(
        F.count(F.lit(1)).cast("long").alias("n_r")
    )
    a, b = coc.alias("a"), coc.alias("b")
    return (
        a.join(b, F.col("b.r") == F.col("a.r") + 1, "left")
        .select(
            F.col("a.r").alias("r"),
            F.col("a.n_r").alias("n_r"),
            (
                ((F.col("a.r") + 1) * F.col("b.n_r")).cast("double")
                / F.col("a.n_r").cast("double")
            ).alias("r_star"),
        )
        .orderBy(F.col("r").asc())
        .limit(_GT_TOP_R)
    )


# --------------------------------------------------------------------------
# C182 — KMV (k minimum values) distinct sketch with error certification
# --------------------------------------------------------------------------

_KMV_K = 256
_KMV_U32 = md5_prefix_uint32_sql("'kmv|' || CAST(user_id AS STRING)")
# est = (k-1) * 2^32 / h_k when >= k hashes exist, else the exact count.
_KMV_EST_EXPR = (
    f"CASE WHEN n_seen < {_KMV_K} THEN CAST(n_seen AS DOUBLE)"
    f" ELSE CAST({_KMV_K - 1} AS DOUBLE) * 4294967296.0 / CAST(kth_hash AS DOUBLE)"
    " END"
)

_KMV_ORACLE = f"""
WITH hashes AS (
  SELECT DISTINCT CAST({_KMV_U32} AS BIGINT) AS u FROM events
),
bottomk AS (SELECT u FROM hashes ORDER BY u LIMIT {_KMV_K}),
sk AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_seen, CAST(MAX(u) AS BIGINT) AS kth_hash
  FROM bottomk
),
tru AS (
  SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS true_distinct FROM events
)
SELECT CAST({_KMV_K} AS BIGINT) AS k, n_seen, kth_hash,
       {_KMV_EST_EXPR} AS est_distinct,
       true_distinct,
       ABS(({_KMV_EST_EXPR}) - CAST(true_distinct AS DOUBLE))
         <= 0.25 * CAST(true_distinct AS DOUBLE) AS within_bound
FROM sk JOIN tru ON 1 = 1
"""


@workload("sketch_kmv_distinct", oracle=_KMV_ORACLE)
def sketch_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (bottom-k / k-minimum-values) distinct-count sketch over event
    users, CERTIFIED against the exact distinct count: keep the k=256
    smallest md5-u32 hashes of the value domain; the k-th smallest hash
    h_k estimates density, giving D-hat = (k-1) * 2^32 / h_k. The bound
    column states |est - true| <= 4/sqrt(k) = 25% of true as a hash-
    stable boolean. Bottom-k is TakeOrderedAndProject (per-partition
    local bottom-k, driver merge of k rows per partition) — the
    mergeable-sketch shape: unions of KMV sketches are the bottom-k of
    the hash union, which is how this runs per-partition-then-merge at
    100 TB. The exact-count twin rides the same scan; the two 1-row
    results meet on a constant-key equi-join (broadcast), not a cross
    join."""
    e = load_table(spark, sf_dir, "events")
    hashes = e.select(F.expr(_KMV_U32).cast("long").alias("u")).distinct()
    sk = (
        hashes.orderBy("u")
        .limit(_KMV_K)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_seen"),
            F.max("u").cast("long").alias("kth_hash"),
        )
        .withColumn("j", F.lit(1))
    )
    tru = (
        e.agg(F.countDistinct("user_id").cast("long").alias("true_distinct"))
        .withColumn("j", F.lit(1))
    )
    est = F.expr(_KMV_EST_EXPR)
    return sk.join(F.broadcast(tru), "j").select(
        F.lit(_KMV_K).cast("long").alias("k"),
        "n_seen",
        "kth_hash",
        est.alias("est_distinct"),
        "true_distinct",
        (
            F.abs(est - F.col("true_distinct").cast("double"))
            <= 0.25 * F.col("true_distinct").cast("double")
        ).alias("within_bound"),
    )


# --------------------------------------------------------------------------
# C183 — integer-keyspace gap detection (missing-id islands)
# --------------------------------------------------------------------------

_GAP_BUCKET = 4096
_GAP_TOP_K = 100

_IDGAP_ORACLE = f"""
WITH ks AS (
  SELECT DISTINCT o_orderkey AS k FROM orders WHERE o_orderstatus = 'F'
),
seq AS (
  SELECT k, LAG(k) OVER (ORDER BY k) AS prev FROM ks
)
SELECT CAST(prev + 1 AS BIGINT) AS gap_start,
       CAST(k - 1 AS BIGINT) AS gap_end,
       CAST(k - prev - 1 AS BIGINT) AS gap_len
FROM seq
WHERE prev IS NOT NULL AND k - prev > 1
ORDER BY gap_len DESC, gap_start ASC
LIMIT {_GAP_TOP_K}
"""


@workload("dq_sequential_id_gaps", oracle=_IDGAP_ORACLE)
def dq_sequential_id_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Missing-id detection over an integer key domain: the top-{k}
    largest holes in the o_orderkey sequence of the FULFILLED slice
    (the testdata keyspace is dense, so the status filter is what makes
    holes — exactly the 'which id ranges never reached state X' audit).
    The successor scan never sorts globally: keys
    bucket by k div {b}, LAG runs inside (bucket)-partitioned windows,
    and the bucket-boundary gaps come from the bounded per-bucket
    (min, max) summary — keyspace/{b} rows — stitched on the driver
    (two-level recursion of the same machinery at larger domains). The
    final top-k is ORDER BY + LIMIT (TakeOrderedAndProject). The oracle
    states the same gaps from a plain single-node LAG. This is the DQ
    primitive behind 'did ingestion drop a batch?' on monotone ids."""
    o = load_table(spark, sf_dir, "orders")
    ks = (
        o.filter(F.col("o_orderstatus") == "F")
        .select(F.col("o_orderkey").alias("k"))
        .distinct()
    )
    ks = ks.withColumn("bkt", F.expr(f"k div {_GAP_BUCKET}"))
    w = Window.partitionBy("bkt").orderBy("k")
    inner = (
        ks.withColumn("prev", F.lag("k").over(w))
        .filter(F.col("prev").isNotNull() & (F.col("k") - F.col("prev") > 1))
        .select(
            (F.col("prev") + 1).cast("long").alias("gap_start"),
            (F.col("k") - 1).cast("long").alias("gap_end"),
            (F.col("k") - F.col("prev") - 1).cast("long").alias("gap_len"),
        )
    )
    bsum = sorted(
        ks.groupBy("bkt").agg(F.min("k").alias("lo"), F.max("k").alias("hi")).collect(),
        key=lambda r: r["bkt"],
    )
    boundary = []
    for prev_row, row in zip(bsum, bsum[1:]):
        if row["lo"] - prev_row["hi"] > 1:
            boundary.append(
                (prev_row["hi"] + 1, row["lo"] - 1, row["lo"] - prev_row["hi"] - 1)
            )
    gaps = inner
    if boundary:
        gaps = gaps.unionByName(
            spark.createDataFrame(
                boundary, "gap_start long, gap_end long, gap_len long"
            )
        )
    return gaps.orderBy(F.col("gap_len").desc(), F.col("gap_start").asc()).limit(
        _GAP_TOP_K
    )


# --------------------------------------------------------------------------
# C184 — interpolated Kneser-Ney bigram probabilities (D = 0.75)
# --------------------------------------------------------------------------

_KN_TOP_K = 50
_KN_P_EXPR = (
    "(GREATEST(CAST(c AS DOUBLE) - 0.75, CAST(0 AS DOUBLE)) / CAST(c1 AS DOUBLE))"
    " + ((0.75 * CAST(n1fw AS DOUBLE) / CAST(c1 AS DOUBLE))"
    " * (CAST(n1bw AS DOUBLE) / CAST(t_pairs AS DOUBLE)))"
)

_KN_ORACLE = f"""
WITH toks AS (
  SELECT string_split_regex(lower(trim(text)), '\\s+') AS t FROM documents
),
bigrams AS (
  SELECT unnest(t[1:len(t) - 1]) AS w1, unnest(t[2:len(t)]) AS w2 FROM toks
),
pc AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c FROM bigrams GROUP BY w1, w2),
fw AS (
  SELECT w1, CAST(SUM(c) AS BIGINT) AS c1, CAST(COUNT(*) AS BIGINT) AS n1fw
  FROM pc GROUP BY w1
),
bw AS (SELECT w2, CAST(COUNT(*) AS BIGINT) AS n1bw FROM pc GROUP BY w2),
tp AS (SELECT CAST(COUNT(*) AS BIGINT) AS t_pairs FROM pc),
top AS (SELECT w1, w2, c FROM pc ORDER BY c DESC, w1 ASC, w2 ASC LIMIT {_KN_TOP_K})
SELECT t.w1, t.w2, t.c, f.c1, f.n1fw, b.n1bw, tp.t_pairs,
       {_KN_P_EXPR} AS p_kn
FROM top t
JOIN fw f USING (w1)
JOIN bw b USING (w2)
JOIN tp ON 1 = 1
"""


@workload("text_kneser_ney_bigram", oracle=_KN_ORACLE)
def text_kneser_ney_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram probabilities with absolute
    discount D=0.75: P(w2|w1) = max(c-D,0)/c(w1.) + D*N1+(w1.)/c(w1.) *
    N1+(.w2)/T — the continuation-count smoothing that modern n-gram LM
    toolkits (KenLM) use, built ENTIRELY from four grouped integer count
    tables (pair counts, forward prefix totals + distinct-successor
    counts, distinct-predecessor counts, total bigram types). Reported
    for the top-{k} bigrams by raw count (TakeOrderedAndProject + stats
    joined AFTER the limit, broadcast k-row side); the probability is
    one fixed shared double expression, D being exactly representable.
    The scalar type total joins on a constant key (broadcast hash), not
    a cross join."""
    d = load_table(spark, sf_dir, "documents")
    bigrams = (
        d.select(tokens("text").alias("__t"))
        .select(F.explode(word_bigrams("__t")).alias("b"))
        .select("b.w1", "b.w2")
    )
    pc = bigrams.groupBy("w1", "w2").agg(F.count(F.lit(1)).cast("long").alias("c"))
    fw = pc.groupBy("w1").agg(
        F.sum("c").cast("long").alias("c1"),
        F.count(F.lit(1)).cast("long").alias("n1fw"),
    )
    bw = pc.groupBy("w2").agg(F.count(F.lit(1)).cast("long").alias("n1bw"))
    tp = pc.agg(F.count(F.lit(1)).cast("long").alias("t_pairs")).withColumn(
        "j", F.lit(1)
    )
    top = (
        pc.orderBy(F.col("c").desc(), F.col("w1").asc(), F.col("w2").asc())
        .limit(_KN_TOP_K)
        .withColumn("j", F.lit(1))
    )
    joined = (
        fw.join(F.broadcast(top), "w1")
        .join(bw, "w2")
        .join(F.broadcast(tp), "j")
    )
    return joined.select(
        "w1",
        "w2",
        "c",
        "c1",
        "n1fw",
        "n1bw",
        "t_pairs",
        F.expr(_KN_P_EXPR).alias("p_kn"),
    )
