"""Analytics workloads, round 2: time-series gap-fill + interpolation,
TF-IDF term ranking, event transition matrix, certified approximate
quantiles, and incremental (delta) aggregate maintenance.

Determinism notes follow the registry contract (workloads/__init__.py):
decimal sums for anything summed, identical arithmetic EXPRESSION SHAPE
on both engines wherever doubles are computed (IEEE ops in the same
order produce identical bits), and float-adjacent orderings rounded
before ranking so tiebreaks fire identically in Spark and DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sample_data_pipeline_project_spark.sources.catalog import load_table
from sample_data_pipeline_project_spark.workloads import workload

# --------------------------------------------------------------------------
# Time-series gap-fill + linear interpolation
# --------------------------------------------------------------------------
# The interpolation formula is written with the SAME operation order on
# both engines: prev + (next - prev) * (gap_pos / gap_len). All four
# operands are exact (decimal sums cast to double; integer day offsets
# cast to double), so the IEEE double results are bit-identical.
_INTERP_ORACLE = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         COUNT(*) AS n, SUM(CAST(value AS DECIMAL(18,6))) AS s
  FROM events GROUP BY 1, 2
),
bounds AS (SELECT event_type, MIN(day) AS mn, MAX(day) AS mx FROM daily GROUP BY 1),
spine AS (
  SELECT b.event_type,
         CAST(unnest(generate_series(CAST(b.mn AS TIMESTAMP),
                                     CAST(b.mx AS TIMESTAMP),
                                     INTERVAL 1 DAY)) AS DATE) AS day
  FROM bounds b
),
j AS (
  SELECT s.event_type, s.day, d.n, d.s,
         (SELECT MAX(p.day) FROM daily p
          WHERE p.event_type = s.event_type AND p.day < s.day AND p.s IS NOT NULL) AS pd,
         (SELECT MIN(q.day) FROM daily q
          WHERE q.event_type = s.event_type AND q.day > s.day AND q.s IS NOT NULL) AS nd
  FROM spine s LEFT JOIN daily d USING (event_type, day)
)
SELECT j.event_type, j.day,
       CAST(COALESCE(j.n, 0) AS BIGINT) AS n_events,
       CASE
         WHEN j.s IS NOT NULL THEN CAST(j.s AS DOUBLE)
         WHEN j.pd IS NOT NULL AND j.nd IS NOT NULL THEN
           CAST(pv.s AS DOUBLE)
           + (CAST(nv.s AS DOUBLE) - CAST(pv.s AS DOUBLE))
             * (CAST(j.day - j.pd AS DOUBLE) / CAST(j.nd - j.pd AS DOUBLE))
         ELSE NULL
       END AS value_filled,
       (j.s IS NULL AND j.pd IS NOT NULL AND j.nd IS NOT NULL) AS is_interpolated
FROM j
LEFT JOIN daily pv ON pv.event_type = j.event_type AND pv.day = j.pd
LEFT JOIN daily nv ON nv.event_type = j.event_type AND nv.day = j.nd
"""


@workload("timeseries_gapfill_interpolate", oracle=_INTERP_ORACLE)
def timeseries_gapfill_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled daily series per event type with LINEAR INTERPOLATION of
    the daily value sum across missing interior days (edges stay NULL).
    Spine via sequence()+explode per group — no driver loop; neighbor
    lookup via last/first IGNORE NULLS windows — two sorts within the
    already-shuffled group partition, not the correlated-subquery rescans
    the oracle spells out. At 100 TB the spine join is partitioned by the
    same group key as the aggregate, so gap-fill adds no extra exchange."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,6)")).alias("s"),
    )
    bounds = daily.groupBy("event_type").agg(
        F.min("day").alias("mn"), F.max("day").alias("mx")
    )
    spine = bounds.select(
        "event_type", F.explode(F.sequence("mn", "mx")).alias("day")
    )
    j = spine.join(daily, ["event_type", "day"], "left")
    w_prev = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_next = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    present_day = F.when(F.col("s").isNotNull(), F.col("day"))
    withnb = (
        j.withColumn("pd", F.last(present_day, ignorenulls=True).over(w_prev))
        .withColumn("pv", F.last(F.col("s"), ignorenulls=True).over(w_prev))
        .withColumn("nd", F.first(present_day, ignorenulls=True).over(w_next))
        .withColumn("nv", F.first(F.col("s"), ignorenulls=True).over(w_next))
    )
    interp = (
        F.col("pv").cast("double")
        + (F.col("nv").cast("double") - F.col("pv").cast("double"))
        * (
            F.datediff(F.col("day"), F.col("pd")).cast("double")
            / F.datediff(F.col("nd"), F.col("pd")).cast("double")
        )
    )
    has_both = F.col("pd").isNotNull() & F.col("nd").isNotNull()
    return withnb.select(
        "event_type",
        "day",
        F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_events"),
        F.when(F.col("s").isNotNull(), F.col("s").cast("double"))
        .when(has_both, interp)
        .alias("value_filled"),
        (F.col("s").isNull() & has_both).alias("is_interpolated"),
    )


# --------------------------------------------------------------------------
# TF-IDF top terms per document
# --------------------------------------------------------------------------
_TFIDF_K = 3

_TFIDF_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS term
  FROM documents
),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term),
df AS (SELECT term, COUNT(*) AS doc_freq FROM tf GROUP BY term),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, df.doc_freq,
         ROW_NUMBER() OVER (
           PARTITION BY tf.doc_id
           ORDER BY ROUND(tf.tf * LN(CAST(n.n_docs AS DOUBLE)
                                     / CAST(df.doc_freq AS DOUBLE)), 9) DESC,
                    tf.term ASC
         ) AS rnk
  FROM tf JOIN df USING (term) CROSS JOIN n
)
SELECT doc_id, term, tf, doc_freq, rnk
FROM scored WHERE rnk <= {_TFIDF_K}
"""


@workload("text_tfidf_top_terms", oracle=_TFIDF_ORACLE)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B4 — top-{k} TF-IDF terms per document. Term frequencies keep
    duplicates (unlike the distinct-token near-dup operators); document
    frequency comes from the tf table (one aggregate, no second tokenize
    pass); idf joins via broadcast (vocabulary << corpus). The float
    tf*ln(N/df) score exists ONLY inside the ranking and is rounded to 9
    decimals first, so mathematically-equal scores computed by different
    ln() libraries rank identically and the term tiebreak fires the same
    way on both engines; the hashed output is all-integer."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("term"),
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("doc_freq"))
    n_docs = d.count()
    score = F.round(
        F.col("tf")
        * F.log(F.lit(float(n_docs)) / F.col("doc_freq").cast("double")),
        9,
    )
    w = Window.partitionBy("doc_id").orderBy(score.desc(), F.col("term").asc())
    return (
        tf.join(F.broadcast(df), "term")
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _TFIDF_K)
        .select("doc_id", "term", "tf", "doc_freq", "rnk")
    )


# --------------------------------------------------------------------------
# Event-type transition matrix (Markov counts)
# --------------------------------------------------------------------------
_TRANSITION_ORACLE = """
WITH seq AS (
  SELECT user_id, event_type,
         LEAD(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS next_type
  FROM events
)
SELECT event_type AS prev_type, next_type,
       CAST(COUNT(*) AS BIGINT) AS n_transitions
FROM seq WHERE next_type IS NOT NULL
GROUP BY prev_type, next_type
"""


@workload("events_transition_matrix", oracle=_TRANSITION_ORACLE)
def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov transition counts between consecutive events of each user
    (ties broken by event_id — deterministic sequencing): one window sort
    partitioned by user + one hash aggregate over the (tiny)
    type-pair domain. The per-user window is the same shuffle shape as
    sessionization; no self-join formulation (which would be quadratic in
    per-user event count)."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        F.col("event_type").alias("prev_type"),
        F.lead("event_type").over(w).alias("next_type"),
    )
    return (
        seq.filter(F.col("next_type").isNotNull())
        .groupBy("prev_type", "next_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n_transitions"))
    )


# --------------------------------------------------------------------------
# Certified approximate quantiles (mergeable sketch vs exact)
# --------------------------------------------------------------------------
_QUANTILE_PS = (0.5, 0.9, 0.99)
_QUANTILE_TOL = 0.02  # relative; measured approx error is ~1e-4 at sf0.1

_QUANTILE_ORACLE = f"""
WITH ranked AS (
  SELECT o_totalprice,
         ROW_NUMBER() OVER (ORDER BY o_totalprice, o_orderkey) AS rn,
         COUNT(*) OVER () AS n
  FROM orders
)
SELECT CAST(p AS DOUBLE) AS p,
       (SELECT CAST(CAST(r.o_totalprice AS DECIMAL(18,2)) AS DOUBLE)
        FROM ranked r
        WHERE r.rn = CAST(CEIL(CAST(p AS DOUBLE) * r.n) AS BIGINT)) AS exact_q,
       TRUE AS approx_ok
FROM (VALUES {", ".join(f"({p})" for p in _QUANTILE_PS)}) AS ps(p)
"""


_QUANTILE_BUCKETS = 64


@workload("sketch_approx_quantiles", oracle=_QUANTILE_ORACLE)
def sketch_approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch tier — approximate quantiles of the order price
    (percentile_approx: a mergeable rank sketch, O(accuracy) state — the
    form that survives a 100 TB groupBy or an unbounded stream) certified
    against the EXACT discrete quantile (the value at row ceil(p*n) of
    the sorted order — the oracle states the same definition). The exact
    order statistic is computed DISTRIBUTED: rows are bucketed by value
    range (deterministic arithmetic on the collected min/max — no
    sampling, so the bucket of a row is stable across jobs), the global
    rank is the bucket-local row_number plus the summed counts of lower
    buckets (a bucket-count collect bounded by the constant bucket
    count), and only the rows at the target ranks survive. No global
    window, no single-partition sort — skewed buckets cost only balance,
    never correctness. The estimate itself is implementation-defined, so
    the hashed projection carries the exact quantile plus a
    relative-error-bound boolean, as with the HLL workloads."""
    import math

    from sample_data_pipeline_project_spark.operators.ranks import (
        bucketed_global_rank,
    )

    o = load_table(spark, sf_dir, "orders")
    ps = list(_QUANTILE_PS)
    ranked, n = bucketed_global_rank(
        o.select("o_totalprice", "o_orderkey"),
        "o_totalprice",
        ["o_orderkey"],
        n_buckets=_QUANTILE_BUCKETS,
    )
    targets = spark.createDataFrame(
        [(p, int(math.ceil(p * n))) for p in ps], "p double, target_rn long"
    )
    exact = (
        ranked.join(F.broadcast(targets), F.col("rn") == F.col("target_rn"))
        .select(
            "p",
            F.col("o_totalprice")
            .cast("decimal(18,2)")
            .cast("double")
            .alias("exact_q"),
        )
    )
    approx = o.agg(
        F.percentile_approx("o_totalprice", ps, 10000).alias("qs")
    ).select(
        F.explode(
            F.arrays_zip(
                F.array(*[F.lit(p) for p in ps]).alias("p"),
                F.col("qs").alias("approx_q"),
            )
        ).alias("z")
    ).select("z.p", "z.approx_q")
    return (
        exact.join(approx, "p")
        .select(
            "p",
            "exact_q",
            (
                F.abs(F.col("approx_q") - F.col("exact_q"))
                <= _QUANTILE_TOL * F.col("exact_q")
            ).alias("approx_ok"),
        )
    )


# --------------------------------------------------------------------------
# Fixed-iteration PageRank over the near-dup graph
# --------------------------------------------------------------------------
_PR_ITERS = 3
_PR_DAMPING = 0.85
_PR_NGRAM_THRESHOLD = 0.8  # same edge set as dedup_connected_components
_PR_TOP_K = 50  # hub ranking emits only the top-k (scale-bounded output)

# DuckDB twin of the bigram near-dup pair pipeline — the shingle fragment
# is IMPORTED from dedup_queries so the two oracles cannot drift — then 3
# unrolled power iterations. Arithmetic is written with the SAME
# expression shape as the Spark operator — including (1 - 0.85) instead
# of 0.15, because 1.0-0.85 and the literal 0.15 are DIFFERENT doubles —
# and the consumers rank on ROUND(r,9) so sum-order ulps cannot flip the
# ordering.
from sample_data_pipeline_project_spark.workloads.dedup_queries import (  # noqa: E402
    _DUCK_BIGRAMS as _DUCK_PR_BIGRAMS,
)


def _pr_iteration(prev: str, cur: str) -> str:
    return f"""
{cur}_mass AS (
  SELECT e.dst, SUM(p.r / deg.outdeg) AS m
  FROM edges e JOIN {prev} p ON e.src = p.doc_id
  JOIN deg ON deg.src = e.src
  GROUP BY e.dst
),
{cur} AS (
  SELECT d.doc_id,
         ((CAST(1 AS DOUBLE) - {_PR_DAMPING}) / n.cnt)
         + {_PR_DAMPING} * COALESCE(m.m, CAST(0 AS DOUBLE)) AS r
  FROM documents d CROSS JOIN n LEFT JOIN {cur}_mass m ON m.dst = d.doc_id
)"""


def _pagerank_oracle() -> str:
    iters = ",".join(
        _pr_iteration(f"r{i}", f"r{i + 1}") for i in range(_PR_ITERS)
    )
    return f"""
WITH base AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS toks
  FROM documents
),
toks AS (SELECT doc_id, unnest({_DUCK_PR_BIGRAMS}) AS tok FROM base),
sizes AS (SELECT doc_id, COUNT(*) AS n_tok FROM toks GROUP BY doc_id),
shared AS (
  SELECT a.doc_id AS a, b.doc_id AS b, COUNT(*) AS shared
  FROM toks a JOIN toks b ON a.tok = b.tok AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
pairs AS (
  SELECT s.a, s.b FROM shared s
  JOIN sizes sa ON s.a = sa.doc_id
  JOIN sizes sb ON s.b = sb.doc_id
  WHERE CAST(s.shared AS DOUBLE) / (sa.n_tok + sb.n_tok - s.shared)
        >= {_PR_NGRAM_THRESHOLD}
),
edges AS (SELECT a AS src, b AS dst FROM pairs
          UNION ALL SELECT b AS src, a AS dst FROM pairs),
deg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src),
n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS cnt FROM documents),
r0 AS (SELECT doc_id, CAST(1 AS DOUBLE) / n.cnt AS r FROM documents CROSS JOIN n),
{iters},
ranked_all AS (
  SELECT doc_id,
         CAST(COALESCE(deg.outdeg, 0) AS BIGINT) AS outdeg,
         CAST(ROW_NUMBER() OVER (
           ORDER BY ROUND(r{_PR_ITERS}.r, 9) DESC, doc_id ASC
         ) AS BIGINT) AS rank_pos
  FROM r{_PR_ITERS} LEFT JOIN deg ON deg.src = r{_PR_ITERS}.doc_id
)
SELECT doc_id, outdeg, rank_pos FROM ranked_all WHERE rank_pos <= {_PR_TOP_K}
"""


@workload("graph_pagerank_neardup", oracle=_pagerank_oracle())
def graph_pagerank_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative graph analytics beyond label propagation: 3-round
    PageRank (operators/pagerank.py) over the symmetrized bigram-Jaccard
    near-dup graph — the 'which duplicate cluster hubs matter' view of
    the dedup relation. Per round: one edge join + one aggregate, edge-
    list-sized, lineage truncated (same scaling argument as connected
    components). The hashed projection emits only the TOP-{k} hub
    ranking: TakeOrderedAndProject on (ROUND(r,9) desc, doc_id) — each
    partition keeps a local top-k, the driver merges, no global window,
    output driver-bounded — then ranks the k survivors with a k x k
    bounded self-join (rnk = 1 + |rows strictly ahead|). Only integers
    are hashed and the ordering key rounds to 9 decimals, so double
    sum-order ulps between engines cannot flip the hash; the oracle
    unrolls the identical iterations in SQL."""
    from sample_data_pipeline_project_spark.operators.dedup import (
        jaccard_pairs_prefix,
    )
    from sample_data_pipeline_project_spark.operators.pagerank import pagerank_fixed

    d = load_table(spark, sf_dir, "documents")
    pairs = jaccard_pairs_prefix(d, _PR_NGRAM_THRESHOLD, ngram_n=2).select("a", "b")
    sym = pairs.select(
        F.col("a").alias("src"), F.col("b").alias("dst")
    ).unionByName(pairs.select(F.col("b").alias("src"), F.col("a").alias("dst")))
    pr = pagerank_fixed(
        sym,
        d.select("doc_id"),
        id_col="doc_id",
        iters=_PR_ITERS,
        damping=_PR_DAMPING,
    )
    top = (
        pr.select("doc_id", "outdeg", F.round(F.col("r"), 9).alias("r9"))
        .orderBy(F.col("r9").desc(), F.col("doc_id").asc())
        .limit(_PR_TOP_K)
    )
    lhs, rhs = top.alias("l"), top.alias("r")
    ahead = (F.col("r.r9") > F.col("l.r9")) | (
        (F.col("r.r9") == F.col("l.r9")) & (F.col("r.doc_id") < F.col("l.doc_id"))
    )
    return (
        lhs.join(rhs, ahead, "left")
        .groupBy(F.col("l.doc_id"), F.col("l.outdeg"))
        .agg((F.count(F.col("r.doc_id")) + 1).cast("long").alias("rank_pos"))
        .select(
            F.col("l.doc_id").alias("doc_id"),
            F.col("l.outdeg").alias("outdeg"),
            "rank_pos",
        )
    )


# --------------------------------------------------------------------------
# Deterministic per-group sample (hash-ordered, no RNG state)
# --------------------------------------------------------------------------
_SAMPLE_K = 5

_GROUP_SAMPLE_ORACLE = f"""
WITH h AS (
  SELECT event_type, event_id, md5(CAST(event_id AS VARCHAR)) AS hkey
  FROM events
),
ranked AS (
  SELECT event_type, event_id, hkey,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY hkey, event_id) AS rn
  FROM h
)
SELECT event_type, event_id, hkey, CAST(rn AS BIGINT) AS rn
FROM ranked WHERE rn <= {_SAMPLE_K}
"""


@workload("sample_group_hash_topk", oracle=_GROUP_SAMPLE_ORACLE)
def sample_group_hash_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group uniform sample WITHOUT RNG state: keep the k rows with
    the smallest md5(event_id) per event type — the distributed
    reservoir-sample replacement (md5 order is uniform over ids,
    reproducible across engines/runs/retries, and mergeable: the top-k of
    a union is the top-k of per-partition top-ks). One window per group;
    at scale Spark pushes the rank filter into per-partition top-k heaps
    before the shuffle."""
    e = load_table(spark, sf_dir, "events")
    h = e.select(
        "event_type",
        "event_id",
        F.md5(F.col("event_id").cast("string")).alias("hkey"),
    )
    w = Window.partitionBy("event_type").orderBy("hkey", "event_id")
    return (
        h.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= _SAMPLE_K)
    )


# --------------------------------------------------------------------------
# Bloom-filter pruned join (runtime-filter pattern, explicit)
# --------------------------------------------------------------------------
_BLOOM_REV_DEC_SQL = (
    "CAST(CAST(l_extendedprice AS DECIMAL(18,2))"
    " * (1 - CAST(l_discount AS DECIMAL(4,2))) AS DECIMAL(18,4))"
)

_BLOOM_ORACLE = f"""
SELECT o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM({_BLOOM_REV_DEC_SQL}) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 150000
GROUP BY o_orderstatus
"""


@workload("join_bloom_pruned_revenue", oracle=_BLOOM_ORACLE)
def join_bloom_pruned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-side Bloom pruning (operators/bloomjoin.py): the selective
    order filter (urgent + expensive) builds an m=2^17-bit Bloom bitset
    that drops non-matching lineitem rows BEFORE the join shuffle — the
    explicit form of the engine's runtime bloom filter. False positives
    are removed by the exact join, so the result (and its hash) is
    identical to the plain-join oracle; a plan test asserts the pruning
    predicate sits on the probe scan."""
    from sample_data_pipeline_project_spark.operators.bloomjoin import (
        bloom_pruned_join,
    )

    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderpriority") == "1-URGENT") & (F.col("o_totalprice") > 150000)
    )
    joined = bloom_pruned_join(
        l, o, probe_key="l_orderkey", build_key="o_orderkey", m_bits=1 << 17
    )
    rev = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1) - F.col("l_discount").cast("decimal(4,2)"))
    ).cast("decimal(18,4)")
    return joined.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(rev).cast("double").alias("revenue"),
    )


# --------------------------------------------------------------------------
# Incremental aggregate maintenance (snapshot + delta merge)
# --------------------------------------------------------------------------
_INCR_CUTOFF = "2024-06-01"

_INCR_ORACLE = """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
FROM events
GROUP BY event_type
"""


@workload("incremental_agg_maintenance", oracle=_INCR_ORACLE)
def incremental_agg_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance with MERGEABLE partial aggregates: the
    standing state (events strictly before the cutoff day) and the new
    delta (on/after) are aggregated independently, then merged by
    re-aggregating the partials (operators/incremental.py) — the
    snapshot+delta update a 100 TB pipeline runs nightly instead of a
    full recompute. COUNT merges as SUM of counts; SUM as SUM of decimal
    partial sums (exact, order-independent). The oracle is the full
    recompute the merge must equal."""
    from sample_data_pipeline_project_spark.operators.incremental import (
        merge_partial_aggs,
    )

    e = load_table(spark, sf_dir, "events")
    cutoff = F.lit(_INCR_CUTOFF).cast("date")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("total_value_dec"),
        )

    state = partial(e.filter(F.to_date("ts") < cutoff))
    delta = partial(e.filter(F.to_date("ts") >= cutoff))
    merged = merge_partial_aggs(
        state,
        delta,
        key_cols=["event_type"],
        sum_cols=["n_events", "total_value_dec"],
    )
    return merged.select(
        "event_type",
        F.col("n_events").cast("long"),
        F.col("total_value_dec").cast("double").alias("total_value"),
    )


# --------------------------------------------------------------------------
# Rolling exact median (order statistic over a sliding window frame)
# --------------------------------------------------------------------------
_ROLLMED_ORACLE = """
WITH daily AS (
  SELECT o_orderpriority, CAST(o_orderdate AS DATE) AS day,
         CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS cents
  FROM orders GROUP BY 1, 2
),
w AS (
  SELECT o_orderpriority, day, cents,
         list_sort(list(cents) OVER (
           PARTITION BY o_orderpriority ORDER BY day
           ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) AS win,
         COUNT(*) OVER (
           PARTITION BY o_orderpriority ORDER BY day
           ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS n
  FROM daily
)
SELECT o_orderpriority, day, cents,
       win[CAST(FLOOR((n + 1) / 2.0) AS INTEGER)] AS rolling_median_cents
FROM w
"""


@workload("window_rolling_median", oracle=_ROLLMED_ORACLE)
def window_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact rolling MEDIAN (lower order statistic) of daily revenue over
    a 7-row trailing frame per priority — the order-statistic window no
    engine ships as a fast primitive, composed portably: list-collect the
    frame, sort, index at (n+1)/2. Values are integer cents, so both
    engines index identical arrays. Frame size is bounded (7), so the
    per-row cost is O(7 log 7) and the window shuffle is the only
    exchange; an unbounded-frame median would need the sketch path
    (sketch_approx_quantiles) instead."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(
        "o_orderpriority", F.to_date("o_orderdate").alias("day")
    ).agg(
        F.sum(
            (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint")
        )
        .cast("bigint")
        .alias("cents")
    )
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy("day")
        .rowsBetween(-6, Window.currentRow)
    )
    win = F.sort_array(F.collect_list("cents").over(w))
    n = F.count(F.lit(1)).over(w)
    return daily.select(
        "o_orderpriority",
        "day",
        "cents",
        F.element_at(
            win, F.floor((n + F.lit(1)) / F.lit(2)).cast("int")
        ).alias("rolling_median_cents"),
    )
