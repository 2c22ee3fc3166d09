"""Round-4o workloads: growth accounting, classical seasonal
decomposition, and corpus n-gram novelty.

Determinism notes:
  - Growth accounting classifies each (user, week) row against the
    user's own lagged week (user-partitioned windows) — all counts are
    exact integers; week truncation is Monday-start on both engines
    (probed), cast to DATE for canon parity.
  - The decomposition keeps every per-row quantity EXACT-INT by scaling
    by 7 (trend_x7 = the 7-day rolling sum itself, resid_x7 = 7*rev -
    trend_x7); the only doubles are ONE division per (nation, dow)
    seasonal mean and one fixed per-row subtraction — no sum of doubles
    ever happens, so group aggregation order cannot leak into the hash.
  - Novelty attributes each distinct bigram to its MIN(doc_id) first
    occurrence; per-source novelty is a ratio of exact counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sample_data_pipeline_project_spark.sources.catalog import load_table
from sample_data_pipeline_project_spark.workloads import workload

_CENTS_O = "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"

# --------------------------------------------------------------------------
# C205 — growth accounting (new / retained / resurrected / churned per week)
# --------------------------------------------------------------------------

_GA_ORACLE = """
WITH uw AS (
  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk
  FROM events
),
seq AS (
  SELECT user_id, wk,
         MIN(wk) OVER (PARTITION BY user_id) AS first_wk,
         LAG(wk) OVER (PARTITION BY user_id ORDER BY wk) AS prev_wk,
         LEAD(wk) OVER (PARTITION BY user_id ORDER BY wk) AS next_wk
  FROM uw
),
mx AS (SELECT MAX(wk) AS max_wk FROM uw),
active AS (
  SELECT wk,
         CAST(SUM(CASE WHEN wk = first_wk THEN 1 ELSE 0 END) AS BIGINT)
           AS n_new,
         CAST(SUM(CASE WHEN prev_wk = wk - INTERVAL 7 DAY THEN 1 ELSE 0 END)
              AS BIGINT) AS n_retained,
         CAST(SUM(CASE WHEN prev_wk IS NOT NULL
                        AND prev_wk < wk - INTERVAL 7 DAY THEN 1 ELSE 0 END)
              AS BIGINT) AS n_resurrected
  FROM seq GROUP BY wk
),
churn AS (
  SELECT CAST(wk + INTERVAL 7 DAY AS DATE) AS wk,
         CAST(COUNT(*) AS BIGINT) AS n_churned
  FROM seq CROSS JOIN mx
  WHERE (next_wk IS NULL OR next_wk > wk + INTERVAL 7 DAY)
    AND wk + INTERVAL 7 DAY <= mx.max_wk
  GROUP BY wk + INTERVAL 7 DAY
)
SELECT a.wk, a.n_new, a.n_retained, a.n_resurrected,
       COALESCE(c.n_churned, 0) AS n_churned
FROM active a LEFT JOIN churn c ON a.wk = c.wk
"""


@workload("events_growth_accounting", oracle=_GA_ORACLE)
def events_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly GROWTH ACCOUNTING — the new / retained / resurrected /
    churned decomposition of the active-user base (the Social-Capital
    accounting identity: actives(w) = new + retained + resurrected,
    actives(w) - actives(w+1) bridged by churned). Each (user, week)
    row classifies against the user's OWN history via user-partitioned
    windows (first/prev/next week) — millions of tiny partitions at
    scale, no global state; churn for week w+1 is attributed from week
    w's rows (capped at the corpus horizon so no phantom trailing
    week). All counts exact integers; week truncation is Monday-start
    on both engines."""
    e = load_table(spark, sf_dir, "events")
    uw = e.select(
        "user_id", F.date_trunc("week", F.col("ts")).cast("date").alias("wk")
    ).distinct()
    w_all = Window.partitionBy("user_id")
    w_ord = Window.partitionBy("user_id").orderBy("wk")
    seq = uw.select(
        "user_id",
        "wk",
        F.min("wk").over(w_all).alias("first_wk"),
        F.lag("wk").over(w_ord).alias("prev_wk"),
        F.lead("wk").over(w_ord).alias("next_wk"),
    )
    max_wk = uw.agg(F.max("wk")).first()[0]
    active = seq.groupBy("wk").agg(
        F.sum(F.when(F.col("wk") == F.col("first_wk"), 1).otherwise(0))
        .cast("long")
        .alias("n_new"),
        F.sum(
            F.when(F.col("prev_wk") == F.date_sub(F.col("wk"), 7), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_retained"),
        F.sum(
            F.when(
                F.col("prev_wk").isNotNull()
                & (F.col("prev_wk") < F.date_sub(F.col("wk"), 7)),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_resurrected"),
    )
    churn = (
        seq.filter(
            (
                F.col("next_wk").isNull()
                | (F.col("next_wk") > F.date_add(F.col("wk"), 7))
            )
            & (F.date_add(F.col("wk"), 7) <= F.lit(max_wk))
        )
        .groupBy(F.date_add(F.col("wk"), 7).alias("wk"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_churned"))
    )
    return active.join(churn, "wk", "left").select(
        "wk",
        "n_new",
        "n_retained",
        "n_resurrected",
        F.coalesce(F.col("n_churned"), F.lit(0).cast("long")).alias("n_churned"),
    )


# --------------------------------------------------------------------------
# C206 — classical additive decomposition (trend + seasonal + remainder)
# --------------------------------------------------------------------------

_DEC_REM = "CAST(resid_x7 AS DOUBLE) - seasonal_x7"

_DEC_ORACLE = f"""
WITH daily AS (
  SELECT c.c_nationkey AS nationkey,
         CAST(o.o_orderdate AS DATE) AS day,
         CAST(SUM({_CENTS_O}) AS BIGINT) AS rev_cents
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY c.c_nationkey, CAST(o.o_orderdate AS DATE)
),
rolled AS (
  SELECT nationkey, day, rev_cents,
         CAST(COUNT(*) OVER w AS BIGINT) AS roll_n,
         CAST(SUM(rev_cents) OVER w AS BIGINT) AS trend_x7
  FROM daily
  WINDOW w AS (PARTITION BY nationkey ORDER BY day
               ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
),
detrended AS (
  SELECT nationkey, day, rev_cents, trend_x7,
         CAST(7 * rev_cents - trend_x7 AS BIGINT) AS resid_x7,
         date_diff('day', DATE '1970-01-01', day) % 7 AS dow
  FROM rolled WHERE roll_n = 7
),
seasonal AS (
  SELECT nationkey, dow,
         CAST(SUM(resid_x7) AS DOUBLE) / COUNT(*) AS seasonal_x7
  FROM detrended GROUP BY nationkey, dow
)
SELECT d.nationkey, d.day, d.rev_cents, d.trend_x7,
       d.resid_x7, s.seasonal_x7,
       {_DEC_REM} AS remainder_x7
FROM detrended d
JOIN seasonal s ON d.nationkey = s.nationkey AND d.dow = s.dow
"""


@workload("timeseries_classical_decomposition", oracle=_DEC_ORACLE)
def timeseries_classical_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive decomposition of each nation's daily revenue:
    trend (7-day CENTERED rolling mean), weekday seasonal component
    (mean detrended value per nation x day-of-week), and remainder —
    the moving-average decomposition STL refines. Every per-row
    quantity stays EXACT-INT by scaling by 7 (trend_x7 is the rolling
    sum itself; resid_x7 = 7*rev - trend_x7), so the only doubles are
    one seasonal-mean division per (nation, dow) and one fixed per-row
    subtraction — group aggregation order can never leak into the
    hash. Windows partition by nation (many independent series); the
    seasonal join is (nation, dow)-keyed."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    daily = (
        o.join(F.broadcast(c.select("c_custkey", "c_nationkey")),
               o["o_custkey"] == F.col("c_custkey"))
        .groupBy(
            F.col("c_nationkey").alias("nationkey"),
            F.col("o_orderdate").cast("date").alias("day"),
        )
        .agg(F.sum(F.expr(_CENTS_O)).cast("long").alias("rev_cents"))
    )
    w = Window.partitionBy("nationkey").orderBy("day").rowsBetween(-3, 3)
    rolled = daily.select(
        "nationkey",
        "day",
        "rev_cents",
        F.count(F.lit(1)).over(w).cast("long").alias("roll_n"),
        F.sum("rev_cents").over(w).cast("long").alias("trend_x7"),
    )
    detrended = rolled.filter(F.col("roll_n") == 7).select(
        "nationkey",
        "day",
        "rev_cents",
        "trend_x7",
        (7 * F.col("rev_cents") - F.col("trend_x7")).cast("long").alias("resid_x7"),
        F.pmod(
            F.datediff(F.col("day"), F.lit("1970-01-01").cast("date")), F.lit(7)
        ).alias("dow"),
    )
    seasonal = detrended.groupBy("nationkey", "dow").agg(
        (F.sum("resid_x7").cast("double") / F.count(F.lit(1))).alias("seasonal_x7")
    )
    return detrended.join(seasonal, ["nationkey", "dow"]).select(
        "nationkey",
        "day",
        "rev_cents",
        "trend_x7",
        "resid_x7",
        "seasonal_x7",
        F.expr(_DEC_REM).alias("remainder_x7"),
    )


# --------------------------------------------------------------------------
# C207 — corpus n-gram novelty rate by source
# --------------------------------------------------------------------------

_NOV_ORACLE = """
WITH toks AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t
  FROM documents
),
bigrams AS (
  SELECT DISTINCT doc_id,
         unnest(t[1:len(t) - 1]) AS w1, unnest(t[2:len(t)]) AS w2
  FROM toks
),
firsts AS (
  SELECT w1, w2, MIN(doc_id) AS first_doc FROM bigrams GROUP BY w1, w2
),
per_doc AS (
  SELECT b.doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_bigrams,
         CAST(SUM(CASE WHEN f.first_doc = b.doc_id THEN 1 ELSE 0 END)
              AS BIGINT) AS n_novel
  FROM bigrams b JOIN firsts f ON b.w1 = f.w1 AND b.w2 = f.w2
  GROUP BY b.doc_id
)
SELECT d.source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(p.n_bigrams) AS BIGINT) AS n_bigrams,
       CAST(SUM(p.n_novel) AS BIGINT) AS n_novel,
       CAST(SUM(p.n_novel) AS DOUBLE) / CAST(SUM(p.n_bigrams) AS DOUBLE)
         AS novelty_rate
FROM per_doc p JOIN documents d ON p.doc_id = d.doc_id
GROUP BY d.source
"""


@workload("text_novelty_rate", oracle=_NOV_ORACLE)
def text_novelty_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus NOVELTY accounting: every distinct bigram is attributed to
    its first-occurrence document (MIN doc_id over an ingestion-ordered
    corpus), and each source reports what fraction of its documents'
    bigrams were first seen there — the marginal-information curve that
    says when additional scraping stops adding content (the
    diminishing-returns signal behind dedup-aware corpus growth, cf.
    the repeated-ngram and decontamination tiers). Two grouped
    aggregations plus a bigram-keyed join back — all shuffles keyed on
    bigrams or doc ids, exact counts, one final division."""
    from sample_data_pipeline_project_spark.functions.text import (
        tokens,
        word_bigrams,
    )

    d = load_table(spark, sf_dir, "documents")
    bigrams = (
        d.select("doc_id", tokens("text").alias("__t"))
        .select("doc_id", F.explode(word_bigrams("__t")).alias("b"))
        .select("doc_id", "b.w1", "b.w2")
        .distinct()
    )
    firsts = bigrams.groupBy("w1", "w2").agg(F.min("doc_id").alias("first_doc"))
    per_doc = (
        bigrams.join(firsts, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.sum(F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0))
            .cast("long")
            .alias("n_novel"),
        )
    )
    return (
        per_doc.join(d.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_bigrams").cast("long").alias("n_bigrams"),
            F.sum("n_novel").cast("long").alias("n_novel"),
        )
        .select(
            "source",
            "n_docs",
            "n_bigrams",
            "n_novel",
            (
                F.col("n_novel").cast("double") / F.col("n_bigrams").cast("double")
            ).alias("novelty_rate"),
        )
    )
