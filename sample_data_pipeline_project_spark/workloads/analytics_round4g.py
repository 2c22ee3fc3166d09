"""Round-4g workloads: decile lift/gains tables, interarrival-time
percentiles, and the corpus dataset-card report.

Determinism notes:
  - Deciles come from the C4 bucketed-global-rank machinery
    (operators/ranks.py) — a true global order statistic with NO
    single-partition window; the decile index is integer arithmetic on
    the rank, identical under Spark `div` and DuckDB `//` for
    non-negative operands.
  - Cumulative decile statistics use a bounded 10x10 self-join on the
    Spark side (the oracle may use a plain window over its 10-row
    aggregate — single-node by design).
  - Corpus totals are bounded driver scalars (one collect of one row)
    re-entering the plan as literals, so no constant-key BNLJ is needed.
  - Interarrival percentiles reuse the exact PERCENTILE_CONT
    interpolation contract of percentile_cont_exact: h = (n-1)*p with
    the fractional weight bound identically on both engines.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sample_data_pipeline_project_spark.operators.ranks import bucketed_global_rank
from sample_data_pipeline_project_spark.sources.catalog import load_table
from sample_data_pipeline_project_spark.workloads import workload

_CENTS_O = "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"

# --------------------------------------------------------------------------
# C188 — decile lift / gains table for the price -> urgency ranking
# --------------------------------------------------------------------------

_LIFT_EXPRS = {
    "resp_rate": "CAST(pos_d AS DOUBLE) / CAST(n_d AS DOUBLE)",
    "gain": "CAST(cum_pos AS DOUBLE) / CAST(tot_pos AS DOUBLE)",
    "lift": (
        "(CAST(cum_pos AS DOUBLE) / CAST(cum_n AS DOUBLE))"
        " / (CAST(tot_pos AS DOUBLE) / CAST(tot_n AS DOUBLE))"
    ),
}

_LIFT_ORACLE = f"""
WITH ranked AS (
  SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS rel,
         ROW_NUMBER() OVER (ORDER BY {_CENTS_O}, o_orderkey) AS rn,
         COUNT(*) OVER () AS n
  FROM orders
),
tiled AS (
  SELECT rel, CAST((n - rn) * 10 // n AS BIGINT) + 1 AS decile FROM ranked
),
dec AS (
  SELECT decile,
         CAST(COUNT(*) AS BIGINT) AS n_d,
         CAST(SUM(rel) AS BIGINT) AS pos_d
  FROM tiled GROUP BY decile
),
cum AS (
  SELECT decile, n_d, pos_d,
         CAST(SUM(n_d) OVER (ORDER BY decile) AS BIGINT) AS cum_n,
         CAST(SUM(pos_d) OVER (ORDER BY decile) AS BIGINT) AS cum_pos,
         CAST(SUM(n_d) OVER () AS BIGINT) AS tot_n,
         CAST(SUM(pos_d) OVER () AS BIGINT) AS tot_pos
  FROM dec
)
SELECT decile, n_d, pos_d, cum_n, cum_pos,
       {_LIFT_EXPRS["resp_rate"]} AS resp_rate,
       {_LIFT_EXPRS["gain"]} AS gain,
       {_LIFT_EXPRS["lift"]} AS lift
FROM cum
"""


@workload("stats_lift_gains_deciles", oracle=_LIFT_ORACLE)
def stats_lift_gains_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile lift and cumulative-gains table for order price as an
    is-urgent ranker — the campaign-targeting / model-triage report:
    rank all orders by score (descending deciles via the C4 bucketed
    global rank — no single-partition window anywhere), then per decile
    the response rate, cumulative gain (share of all positives captured
    so far) and cumulative lift vs the base rate. Cumulative sums over
    the 10-row decile summary use a bounded 10x10 self-join; corpus
    totals re-enter as driver-scalar literals. Every metric is one fixed
    division of exact int64 counts."""
    o = load_table(spark, sf_dir, "orders")
    pts = o.select(
        F.expr(_CENTS_O).alias("v"),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0).alias("rel"),
        "o_orderkey",
    )
    ranked, n = bucketed_global_rank(pts, "v", ["o_orderkey"])
    tiled = ranked.select(
        "rel",
        (F.expr(f"({n} - rn) * 10 div {n}") + 1).cast("long").alias("decile"),
    )
    dec = tiled.groupBy("decile").agg(
        F.count(F.lit(1)).cast("long").alias("n_d"),
        F.sum("rel").cast("long").alias("pos_d"),
    )
    tot = dec.agg(F.sum("n_d"), F.sum("pos_d")).first()
    tot_n, tot_pos = int(tot[0]), int(tot[1])
    l, r = dec.alias("l"), dec.alias("r")
    cum = (
        # broadcast the 10-row side explicitly: without the hint Spark
        # plans this non-equi join as CartesianProduct, the unbounded
        # operator class the registry invariant bans outright; the
        # broadcast form is the documented bounded-BNLJ shape
        l.join(F.broadcast(r), F.col("r.decile") <= F.col("l.decile"))
        .groupBy(F.col("l.decile"), F.col("l.n_d"), F.col("l.pos_d"))
        .agg(
            F.sum(F.col("r.n_d")).cast("long").alias("cum_n"),
            F.sum(F.col("r.pos_d")).cast("long").alias("cum_pos"),
        )
        .select(
            F.col("l.decile").alias("decile"),
            F.col("l.n_d").alias("n_d"),
            F.col("l.pos_d").alias("pos_d"),
            "cum_n",
            "cum_pos",
            F.lit(tot_n).cast("long").alias("tot_n"),
            F.lit(tot_pos).cast("long").alias("tot_pos"),
        )
    )
    return cum.select(
        "decile",
        "n_d",
        "pos_d",
        "cum_n",
        "cum_pos",
        F.expr(_LIFT_EXPRS["resp_rate"]).alias("resp_rate"),
        F.expr(_LIFT_EXPRS["gain"]).alias("gain"),
        F.expr(_LIFT_EXPRS["lift"]).alias("lift"),
    )


# --------------------------------------------------------------------------
# C189 — exact interarrival-time percentiles (watermark sizing companion)
# --------------------------------------------------------------------------

_IA_PS = ("0.5", "0.9", "0.99")  # repr strings: literal-parse portable

_IA_ORACLE = f"""
WITH seq AS (
  SELECT epoch_us(ts)
         - LAG(epoch_us(ts)) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS gap_us,
         user_id, event_id
  FROM events
),
gaps AS (
  SELECT gap_us, user_id, event_id FROM seq WHERE gap_us IS NOT NULL
),
ranked AS (
  SELECT gap_us AS v,
         ROW_NUMBER() OVER (ORDER BY gap_us, user_id, event_id) AS rn
  FROM gaps
),
nn AS (SELECT COUNT(*) AS n FROM gaps),
ps AS (
  SELECT p, CAST(nn.n - 1 AS DOUBLE) * p AS h, nn.n AS n
  FROM (VALUES {", ".join(f"(CAST('{p}' AS DOUBLE))" for p in _IA_PS)})
       AS t(p) CROSS JOIN nn
),
t AS (
  SELECT p, n, h,
         CAST(FLOOR(h) AS BIGINT) + 1 AS lo_rn,
         CAST(FLOOR(h) AS BIGINT) + 1
           + (CASE WHEN h = FLOOR(h) THEN 0 ELSE 1 END) AS hi_rn,
         h - FLOOR(h) AS frac
  FROM ps
)
SELECT t.p, CAST(t.n AS BIGINT) AS n,
       CAST(lo.v AS DOUBLE)
       + (CAST(hi.v AS DOUBLE) - CAST(lo.v AS DOUBLE)) * t.frac
         AS gap_us_pcont
FROM t
JOIN ranked lo ON lo.rn = t.lo_rn
JOIN ranked hi ON hi.rn = t.hi_rn
"""


@workload("events_interarrival_percentiles", oracle=_IA_ORACLE)
def events_interarrival_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact p50/p90/p99 of per-user event interarrival times (in
    microseconds) — with events_late_arrival_audit, the pair of numbers
    that sizes streaming watermark delays and session-gap thresholds
    before deploying the streaming twins. Interarrival gaps are a
    user-partitioned LAG (millions of small window partitions); the
    global order statistics ride the C4 bucketed global rank, and the
    PERCENTILE_CONT interpolation follows the percentile_cont_exact
    contract (h = (n-1)*p, frac bound identically on both engines)."""
    e = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    gaps = (
        e.select("user_id", "event_id", us.alias("us"))
        .withColumn("gap_us", F.col("us") - F.lag("us").over(w))
        .filter(F.col("gap_us").isNotNull())
        .select("gap_us", "user_id", "event_id")
    )
    ranked, n = bucketed_global_rank(gaps, "gap_us", ["user_id", "event_id"])
    rows = []
    for p_str in _IA_PS:
        p = float(p_str)
        h = float(n - 1) * p
        lo_rn = int(math.floor(h)) + 1
        hi_rn = lo_rn + (0 if h == math.floor(h) else 1)
        rows.append((p, n, lo_rn, hi_rn, h - math.floor(h)))
    targets = spark.createDataFrame(
        rows, "p double, n long, lo_rn long, hi_rn long, frac double"
    )
    lo = ranked.select(F.col("rn").alias("lo_rn"), F.col("gap_us").alias("lo_v"))
    hi = ranked.select(F.col("rn").alias("hi_rn"), F.col("gap_us").alias("hi_v"))
    return (
        F.broadcast(targets)
        .join(lo, "lo_rn")
        .join(hi, "hi_rn")
        .select(
            "p",
            F.col("n").cast("long").alias("n"),
            (
                F.col("lo_v").cast("double")
                + (F.col("hi_v").cast("double") - F.col("lo_v").cast("double"))
                * F.col("frac")
            ).alias("gap_us_pcont"),
        )
    )


# --------------------------------------------------------------------------
# C190 — dataset card: per-(source, lang) corpus composition report
# --------------------------------------------------------------------------

_NT_SQL = "len(string_split_regex(lower(trim(text)), '\\s+'))"

_CARD_EXPRS = {
    "mean_chars": "CAST(total_chars AS DOUBLE) / CAST(n_docs AS DOUBLE)",
    "share_docs": "CAST(n_docs AS DOUBLE) / CAST(tot_docs AS DOUBLE)",
    "share_tokens": "CAST(total_tokens AS DOUBLE) / CAST(tot_tokens AS DOUBLE)",
}

_CARD_ORACLE = f"""
WITH per AS (
  SELECT source, lang,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(n_chars) AS BIGINT) AS total_chars,
         CAST(SUM({_NT_SQL}) AS BIGINT) AS total_tokens
  FROM documents GROUP BY source, lang
),
tot AS (
  SELECT CAST(SUM(n_docs) AS BIGINT) AS tot_docs,
         CAST(SUM(total_tokens) AS BIGINT) AS tot_tokens
  FROM per
)
SELECT source, lang, n_docs, total_chars, total_tokens,
       {_CARD_EXPRS["mean_chars"]} AS mean_chars,
       {_CARD_EXPRS["share_docs"]} AS share_docs,
       {_CARD_EXPRS["share_tokens"]} AS share_tokens
FROM per CROSS JOIN tot
"""


@workload("train_dataset_card", oracle=_CARD_ORACLE)
def train_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dataset card's composition table: per (source, language)
    document and exact token counts plus each cell's share of the
    corpus — the first table every training-data release publishes
    (C4/Pile/RefinedWeb-style reporting). One grouped aggregation over
    the corpus; the two corpus totals are bounded driver scalars that
    re-enter as literals (no BNLJ, no global window). Token counts are
    the engine's standard whitespace tokenization, stated identically
    in SQL."""
    from sample_data_pipeline_project_spark.functions.text import token_count

    d = load_table(spark, sf_dir, "documents")
    per = d.groupBy("source", "lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.sum(token_count("text")).cast("long").alias("total_tokens"),
    )
    tot = per.agg(F.sum("n_docs"), F.sum("total_tokens")).first()
    tot_docs, tot_tokens = int(tot[0]), int(tot[1])
    enriched = per.select(
        "source",
        "lang",
        "n_docs",
        "total_chars",
        "total_tokens",
        F.lit(tot_docs).cast("long").alias("tot_docs"),
        F.lit(tot_tokens).cast("long").alias("tot_tokens"),
    )
    return enriched.select(
        "source",
        "lang",
        "n_docs",
        "total_chars",
        "total_tokens",
        F.expr(_CARD_EXPRS["mean_chars"]).alias("mean_chars"),
        F.expr(_CARD_EXPRS["share_docs"]).alias("share_docs"),
        F.expr(_CARD_EXPRS["share_tokens"]).alias("share_tokens"),
    )
