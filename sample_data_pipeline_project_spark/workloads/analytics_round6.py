"""Round-6 workloads: pivot/unpivot surface, LOCF gap fill, time-bound
funnel conversion, exact weighted median.

Determinism notes:
  - Pivot columns are a FIXED literal list (the five event types), never
    inferred — inference would add a full extra pass over the data AND
    make the output schema data-dependent, which the driver gate (stable
    schema) and any production sink both reject.
  - LOCF rides last_value(... IGNORE NULLS) over the per-key calendar
    spine; revenue is exact BIGINT cents so carried values hash
    identically on both engines.
  - The funnel counts are exact integers; the two conversion ratios are
    single divisions of exact counts (ROUND 6) — no double aggregation.
  - Weighted median merges equal values BEFORE the cumulative scan and
    uses the 2*cum >= total integer criterion — no halving, no doubles,
    fully order-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sample_data_pipeline_project_spark.sources.catalog import load_table
from sample_data_pipeline_project_spark.workloads import workload

_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]

_CENTS_O = "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
_CENTS_L = "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"

# --------------------------------------------------------------------------
# C208 — PIVOT: long event stream -> fixed wide per-user activity matrix
# --------------------------------------------------------------------------
_PIVOT_ORACLE = f"""
SELECT user_id,
       {', '.join(
           f"CAST(COUNT(*) FILTER (WHERE event_type = '{t}') AS BIGINT)"
           f" AS n_{t}" for t in _EVENT_TYPES)},
       CAST(COUNT(*) AS BIGINT) AS n_total
FROM events
GROUP BY user_id
"""


@workload("events_pivot_type_matrix", oracle=_PIVOT_ORACLE)
def events_pivot_type_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT surface: the long (user, event_type) stream pivoted to the
    fixed wide per-user activity matrix — the feature-store "wide
    activity row" shape. The pivot VALUES are an explicit literal list:
    `.pivot(col, values)` with values supplied compiles to one
    conditional-aggregation pass (exactly the oracle's COUNT(*) FILTER
    form, one shuffle on user_id); omitting the list would trigger a
    whole extra distinct-scan job AND a data-dependent schema. Absent
    cells fill 0, so the matrix is dense and schema-stable at any
    scale."""
    ev = load_table(spark, sf_dir, "events")
    wide = (
        ev.groupBy("user_id")
        .pivot("event_type", _EVENT_TYPES)
        .agg(F.count(F.lit(1)))
    )
    cols = [
        F.coalesce(F.col(t), F.lit(0)).cast("long").alias(f"n_{t}")
        for t in _EVENT_TYPES
    ]
    # n_total is a pre-pivot COUNT(*) joined back in, NOT the sum of the
    # pivoted cells: an event_type outside the literal pivot list would
    # silently vanish from a cell-sum but must still count toward the
    # user's total (matching the oracle's unconditional COUNT(*)). Both
    # sides are user-grained aggregates sharing the user_id shuffle key.
    totals = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_total")
    )
    return wide.join(totals, "user_id").select("user_id", *cols, "n_total")


# --------------------------------------------------------------------------
# C209 — UNPIVOT: the wide matrix back to dense long form (stack)
# --------------------------------------------------------------------------
_UNPIVOT_ORACLE = f"""
WITH u AS (SELECT DISTINCT user_id FROM events),
t(event_type) AS (VALUES {', '.join(f"('{t}')" for t in _EVENT_TYPES)}),
c AS (
  SELECT user_id, event_type, COUNT(*) AS n
  FROM events GROUP BY user_id, event_type
)
SELECT u.user_id, t.event_type, CAST(COALESCE(c.n, 0) AS BIGINT) AS n
FROM u CROSS JOIN t
LEFT JOIN c ON c.user_id = u.user_id AND c.event_type = t.event_type
"""


@workload("events_unpivot_roundtrip", oracle=_UNPIVOT_ORACLE)
def events_unpivot_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT surface: melt the C208 wide matrix back to DENSE long form
    (every user x every type, zeros included — the shape model-training
    feature extraction wants) via the `stack()` table generator. Pivot
    then unpivot is the lossless-roundtrip certification of both
    directions; the densification (explicit zeros for absent cells) is
    what distinguishes this from the raw GROUP BY long form."""
    wide = events_pivot_type_matrix(spark, sf_dir)
    stack_expr = "stack({n}, {pairs}) AS (event_type, n)".format(
        n=len(_EVENT_TYPES),
        pairs=", ".join(f"'{t}', n_{t}" for t in _EVENT_TYPES),
    )
    return wide.select("user_id", F.expr(stack_expr)).select(
        "user_id", "event_type", F.col("n").cast("long").alias("n")
    )


# --------------------------------------------------------------------------
# C210 — LOCF (last observation carried forward) over a calendar spine
# --------------------------------------------------------------------------
_LOCF_ORACLE = f"""
WITH RECURSIVE daily AS (
  SELECT c.c_nationkey AS nationkey,
         CAST(o.o_orderdate AS DATE) AS day,
         CAST(SUM({_CENTS_O}) AS BIGINT) AS rev_cents
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2
),
span AS (
  SELECT nationkey, MIN(day) AS mn, MAX(day) AS mx FROM daily GROUP BY 1
),
bounds AS (SELECT MIN(day) AS mn, MAX(day) AS mx FROM daily),
g AS (
  SELECT mn AS day, mx FROM bounds
  UNION ALL
  SELECT CAST(day + INTERVAL 1 DAY AS DATE), mx FROM g WHERE day < mx
),
spine AS (
  SELECT s.nationkey, g.day
  FROM span s JOIN g ON g.day BETWEEN s.mn AND s.mx
)
SELECT sp.nationkey, sp.day,
       d.rev_cents AS rev_cents,
       last_value(d.rev_cents IGNORE NULLS) OVER (
         PARTITION BY sp.nationkey ORDER BY sp.day
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rev_filled,
       (d.rev_cents IS NULL) AS is_gap
FROM spine sp LEFT JOIN daily d
  ON d.nationkey = sp.nationkey AND d.day = sp.day
"""


@workload("timeseries_locf_fill", oracle=_LOCF_ORACLE)
def timeseries_locf_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOCF GAP FILL: each nation's daily revenue series densified over
    its own calendar spine (sequence/explode — generated, never stored)
    with missing days carried forward via last_value(IGNORE NULLS) —
    the step-function fill finance and metrics pipelines use where
    C1's linear interpolation is wrong (a balance stays constant until
    restated, it doesn't glide). One shuffle to the (nation) keyed
    window; the spine explode is per-nation and never global."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    daily = (
        o.join(
            F.broadcast(c.select("c_custkey", "c_nationkey")),
            o["o_custkey"] == F.col("c_custkey"),
        )
        .groupBy(
            F.col("c_nationkey").alias("nationkey"),
            F.col("o_orderdate").cast("date").alias("day"),
        )
        .agg(F.sum(F.expr(_CENTS_O)).cast("long").alias("rev_cents"))
    )
    spine = (
        daily.groupBy("nationkey")
        .agg(F.min("day").alias("mn"), F.max("day").alias("mx"))
        .select(
            "nationkey",
            F.explode(
                F.sequence("mn", "mx", F.expr("INTERVAL 1 DAY"))
            ).alias("day"),
        )
    )
    w = (
        Window.partitionBy("nationkey")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.join(daily, ["nationkey", "day"], "left")
        .select(
            "nationkey",
            "day",
            "rev_cents",
            F.last("rev_cents", ignorenulls=True).over(w).alias("rev_filled"),
            F.col("rev_cents").isNull().alias("is_gap"),
        )
    )


# --------------------------------------------------------------------------
# C211 — time-bound funnel conversion (view -> click 24h -> purchase 72h)
# --------------------------------------------------------------------------
_FUNNEL_ORACLE = """
WITH v AS (
  SELECT user_id, MIN(ts) AS first_view
  FROM events WHERE event_type = 'view' GROUP BY user_id
),
k AS (
  SELECT v.user_id, v.first_view, MIN(e.ts) AS first_click
  FROM v JOIN events e
    ON e.user_id = v.user_id AND e.event_type = 'click'
   AND e.ts >= v.first_view
  GROUP BY v.user_id, v.first_view
  HAVING MIN(e.ts) <= v.first_view + INTERVAL 24 HOUR
),
p AS (
  SELECT k.user_id, MIN(e.ts) AS first_purchase
  FROM k JOIN events e
    ON e.user_id = k.user_id AND e.event_type = 'purchase'
   AND e.ts >= k.first_click
  GROUP BY k.user_id, k.first_click
  HAVING MIN(e.ts) <= k.first_click + INTERVAL 72 HOUR
)
SELECT CAST((SELECT COUNT(*) FROM v) AS BIGINT) AS n_viewers,
       CAST((SELECT COUNT(*) FROM k) AS BIGINT) AS n_clickers_24h,
       CAST((SELECT COUNT(*) FROM p) AS BIGINT) AS n_purchasers_72h,
       ROUND(CAST((SELECT COUNT(*) FROM k) AS DOUBLE)
             / (SELECT COUNT(*) FROM v), 6) AS view_to_click,
       ROUND(CAST((SELECT COUNT(*) FROM p) AS DOUBLE)
             / (SELECT COUNT(*) FROM k), 6) AS click_to_purchase
"""


@workload("events_funnel_timebound", oracle=_FUNNEL_ORACLE)
def events_funnel_timebound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-BOUND FUNNEL: first view -> first subsequent click within
    24h -> first subsequent purchase within 72h, counting users
    surviving each stage — the stage-windowed form of
    events_funnel_conversion (which tracks unbounded per-user depth;
    real funnel metrics expire stages, so the bounded variant is the
    one a growth team actually reports). Each stage is one
    equi-join on user_id followed by a keyed aggregate — all three
    stages shuffle on the SAME key, so at scale the exchange is reused
    across the chain; no window function, no per-user state."""
    ev = load_table(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_view"))
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("k_user"), F.col("ts").alias("k_ts")
    )
    k = (
        v.join(
            clicks,
            (F.col("k_user") == F.col("user_id"))
            & (F.col("k_ts") >= F.col("first_view")),
        )
        .groupBy("user_id", "first_view")
        .agg(F.min("k_ts").alias("first_click"))
        .filter(
            F.col("first_click")
            <= F.col("first_view") + F.expr("INTERVAL 24 HOUR")
        )
    )
    purch = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    p = (
        k.join(
            purch,
            (F.col("p_user") == F.col("user_id"))
            & (F.col("p_ts") >= F.col("first_click")),
        )
        .groupBy("user_id", "first_click")
        .agg(F.min("p_ts").alias("first_purchase"))
        .filter(
            F.col("first_purchase")
            <= F.col("first_click") + F.expr("INTERVAL 72 HOUR")
        )
    )
    nv = v.agg(F.count(F.lit(1)).alias("n_viewers"))
    nk = k.agg(F.count(F.lit(1)).alias("n_clickers_24h"))
    np_ = p.agg(F.count(F.lit(1)).alias("n_purchasers_72h"))
    return (
        nv.crossJoin(nk)
        .crossJoin(np_)
        .select(
            F.col("n_viewers").cast("long"),
            F.col("n_clickers_24h").cast("long"),
            F.col("n_purchasers_72h").cast("long"),
            F.round(
                F.col("n_clickers_24h").cast("double") / F.col("n_viewers"), 6
            ).alias("view_to_click"),
            F.round(
                F.col("n_purchasers_72h").cast("double")
                / F.col("n_clickers_24h"),
                6,
            ).alias("click_to_purchase"),
        )
    )


# --------------------------------------------------------------------------
# C212 — exact weighted median (lower weighted median, integer criterion)
# --------------------------------------------------------------------------
_WMED_ORACLE = f"""
WITH vw AS (
  SELECT l_returnflag AS returnflag,
         {_CENTS_L} AS cents,
         CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(18,2)) AS BIGINT))
              AS BIGINT) AS wt
  FROM lineitem
  GROUP BY l_returnflag, {_CENTS_L}
),
cum AS (
  SELECT returnflag, cents, wt,
         CAST(SUM(wt) OVER (PARTITION BY returnflag ORDER BY cents
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cw,
         CAST(SUM(wt) OVER (PARTITION BY returnflag) AS BIGINT) AS total
  FROM vw
)
SELECT returnflag,
       CAST(MIN(CASE WHEN 2 * cw >= total THEN cents END) AS BIGINT)
         AS median_cents,
       CAST(MIN(total) AS BIGINT) AS total_weight
FROM cum
GROUP BY returnflag
"""


@workload("stats_weighted_median_price", oracle=_WMED_ORACLE)
def stats_weighted_median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT WEIGHTED MEDIAN of line price (cents) weighted by quantity,
    per return flag — the robust location estimate unweighted median
    (C13/C112) can't give when rows carry multiplicity. Equal values
    merge BEFORE the cumulative scan (group by (flag, cents)), then the
    lower weighted median is the least value with 2*cumweight >= total
    — an all-integer criterion, so engine float behavior can't touch
    the answer. Cost: one keyed aggregate + one keyed window; the
    cumulative scan runs over DISTINCT price points, not raw rows."""
    l = load_table(spark, sf_dir, "lineitem")
    vw = (
        l.select(
            F.col("l_returnflag").alias("returnflag"),
            F.expr(_CENTS_L).alias("cents"),
            F.col("l_quantity").cast("decimal(18,2)").cast("long").alias("w"),
        )
        .groupBy("returnflag", "cents")
        .agg(F.sum("w").cast("long").alias("wt"))
    )
    w_cum = (
        Window.partitionBy("returnflag")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("returnflag")
    cum = vw.select(
        "returnflag",
        "cents",
        F.sum("wt").over(w_cum).cast("long").alias("cw"),
        F.sum("wt").over(w_all).cast("long").alias("total"),
    )
    return cum.groupBy("returnflag").agg(
        F.min(F.when(2 * F.col("cw") >= F.col("total"), F.col("cents")))
        .cast("long")
        .alias("median_cents"),
        F.min("total").cast("long").alias("total_weight"),
    )


# --------------------------------------------------------------------------
# C213 — Matryoshka two-stage retrieval (prefix-dim coarse scan, full rerank)
# --------------------------------------------------------------------------
_MRL_M = 16       # coarse prefix dimensions
_MRL_CAND = 50    # stage-1 candidate pool
_MRL_K = 10       # final top-k
_MRL_Q = 0        # query vector id


def _mrl_oracle() -> str:
    from sample_data_pipeline_project_spark.functions.vectors import duck_cosine

    coarse = duck_cosine(f"e.embedding[1:{_MRL_M}]", f"q.q_emb[1:{_MRL_M}]")
    full = duck_cosine("c.embedding", "q.q_emb")
    return f"""
WITH q AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = {_MRL_Q}),
c AS (
  SELECT e.vec_id, e.embedding, {coarse} AS coarse_sim
  FROM embeddings e CROSS JOIN q
  WHERE e.vec_id != {_MRL_Q}
  ORDER BY coarse_sim DESC, e.vec_id ASC
  LIMIT {_MRL_CAND}
)
SELECT c.vec_id, c.coarse_sim, {full} AS cosine_sim
FROM c CROSS JOIN q
ORDER BY cosine_sim DESC, c.vec_id ASC
LIMIT {_MRL_K}
"""


@workload("sim_matryoshka_two_stage", oracle=_mrl_oracle())
def sim_matryoshka_two_stage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATRYOSHKA two-stage retrieval: stage 1 scores only the FIRST
    {m} dimensions of every vector (the cheap prefix scan MRL-trained
    embeddings are built for — 1/{frac} of the multiply-adds of a full
    scan), keeps a {cand}-candidate pool, and stage 2 re-ranks just the
    pool with the exact full-dimension cosine. At corpus scale the full
    vectors for stage 2 are fetched for CANDIDATES ONLY, so the wide
    column never fully scans. Both stages are the bit-portable left-fold
    dot; stage-1 and stage-2 scores both surface so recall analysis can
    compare orderings. TakeOrdered bounds both stages; ties break on
    vec_id."""
    from sample_data_pipeline_project_spark.functions.vectors import cosine

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == _MRL_Q).select(
        F.col("embedding").alias("q_emb")
    )
    joined = emb.filter(F.col("vec_id") != _MRL_Q).crossJoin(F.broadcast(q))
    coarse = cosine(
        f"slice(embedding, 1, {_MRL_M})", f"slice(q_emb, 1, {_MRL_M})"
    )
    pool = (
        joined.select(
            "vec_id", "embedding", "q_emb", coarse.alias("coarse_sim")
        )
        .orderBy(F.desc("coarse_sim"), F.asc("vec_id"))
        .limit(_MRL_CAND)
    )
    return (
        pool.select(
            "vec_id", "coarse_sim", cosine("embedding", "q_emb").alias("cosine_sim")
        )
        .orderBy(F.desc("cosine_sim"), F.asc("vec_id"))
        .limit(_MRL_K)
    )


sim_matryoshka_two_stage.__doc__ = sim_matryoshka_two_stage.__doc__.format(
    m=_MRL_M, frac=4, cand=_MRL_CAND
)


# --------------------------------------------------------------------------
# C218 — ranking-function surface (rank/dense_rank/percent_rank/cume_dist/
#        ntile) with explicit tie semantics
# --------------------------------------------------------------------------
_RANKS_ORACLE = """
SELECT o_orderkey,
       o_orderpriority AS priority,
       CAST(RANK() OVER w_ties AS BIGINT) AS rnk,
       CAST(DENSE_RANK() OVER w_ties AS BIGINT) AS drnk,
       PERCENT_RANK() OVER w_ties AS prank,
       CUME_DIST() OVER w_ties AS cdist,
       CAST(NTILE(4) OVER w_uniq AS BIGINT) AS quartile,
       CAST(ROW_NUMBER() OVER w_uniq AS BIGINT) AS rn
FROM orders
WINDOW
  w_ties AS (PARTITION BY o_orderpriority ORDER BY CAST(o_orderdate AS DATE)),
  w_uniq AS (PARTITION BY o_orderpriority
             ORDER BY CAST(o_orderdate AS DATE), o_orderkey)
"""


@workload("window_rank_surface", oracle=_RANKS_ORACLE)
def window_rank_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANKING-FUNCTION SURFACE with explicit tie semantics: rank /
    dense_rank / percent_rank / cume_dist ride a TIE-FULL ordering
    (order date only — value-based functions are deterministic under
    ties), while ntile and row_number — POSITION-based, nondeterministic
    under ties — ride the unique (date, orderkey) ordering. Both windows
    share one partitioning (priority), so Catalyst plans a single
    exchange with two sorts, not two shuffles."""
    from pyspark.sql.window import Window as W

    o = load_table(spark, sf_dir, "orders")
    day = F.col("o_orderdate").cast("date")
    w_ties = W.partitionBy("o_orderpriority").orderBy(day)
    w_uniq = W.partitionBy("o_orderpriority").orderBy(day, F.col("o_orderkey"))
    return o.select(
        "o_orderkey",
        F.col("o_orderpriority").alias("priority"),
        F.rank().over(w_ties).cast("long").alias("rnk"),
        F.dense_rank().over(w_ties).cast("long").alias("drnk"),
        F.percent_rank().over(w_ties).alias("prank"),
        F.cume_dist().over(w_ties).alias("cdist"),
        F.ntile(4).over(w_uniq).cast("long").alias("quartile"),
        F.row_number().over(w_uniq).cast("long").alias("rn"),
    )


# --------------------------------------------------------------------------
# C223 — cross-field data-quality rule engine (one pass, unpivoted report)
# --------------------------------------------------------------------------
_DQ_RULES: list[tuple[str, str]] = [
    # (rule_name, VIOLATION predicate — true means the row FAILS the rule)
    ("ship_before_order", "l_shipdate < o_orderdate"),
    ("discount_out_of_range", "l_discount < 0 OR l_discount > 1"),
    ("nonpositive_price", "l_extendedprice <= 0"),
    ("negative_tax", "l_tax < 0"),
    ("zero_quantity", "l_quantity < 1"),
]

_DQRULES_ORACLE = f"""
WITH j AS (
  SELECT l.*, o.o_orderdate
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
agg AS (
  SELECT COUNT(*) AS n_checked,
         {', '.join(
             f"COUNT(*) FILTER (WHERE {pred}) AS v_{name}"
             for name, pred in _DQ_RULES)}
  FROM j
)
{' UNION ALL '.join(
    f"SELECT '{name}' AS rule_name, CAST(n_checked AS BIGINT) AS n_checked, "
    f"CAST(v_{name} AS BIGINT) AS n_violations, "
    f"ROUND(CAST(v_{name} AS DOUBLE) / n_checked, 6) AS violation_rate "
    f"FROM agg" for name, _ in _DQ_RULES)}
"""


@workload("dq_cross_field_rules", oracle=_DQRULES_ORACLE)
def dq_cross_field_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CROSS-FIELD DQ RULE ENGINE: five referential/range constraints
    (ship-before-order needs the lineitem->orders join; the rest are
    row-local) evaluated in ONE aggregation pass — conditional counts,
    never five scans — then unpivoted to the per-rule report shape
    (rule, checked, violations, rate) via stack(). Adding a rule adds
    one counter to the same pass. This is the constraint-audit layer
    over the single-column profiles of dq_profile_orders (C11) and the
    FK audit (C62)."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    j = l.join(o, l["l_orderkey"] == o["o_orderkey"])
    aggs = [F.count(F.lit(1)).alias("n_checked")] + [
        F.count(F.when(F.expr(pred), 1)).alias(f"v_{name}")
        for name, pred in _DQ_RULES
    ]
    agg = j.agg(*aggs)
    stack_expr = "stack({n}, {pairs}) AS (rule_name, n_violations)".format(
        n=len(_DQ_RULES),
        pairs=", ".join(f"'{name}', v_{name}" for name, _ in _DQ_RULES),
    )
    return agg.select("n_checked", F.expr(stack_expr)).select(
        "rule_name",
        F.col("n_checked").cast("long"),
        F.col("n_violations").cast("long"),
        F.round(
            F.col("n_violations").cast("double") / F.col("n_checked"), 6
        ).alias("violation_rate"),
    )


# --------------------------------------------------------------------------
# C224 — Gopher-style quality gates (rule ensemble over token statistics)
# --------------------------------------------------------------------------
_GOPHER_STOP = ("the", "a")  # corpus stopwords (synthetic vocab)
_G_MIN_TOK, _G_MAX_TOK = 20, 80
_G_MIN_MEAN, _G_MAX_MEAN = 3.0, 10.0
_G_MIN_STOP = 2
_G_MAX_TOP_SHARE = 0.12

_GOPHER_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
  FROM documents
),
tc AS (
  SELECT doc_id, tok, COUNT(*) AS cnt
  FROM tok WHERE tok <> '' GROUP BY doc_id, tok
),
d AS (
  SELECT doc_id,
         CAST(SUM(cnt) AS BIGINT) AS n_tokens,
         CAST(SUM(CAST(LENGTH(tok) AS BIGINT) * cnt) AS BIGINT) AS n_chars_tok,
         CAST(COALESCE(SUM(cnt) FILTER (
             WHERE tok IN {str(tuple(_GOPHER_STOP))}), 0) AS BIGINT) AS n_stop,
         CAST(MAX(cnt) AS BIGINT) AS top_cnt
  FROM tc GROUP BY doc_id
),
g AS (
  SELECT doc_id, n_tokens, n_stop,
         ROUND(CAST(n_chars_tok AS DOUBLE) / n_tokens, 6) AS mean_tok_len,
         ROUND(CAST(top_cnt AS DOUBLE) / n_tokens, 6) AS top_share,
         (n_tokens BETWEEN {_G_MIN_TOK} AND {_G_MAX_TOK}) AS g_length,
         (CAST(n_chars_tok AS DOUBLE) / n_tokens >= {_G_MIN_MEAN}
          AND CAST(n_chars_tok AS DOUBLE) / n_tokens <= {_G_MAX_MEAN})
           AS g_mean_len,
         (n_stop >= {_G_MIN_STOP}) AS g_stopwords,
         (CAST(top_cnt AS DOUBLE) / n_tokens <= {_G_MAX_TOP_SHARE})
           AS g_repetition
  FROM d
)
SELECT doc_id, n_tokens, mean_tok_len, n_stop, top_share,
       g_length, g_mean_len, g_stopwords, g_repetition,
       (g_length AND g_mean_len AND g_stopwords AND g_repetition)
         AS passes_all
FROM g
"""


@workload("text_gopher_quality_gates", oracle=_GOPHER_ORACLE)
def text_gopher_quality_gates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GOPHER-STYLE QUALITY GATES (Rae et al. 2021's rule-ensemble
    document filter, the standard pre-training curation stage): per-doc
    token-length band, mean-token-length band, minimum stopword count,
    and top-token repetition share — each surfaced as its own boolean
    gate plus the conjunction, so downstream curation can report WHICH
    rule rejected a document, not just that one did. Two-level exact-int
    aggregation ((doc, token) counts -> per-doc stats, the same shuffle
    key chain), two ROUND(_,6) divisions of exact ints — no double
    summation anywhere. Complements the single-signal filters C20
    (repetition) and B4 quality scoring."""
    from sample_data_pipeline_project_spark.functions.text import tokens

    d = load_table(spark, sf_dir, "documents")
    tc = (
        d.select("doc_id", F.explode(tokens("text")).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    stats = tc.groupBy("doc_id").agg(
        F.sum("cnt").cast("long").alias("n_tokens"),
        F.sum(F.length("tok").cast("long") * F.col("cnt"))
        .cast("long")
        .alias("n_chars_tok"),
        F.coalesce(
            F.sum(F.when(F.col("tok").isin(*_GOPHER_STOP), F.col("cnt"))),
            F.lit(0),
        )
        .cast("long")
        .alias("n_stop"),
        F.max("cnt").cast("long").alias("top_cnt"),
    )
    mean_len = F.col("n_chars_tok").cast("double") / F.col("n_tokens")
    top_share = F.col("top_cnt").cast("double") / F.col("n_tokens")
    g_length = F.col("n_tokens").between(_G_MIN_TOK, _G_MAX_TOK)
    g_mean = (mean_len >= _G_MIN_MEAN) & (mean_len <= _G_MAX_MEAN)
    g_stop = F.col("n_stop") >= _G_MIN_STOP
    g_rep = top_share <= _G_MAX_TOP_SHARE
    return stats.select(
        "doc_id",
        "n_tokens",
        F.round(mean_len, 6).alias("mean_tok_len"),
        "n_stop",
        F.round(top_share, 6).alias("top_share"),
        g_length.alias("g_length"),
        g_mean.alias("g_mean_len"),
        g_stop.alias("g_stopwords"),
        g_rep.alias("g_repetition"),
        (g_length & g_mean & g_stop & g_rep).alias("passes_all"),
    )


# --------------------------------------------------------------------------
# C218 — correlated LATERAL subquery (per-row dependent top-n)
# --------------------------------------------------------------------------
_LATERAL_ORACLE = """
SELECT n.n_nationkey AS nationkey, t.c_custkey AS custkey,
       t.c_acctbal AS acctbal
FROM nation n,
LATERAL (SELECT c_custkey, c_acctbal FROM customer c
         WHERE c.c_nationkey = n.n_nationkey
         ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t
"""


@workload("join_lateral_topn_per_nation", oracle=_LATERAL_ORACLE)
def join_lateral_topn_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CORRELATED LATERAL SUBQUERY: per nation, its top-2 customers by
    balance, written as `FROM nation, LATERAL (... WHERE correlated
    ORDER BY ... LIMIT 2)` — the per-row dependent-subquery surface
    (distinct from the UDTF lateral of C-chunking and from the window
    row_number form of window_topn_per_nation: this one exercises
    Catalyst's DecorrelateInnerQuery path, which rewrites the lateral
    into a ranked join rather than executing per-row). Deterministic
    via the (acctbal DESC, custkey) tiebreak."""
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(_LATERAL_ORACLE)


# --------------------------------------------------------------------------
# C219 — SLO burn rate (multi-window error-budget alerting)
# --------------------------------------------------------------------------
_SLO_BUDGET = 0.25   # error-share budget
_SLO_LONG_H = 6      # long window, hours

_SLO_ORACLE = f"""
WITH hourly AS (
  SELECT date_diff('hour', TIMESTAMP '1970-01-01 00:00:00',
                   date_trunc('hour', ts)) AS hr,
         COUNT(*) AS n_total,
         COUNT(*) FILTER (WHERE event_type = 'error') AS n_err
  FROM events GROUP BY 1
),
targets AS (
  SELECT h.hr + r.range AS t_hr, h.n_total, h.n_err
  FROM hourly h CROSS JOIN range({_SLO_LONG_H}) r
),
rolled AS (
  SELECT h.hr, h.n_total, h.n_err,
         CAST(SUM(t.n_total) AS BIGINT) AS n_total_6h,
         CAST(SUM(t.n_err) AS BIGINT) AS n_err_6h
  FROM hourly h JOIN targets t ON t.t_hr = h.hr
  GROUP BY h.hr, h.n_total, h.n_err
)
SELECT CAST(hr AS BIGINT) AS hr,
       CAST(n_total AS BIGINT) AS n_total,
       CAST(n_err AS BIGINT) AS n_err,
       n_total_6h, n_err_6h,
       ROUND(CAST(n_err AS DOUBLE) / n_total / {_SLO_BUDGET}, 6)
         AS burn_short,
       ROUND(CAST(n_err_6h AS DOUBLE) / n_total_6h / {_SLO_BUDGET}, 6)
         AS burn_long,
       (CAST(n_err AS DOUBLE) / n_total > {_SLO_BUDGET}
        AND CAST(n_err_6h AS DOUBLE) / n_total_6h > {_SLO_BUDGET})
         AS is_burning
FROM rolled
"""


@workload("events_slo_burn_rate", oracle=_SLO_ORACLE)
def events_slo_burn_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MULTI-WINDOW SLO BURN-RATE alerting (the Google SRE workbook
    pattern): per hour, the short-window (1h) and long-window (6h
    trailing) error-share burn rates against a fixed budget, alerting
    only when BOTH windows burn — short-only is noise, long-only is
    stale. The 6h trailing sum is an EQUI-join: each hour's counts
    explode to the 6 future hours they cover (sequence + explode), so
    there is no global-ordered window (the single-partition plan class
    this engine bans) and no range join; the hourly table is bounded by
    the time span, not the event volume."""
    ev = load_table(spark, sf_dir, "events")
    hours = F.unix_micros(
        F.date_trunc("hour", F.col("ts")).cast("timestamp")
    ) / F.lit(3600_000_000)
    hourly = (
        ev.select(
            hours.cast("long").alias("hr"),
            F.col("event_type"),
        )
        .groupBy("hr")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.count(F.when(F.col("event_type") == "error", 1)).alias("n_err"),
        )
    )
    targets = hourly.select(
        F.explode(
            F.sequence(F.col("hr"), F.col("hr") + (_SLO_LONG_H - 1))
        ).alias("t_hr"),
        F.col("n_total").alias("t_total"),
        F.col("n_err").alias("t_err"),
    )
    rolled = (
        hourly.join(targets, hourly["hr"] == targets["t_hr"])
        .groupBy("hr", "n_total", "n_err")
        .agg(
            F.sum("t_total").cast("long").alias("n_total_6h"),
            F.sum("t_err").cast("long").alias("n_err_6h"),
        )
    )
    rate_s = F.col("n_err").cast("double") / F.col("n_total")
    rate_l = F.col("n_err_6h").cast("double") / F.col("n_total_6h")
    return rolled.select(
        F.col("hr").cast("long"),
        F.col("n_total").cast("long"),
        F.col("n_err").cast("long"),
        "n_total_6h",
        "n_err_6h",
        F.round(rate_s / _SLO_BUDGET, 6).alias("burn_short"),
        F.round(rate_l / _SLO_BUDGET, 6).alias("burn_long"),
        ((rate_s > _SLO_BUDGET) & (rate_l > _SLO_BUDGET)).alias("is_burning"),
    )


# --------------------------------------------------------------------------
# C220 — cohort retention triangle (weekly)
# --------------------------------------------------------------------------
_RETENTION_ORACLE = """
WITH firsts AS (
  SELECT user_id,
         date_diff('day', DATE '1970-01-01', MIN(CAST(ts AS DATE))) // 7
           AS cohort_week
  FROM events GROUP BY user_id
),
activity AS (
  SELECT DISTINCT e.user_id,
         date_diff('day', DATE '1970-01-01', CAST(e.ts AS DATE)) // 7
           AS act_week
  FROM events e
),
sizes AS (
  SELECT cohort_week, COUNT(*) AS cohort_size FROM firsts GROUP BY 1
),
cells AS (
  SELECT f.cohort_week, a.act_week - f.cohort_week AS week_n,
         COUNT(DISTINCT a.user_id) AS n_active
  FROM firsts f JOIN activity a ON a.user_id = f.user_id
  GROUP BY 1, 2
)
SELECT CAST(c.cohort_week AS BIGINT) AS cohort_week,
       CAST(c.week_n AS BIGINT) AS week_n,
       CAST(c.n_active AS BIGINT) AS n_active,
       CAST(s.cohort_size AS BIGINT) AS cohort_size,
       ROUND(CAST(c.n_active AS DOUBLE) / s.cohort_size, 6) AS retention
FROM cells c JOIN sizes s ON s.cohort_week = c.cohort_week
"""


@workload("events_retention_matrix", oracle=_RETENTION_ORACLE)
def events_retention_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COHORT RETENTION TRIANGLE: users cohorted by first-active week
    (epoch-week buckets — calendar-truncation-free, so no Monday-start
    engine divergence), each later week's retained share of the cohort —
    the table every growth dashboard renders. All weeks are nonnegative
    integer day-quotients (floor == truncate, so Spark div and DuckDB //
    agree); one shuffle on user_id for the cohort join, then a keyed
    aggregate per (cohort, week)."""
    ev = load_table(spark, sf_dir, "events")
    day_num = F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date"))
    week = F.floor(day_num / 7).cast("long")
    firsts = ev.groupBy("user_id").agg(F.min(week).alias("cohort_week"))
    activity = ev.select(
        "user_id", week.alias("act_week")
    ).distinct()
    sizes = firsts.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    cells = (
        firsts.join(activity, "user_id")
        .groupBy(
            "cohort_week",
            (F.col("act_week") - F.col("cohort_week")).alias("week_n"),
        )
        .agg(F.count_distinct(F.col("user_id")).alias("n_active"))
    )
    return cells.join(sizes, "cohort_week").select(
        F.col("cohort_week").cast("long"),
        F.col("week_n").cast("long"),
        F.col("n_active").cast("long"),
        F.col("cohort_size").cast("long"),
        F.round(
            F.col("n_active").cast("double") / F.col("cohort_size"), 6
        ).alias("retention"),
    )
