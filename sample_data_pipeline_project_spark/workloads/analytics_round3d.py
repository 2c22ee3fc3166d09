"""Round-3 sketch + information-theory + rank-statistics workloads:
Misra-Gries heavy hitters, tie-corrected Spearman correlation, per-source
KL divergence, and event-type/weekday mutual information.

Determinism notes (additions to the repo-wide contract):
  - Order-dependent float SUMS of ln() terms are avoided entirely by the
    SCALED-INTEGER TERM SUM tactic: each per-cell term is computed as a
    double in identical textual order on both engines, multiplied by 1e9,
    ROUND(_, 0)ed (absorbing libm ulps, the ROUND(_,9) guard in integer
    form) and cast to BIGINT while exactly integral — the cross-cell SUM
    is then exact int64 arithmetic, summation-order-independent AND
    map-side combinable (unlike the sorted-left-fold tactic, which must
    collect a group's terms into one array).
  - Spearman uses TIE-CORRECTED average ranks computed analytically from
    per-value counts (rank2 = 2*|{x' < x}| + m + 1, an exact integer equal
    to twice the average rank) — no per-row window, no tiebreak column
    needed, deterministic under arbitrary duplicate rows. Pearson is
    affine-invariant, so integer rank2 values give the exact Spearman rho.
  - Misra-Gries counter VALUES depend on the (deterministic) shard layout
    but are not oracle-stateable; the workload certifies the sketch's
    provable invariants instead (guaranteed-present set via the all-integer
    predicate true*(k+1) > n, underestimation, and the n/(k+1) error
    bound), exactly the ANN-recall certification pattern (C9).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sample_data_pipeline_project_spark.functions.text import tokens
from sample_data_pipeline_project_spark.operators.heavyhitters import mg_summary
from sample_data_pipeline_project_spark.sources.catalog import load_table
from sample_data_pipeline_project_spark.workloads import workload

_DUCK_TOKENS = "string_split_regex(lower(trim(text)), '\\s+')"
_CENTS_EP = "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"

# --------------------------------------------------------------------------
# Misra-Gries heavy hitters over price-magnitude buckets (certified)
# --------------------------------------------------------------------------
_MG_K = 4
_MG_SHARDS = 32

# floor(log2(cents)) via bit length — pure integer logic, no libm log2
# whose ulp at power-of-two boundaries could flip FLOOR cross-engine.
_MG_BUCKET = (
    "CAST(length(bin(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100"
    " AS BIGINT))) - 1 AS VARCHAR)"
)

_MG_ORACLE = f"""
WITH t AS (
  SELECT {_MG_BUCKET} AS item FROM orders
),
c AS (
  SELECT item, COUNT(*) AS true_count FROM t GROUP BY item
),
n AS (SELECT SUM(true_count) AS n FROM c)
SELECT c.item, CAST(c.true_count AS BIGINT) AS true_count,
       TRUE AS present, TRUE AS underestimate_ok, TRUE AS error_bound_ok
FROM c, n
WHERE c.true_count * {_MG_K + 1} > n.n
"""


@workload("sketch_misra_gries_buckets", oracle=_MG_ORACLE)
def sketch_misra_gries_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MISRA-GRIES heavy hitters over the order price-magnitude stream
    (bucket = floor(log2(cents)) via exact BIT LENGTH, no libm) — the
    deterministic, mergeable, UNDERestimating dual of the Count-Min
    workload (C17), with the classic guarantee est in
    [true - n/(k+1), true]. With k=4 counters against ~20 live buckets
    the per-shard passes evict constantly, exercising the sketch for
    real; the two modal buckets (~33% each) clear the 20% guarantee
    threshold. The stream is hash-sharded; each shard runs the
    O(k)-memory sequential pass (applyInPandas, pinned order); the
    bounded shards x k summary rows merge once driver-side
    (operators/heavyhitters.py). Certification: every bucket whose true
    count exceeds n/(k+1) (ALL-INTEGER predicate true*(k+1) > n) must be
    present, underestimated, and within the error bound — each stated as
    TRUE by the oracle; the sketch's raw counter values are deliberately
    not hashed (they depend on the shard layout)."""
    o = load_table(spark, sf_dir, "orders")
    stream = o.select(
        "o_orderkey",
        F.expr(
            "CAST(length(bin(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100"
            " AS BIGINT))) - 1 AS STRING)"
        ).alias("item"),
    )
    summary = mg_summary(
        stream, _MG_K, item_col="item", order_cols=["o_orderkey"],
        num_shards=_MG_SHARDS,
    )
    est_df = spark.createDataFrame(
        [(t, int(c)) for t, c in sorted(summary.items())] or [("", 0)],
        "item string, est long",
    )
    exact = stream.groupBy("item").agg(
        F.count(F.lit(1)).alias("true_count")
    )
    total = exact.agg(F.sum("true_count").alias("n"))
    guaranteed = (
        exact.crossJoin(F.broadcast(total))
        .filter(F.col("true_count") * (_MG_K + 1) > F.col("n"))
        .join(F.broadcast(est_df), "item", "left")
    )
    return guaranteed.select(
        "item",
        F.col("true_count").cast("long"),
        F.col("est").isNotNull().alias("present"),
        (F.col("est") <= F.col("true_count")).alias("underestimate_ok"),
        (
            (F.col("true_count") - F.col("est")) * (_MG_K + 1) <= F.col("n")
        ).alias("error_bound_ok"),
    )


# --------------------------------------------------------------------------
# Tie-corrected Spearman rank correlation per supplier
# --------------------------------------------------------------------------
_SPEARMAN_ORACLE = f"""
WITH li AS (
  SELECT l_suppkey AS supp, CAST(l_quantity AS BIGINT) AS x,
         {_CENTS_EP} AS y
  FROM lineitem
),
xc AS (
  SELECT supp, x, COUNT(*) AS m FROM li GROUP BY supp, x
),
xr AS (
  SELECT supp, x,
         2 * COALESCE(SUM(m) OVER (PARTITION BY supp ORDER BY x
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         + m + 1 AS rx
  FROM xc
),
yc AS (
  SELECT supp, y, COUNT(*) AS m FROM li GROUP BY supp, y
),
yr AS (
  SELECT supp, y,
         2 * COALESCE(SUM(m) OVER (PARTITION BY supp ORDER BY y
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         + m + 1 AS ry
  FROM yc
),
cells AS (
  SELECT li.supp, li.x, li.y, COUNT(*) AS w FROM li GROUP BY li.supp, li.x, li.y
),
s AS (
  SELECT c.supp, SUM(c.w) AS n,
         SUM(c.w * xr.rx) AS sa, SUM(c.w * yr.ry) AS sb,
         SUM(c.w * xr.rx * xr.rx) AS saa,
         SUM(c.w * yr.ry * yr.ry) AS sbb,
         SUM(c.w * xr.rx * yr.ry) AS sab
  FROM cells c
  JOIN xr ON c.supp = xr.supp AND c.x = xr.x
  JOIN yr ON c.supp = yr.supp AND c.y = yr.y
  GROUP BY c.supp
)
SELECT CAST(supp AS BIGINT) AS supp, CAST(n AS BIGINT) AS n,
       (CAST(n AS DOUBLE) * CAST(sab AS DOUBLE)
        - CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE))
       / NULLIF(SQRT(CAST(n AS DOUBLE) * CAST(saa AS DOUBLE)
                     - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE))
                * SQRT(CAST(n AS DOUBLE) * CAST(sbb AS DOUBLE)
                       - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE)), 0.0)
       AS spearman_rho
FROM s
"""


@workload("stats_spearman_qty_price", oracle=_SPEARMAN_ORACLE)
def stats_spearman_qty_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIE-CORRECTED SPEARMAN rank correlation between quantity and price
    per supplier. Average ranks are computed ANALYTICALLY from per-value
    counts (rank2 = 2*#{smaller} + m + 1 — twice the average rank, an
    exact integer), so duplicate rows need no tiebreak column and no
    per-row window exists: the windows ride the per-supplier DISTINCT
    value tables (value-domain-bounded), and Pearson's affine invariance
    makes rho over integer rank2 exactly Spearman's rho. Sufficient
    statistics are exact int64 (peak ~9e17 at sf10); one final float
    expression per supplier."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_suppkey").alias("supp"),
        F.col("l_quantity").cast("long").alias("x"),
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("y"),
    )

    def rank2(col: str, out: str) -> DataFrame:
        cnt = li.groupBy("supp", col).agg(F.count(F.lit(1)).alias("m"))
        w = (
            Window.partitionBy("supp")
            .orderBy(col)
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        return cnt.select(
            "supp",
            col,
            (
                2 * F.coalesce(F.sum("m").over(w), F.lit(0))
                + F.col("m")
                + 1
            ).alias(out),
        )

    cells = li.groupBy("supp", "x", "y").agg(F.count(F.lit(1)).alias("w"))
    joined = cells.join(rank2("x", "rx"), ["supp", "x"]).join(
        rank2("y", "ry"), ["supp", "y"]
    )
    s = joined.groupBy("supp").agg(
        F.sum("w").alias("n"),
        F.sum(F.col("w") * F.col("rx")).alias("sa"),
        F.sum(F.col("w") * F.col("ry")).alias("sb"),
        F.sum(F.col("w") * F.col("rx") * F.col("rx")).alias("saa"),
        F.sum(F.col("w") * F.col("ry") * F.col("ry")).alias("sbb"),
        F.sum(F.col("w") * F.col("rx") * F.col("ry")).alias("sab"),
    )
    rho = (
        F.col("n").cast("double") * F.col("sab").cast("double")
        - F.col("sa").cast("double") * F.col("sb").cast("double")
    ) / F.nullif(
        F.sqrt(
            F.col("n").cast("double") * F.col("saa").cast("double")
            - F.col("sa").cast("double") * F.col("sa").cast("double")
        )
        * F.sqrt(
            F.col("n").cast("double") * F.col("sbb").cast("double")
            - F.col("sb").cast("double") * F.col("sb").cast("double")
        ),
        F.lit(0.0),
    )
    return s.select(
        F.col("supp").cast("long"),
        F.col("n").cast("long"),
        rho.alias("spearman_rho"),
    )


# --------------------------------------------------------------------------
# KL divergence of each source's token distribution vs the corpus
# --------------------------------------------------------------------------
_KL_TERM = (
    "(CAST(c_st AS DOUBLE) / CAST(n_s AS DOUBLE))"
    " * ln((CAST(c_st AS DOUBLE) * CAST(n AS DOUBLE))"
    " / (CAST(n_s AS DOUBLE) * CAST(c_t AS DOUBLE)))"
)

_KL_ORACLE = f"""
WITH t AS (
  SELECT source, unnest({_DUCK_TOKENS}) AS tok FROM documents
),
st AS (
  SELECT source, tok, COUNT(*) AS c_st FROM t WHERE tok != ''
  GROUP BY source, tok
),
src AS (SELECT source, SUM(c_st) AS n_s FROM st GROUP BY source),
gt AS (SELECT tok, SUM(c_st) AS c_t FROM st GROUP BY tok),
n AS (SELECT SUM(c_st) AS n FROM st),
terms AS (
  SELECT st.source,
         CAST(ROUND({_KL_TERM} * 1000000000.0, 0) AS BIGINT) AS term_scaled
  FROM st
  JOIN src ON st.source = src.source
  JOIN gt ON st.tok = gt.tok
  CROSS JOIN n
)
SELECT t.source, CAST(src.n_s AS BIGINT) AS n_tokens,
       CAST(SUM(t.term_scaled) AS DOUBLE) / 1000000000.0 AS kl_nats
FROM terms t JOIN src ON t.source = src.source
GROUP BY t.source, src.n_s
"""


@workload("text_kl_divergence_by_source", oracle=_KL_ORACLE)
def text_kl_divergence_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DOMAIN-SKEW detector: KL(source || corpus) over token unigram
    distributions — how far each provenance source's language drifts from
    the overall mix (the quantitative side of corpus-mix curation). All
    distributions are exact integer counts; each (source, token) cell's
    p*ln(p/q) term uses the SCALED-INTEGER TERM SUM tactic (term * 1e9
    rounded to BIGINT), so the per-source reduction is an exact,
    map-side-combinable int64 SUM with no float summation-order
    dependence. Shuffles are keyed (source, token) then source; the token
    marginal joins broadcast (vocabulary-bounded)."""
    d = load_table(spark, sf_dir, "documents")
    st = (
        d.select("source", F.explode(tokens("text")).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).alias("c_st"))
    )
    src = st.groupBy("source").agg(F.sum("c_st").alias("n_s"))
    gt = st.groupBy("tok").agg(F.sum("c_st").alias("c_t"))
    n = st.agg(F.sum("c_st").alias("n"))
    term = (
        F.col("c_st").cast("double") / F.col("n_s").cast("double")
    ) * F.log(
        (F.col("c_st").cast("double") * F.col("n").cast("double"))
        / (F.col("n_s").cast("double") * F.col("c_t").cast("double"))
    )
    terms = (
        st.join(F.broadcast(src), "source")
        .join(F.broadcast(gt), "tok")
        .crossJoin(F.broadcast(n))
        .select(
            "source",
            "n_s",
            F.round(term * 1000000000.0, 0).cast("long").alias("term_scaled"),
        )
    )
    return (
        terms.groupBy("source", "n_s")
        .agg(F.sum("term_scaled").alias("s"))
        .select(
            "source",
            F.col("n_s").cast("long").alias("n_tokens"),
            (F.col("s").cast("double") / 1000000000.0).alias("kl_nats"),
        )
    )


# --------------------------------------------------------------------------
# Mutual information: event_type vs weekday
# --------------------------------------------------------------------------
_MI_TERM = (
    "(CAST(c_xy AS DOUBLE) / CAST(n AS DOUBLE))"
    " * ln((CAST(c_xy AS DOUBLE) * CAST(n AS DOUBLE))"
    " / (CAST(c_x AS DOUBLE) * CAST(c_y AS DOUBLE)))"
)

_MI_ORACLE = f"""
WITH e AS (
  SELECT event_type AS x,
         date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) % 7 AS y
  FROM events
),
xy AS (SELECT x, y, COUNT(*) AS c_xy FROM e GROUP BY x, y),
mx AS (SELECT x, SUM(c_xy) AS c_x FROM xy GROUP BY x),
my AS (SELECT y, SUM(c_xy) AS c_y FROM xy GROUP BY y),
n AS (SELECT SUM(c_xy) AS n FROM xy),
terms AS (
  SELECT CAST(ROUND({_MI_TERM} * 1000000000.0, 0) AS BIGINT) AS term_scaled
  FROM xy JOIN mx ON xy.x = mx.x JOIN my ON xy.y = my.y CROSS JOIN n
)
SELECT CAST(n.n AS BIGINT) AS n_events,
       CAST(SUM(t.term_scaled) AS DOUBLE) / 1000000000.0 AS mi_nats
FROM terms t CROSS JOIN n
GROUP BY n.n
"""


@workload("stats_mutual_information_type_dow", oracle=_MI_ORACLE)
def stats_mutual_information_type_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MUTUAL INFORMATION between event type and weekday — the
    feature-relevance / dependence screen (is behavior day-of-week
    dependent at all). Weekday is the epoch-anchored mod-7 key (the C50
    dialect-portable convention); the contingency table is one
    map-side-combinable aggregate bounded by |types| x 7 cells; each
    cell's MI term uses the scaled-integer term sum, so the final
    reduction is exact int64. Output is a single row at any scale."""
    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        F.col("event_type").alias("x"),
        F.pmod(
            F.datediff(
                F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")
            ),
            F.lit(7),
        ).cast("long").alias("y"),
    )
    xy = e.groupBy("x", "y").agg(F.count(F.lit(1)).alias("c_xy"))
    mx = xy.groupBy("x").agg(F.sum("c_xy").alias("c_x"))
    my = xy.groupBy("y").agg(F.sum("c_xy").alias("c_y"))
    n = xy.agg(F.sum("c_xy").alias("n"))
    term = (
        F.col("c_xy").cast("double") / F.col("n").cast("double")
    ) * F.log(
        (F.col("c_xy").cast("double") * F.col("n").cast("double"))
        / (F.col("c_x").cast("double") * F.col("c_y").cast("double"))
    )
    terms = (
        xy.join(F.broadcast(mx), "x")
        .join(F.broadcast(my), "y")
        .crossJoin(F.broadcast(n))
        .select(
            "n",
            F.round(term * 1000000000.0, 0).cast("long").alias("term_scaled"),
        )
    )
    return (
        terms.groupBy("n")
        .agg(F.sum("term_scaled").alias("s"))
        .select(
            F.col("n").cast("long").alias("n_events"),
            (F.col("s").cast("double") / 1000000000.0).alias("mi_nats"),
        )
    )


# --------------------------------------------------------------------------
# Incremental JOIN-view maintenance (delta-join IVM)
# --------------------------------------------------------------------------
_IVM_CUTOFF = "2000-01-01"

_IVM_ORACLE = f"""
SELECT n.n_name AS nation,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
"""


@workload("incremental_join_maintenance", oracle=_IVM_ORACLE)
def incremental_join_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of a JOIN view (delta-join IVM) — the join
    extension of C6's mergeable-aggregate maintenance: the standing
    revenue-per-nation view V = agg(orders |><| customer |><| nation) is
    updated for an orders delta by joining ONLY the delta against the
    dimensions (d(A |><| B) = dA |><| B when B is static; the symmetric
    dA |><| B union A |><| dB rule covers a two-sided delta) and merging
    partial aggregates — the base fact partition is never rescanned. The
    oracle is the full recompute the maintained view must equal exactly
    (DECIMAL partials keep the merge order-independent)."""
    from sample_data_pipeline_project_spark.operators.incremental import (
        merge_partial_aggs,
    )

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_nationkey"
    )
    n = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nationkey"), F.col("n_name").alias("nation")
    )
    cutoff = F.lit(_IVM_CUTOFF).cast("date")

    def view_partial(fact: DataFrame) -> DataFrame:
        return (
            fact.join(F.broadcast(c), "o_custkey")
            .join(F.broadcast(n), "c_nationkey")
            .groupBy("nation")
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias(
                    "rev_dec"
                ),
            )
        )

    state = view_partial(o.filter(F.to_date("o_orderdate") < cutoff))
    delta = view_partial(o.filter(F.to_date("o_orderdate") >= cutoff))
    merged = merge_partial_aggs(
        state, delta, key_cols=["nation"], sum_cols=["n_orders", "rev_dec"]
    )
    return merged.select(
        "nation",
        F.col("n_orders").cast("long"),
        F.col("rev_dec").cast("double").alias("revenue"),
    )


# --------------------------------------------------------------------------
# Chi-square statistic of independence: event_type vs weekday
# --------------------------------------------------------------------------
# (O - E)^2 / E with E = c_x*c_y/n, written once and reused verbatim:
# numerator and denominator stay in exact integer cross-products as long
# as possible ((n*O - cx*cy)^2 / (n * cx * cy), all int64-exact at the
# contingency-cell level), one double division per cell, then the
# scaled-integer term sum.
_CHI2_TERM = (
    "(CAST(n AS DOUBLE) * CAST(c_xy AS DOUBLE)"
    " - CAST(c_x AS DOUBLE) * CAST(c_y AS DOUBLE))"
    " * (CAST(n AS DOUBLE) * CAST(c_xy AS DOUBLE)"
    " - CAST(c_x AS DOUBLE) * CAST(c_y AS DOUBLE))"
    " / (CAST(n AS DOUBLE) * CAST(c_x AS DOUBLE) * CAST(c_y AS DOUBLE))"
)

_CHI2_ORACLE = f"""
WITH e AS (
  SELECT event_type AS x,
         date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) % 7 AS y
  FROM events
),
xy AS (SELECT x, y, COUNT(*) AS c_xy FROM e GROUP BY x, y),
mx AS (SELECT x, SUM(c_xy) AS c_x FROM xy GROUP BY x),
my AS (SELECT y, SUM(c_xy) AS c_y FROM xy GROUP BY y),
n AS (SELECT SUM(c_xy) AS n FROM xy),
terms AS (
  SELECT CAST(ROUND({_CHI2_TERM} * 1000000000.0, 0) AS BIGINT) AS term_scaled,
         n.n
  FROM xy JOIN mx ON xy.x = mx.x JOIN my ON xy.y = my.y CROSS JOIN n
),
cells AS (SELECT COUNT(*) AS n_cells FROM xy)
SELECT CAST(t.n AS BIGINT) AS n_events,
       CAST(c.n_cells AS BIGINT) AS n_cells,
       CAST(SUM(t.term_scaled) AS DOUBLE) / 1000000000.0 AS chi2
FROM terms t CROSS JOIN cells c
GROUP BY t.n, c.n_cells
"""


@workload("stats_chi_square_type_dow", oracle=_CHI2_ORACLE)
def stats_chi_square_type_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHI-SQUARE statistic of independence over the same event-type x
    weekday contingency table as the MI screen (C92) — the classical
    test-statistic form of the dependence question ((O-E)^2/E summed
    over cells). The per-cell term is algebraically rearranged to
    (n*O - cx*cy)^2 / (n*cx*cy) so every operand is an exact integer
    cross-product before the single division; cross-cell reduction uses
    the scaled-integer term sum. One row out at any scale (the cell
    count rides along as the degrees-of-freedom ingredient)."""
    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        F.col("event_type").alias("x"),
        F.pmod(
            F.datediff(
                F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")
            ),
            F.lit(7),
        ).cast("long").alias("y"),
    )
    xy = e.groupBy("x", "y").agg(F.count(F.lit(1)).alias("c_xy"))
    mx = xy.groupBy("x").agg(F.sum("c_xy").alias("c_x"))
    my = xy.groupBy("y").agg(F.sum("c_xy").alias("c_y"))
    n = xy.agg(F.sum("c_xy").alias("n"))
    cells = xy.agg(F.count(F.lit(1)).alias("n_cells"))
    dev = (
        F.col("n").cast("double") * F.col("c_xy").cast("double")
        - F.col("c_x").cast("double") * F.col("c_y").cast("double")
    )
    term = dev * dev / (
        F.col("n").cast("double")
        * F.col("c_x").cast("double")
        * F.col("c_y").cast("double")
    )
    terms = (
        xy.join(F.broadcast(mx), "x")
        .join(F.broadcast(my), "y")
        .crossJoin(F.broadcast(n))
        .select(
            "n",
            F.round(term * 1000000000.0, 0).cast("long").alias("term_scaled"),
        )
    )
    return (
        terms.crossJoin(F.broadcast(cells))
        .groupBy("n", "n_cells")
        .agg(F.sum("term_scaled").alias("s"))
        .select(
            F.col("n").cast("long").alias("n_events"),
            F.col("n_cells").cast("long").alias("n_cells"),
            (F.col("s").cast("double") / 1000000000.0).alias("chi2"),
        )
    )


# --------------------------------------------------------------------------
# Gini concentration of order value within each customer segment
# --------------------------------------------------------------------------
_GINI_DOLLARS = (
    "CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
    " // 100 AS BIGINT)"
)

_GINI_ORACLE = f"""
WITH pts AS (
  SELECT c.c_mktsegment AS segment, {_GINI_DOLLARS} AS v
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
),
vc AS (SELECT segment, v, COUNT(*) AS m FROM pts GROUP BY segment, v),
vr AS (
  SELECT segment, v, m,
         2 * COALESCE(SUM(m) OVER (PARTITION BY segment ORDER BY v
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         + m + 1 AS r2
  FROM vc
),
s AS (
  SELECT segment, SUM(m) AS n, SUM(m * v) AS total,
         SUM(m * r2 * v) AS nsum
  FROM vr GROUP BY segment
)
SELECT segment, CAST(n AS BIGINT) AS n_orders,
       CAST(total AS BIGINT) AS total_dollars,
       CAST(nsum AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(total AS DOUBLE))
       - CAST(n + 1 AS DOUBLE) / CAST(n AS DOUBLE) AS gini
FROM s
"""


@workload("stats_gini_revenue_by_segment", oracle=_GINI_ORACLE)
def stats_gini_revenue_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GINI concentration of order value per customer segment — the
    inequality screen ("is revenue dominated by a few whale orders")
    behind sampling and skew decisions. Uses the C90 analytic-rank
    machinery: average ranks from per-value counts (r2 = twice the
    average rank, exact int), so G = sum(m*r2*v)/(n*total) - (n+1)/n is
    exact integer sufficient statistics under two final divisions —
    no per-row window (the rank window rides per-segment DISTINCT
    dollar values; sum(m*r2*v) peaks ~3e18 at sf1 in floor-dollars;
    switch the partial to DECIMAL beyond that)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"),
        F.col("c_mktsegment").alias("segment"),
    )
    pts = o.join(F.broadcast(c), "o_custkey").select(
        "segment",
        ((F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long") / 100)
        .cast("long")
        .alias("v"),
    )
    vc = pts.groupBy("segment", "v").agg(F.count(F.lit(1)).alias("m"))
    w = (
        Window.partitionBy("segment")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    vr = vc.select(
        "segment",
        "v",
        "m",
        (2 * F.coalesce(F.sum("m").over(w), F.lit(0)) + F.col("m") + 1).alias(
            "r2"
        ),
    )
    s = vr.groupBy("segment").agg(
        F.sum("m").alias("n"),
        F.sum(F.col("m") * F.col("v")).alias("total"),
        F.sum(F.col("m") * F.col("r2") * F.col("v")).alias("nsum"),
    )
    gini = F.col("nsum").cast("double") / (
        F.col("n").cast("double") * F.col("total").cast("double")
    ) - (F.col("n") + 1).cast("double") / F.col("n").cast("double")
    return s.select(
        "segment",
        F.col("n").cast("long").alias("n_orders"),
        F.col("total").cast("long").alias("total_dollars"),
        gini.alias("gini"),
    )


# --------------------------------------------------------------------------
# Exact interpolated percentile (percentile_cont) — distributed order stats
# --------------------------------------------------------------------------
_PCONT_PS = ("0.25", "0.5", "0.9")  # repr strings: literal-parse portable

_PCONT_CENTS = "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"

_PCONT_ORACLE = f"""
WITH ranked AS (
  SELECT {_PCONT_CENTS} AS v,
         ROW_NUMBER() OVER (ORDER BY {_PCONT_CENTS}, o_orderkey) AS rn
  FROM orders
),
nn AS (SELECT COUNT(*) AS n FROM orders),
ps AS (
  SELECT p, CAST(nn.n - 1 AS DOUBLE) * p AS h, nn.n AS n
  FROM (VALUES {", ".join(f"(CAST('{p}' AS DOUBLE))" for p in _PCONT_PS)})
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
         AS pcont_cents
FROM t
JOIN ranked lo ON lo.rn = t.lo_rn
JOIN ranked hi ON hi.rn = t.hi_rn
"""


@workload("percentile_cont_exact", oracle=_PCONT_ORACLE)
def percentile_cont_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT PERCENTILE_CONT (linear interpolation between the two
    adjacent order statistics at h = (n-1)*p) computed DISTRIBUTED via
    the C4 bucketed-global-rank machinery — value-range buckets + offset
    ranks, no global window, no single-partition sort; only the two rows
    at each target rank survive to the driver-free interpolation. The
    fractional weight is bound identically on both engines (Python
    computes h = (n-1)*p with the same two IEEE doubles DuckDB multiplies;
    frac rides as a repr literal in Spark and as h - FLOOR(h) in SQL),
    and lo/hi are exact integer cents, so the single interpolation
    expression is bit-identical cross-engine."""
    import math

    from sample_data_pipeline_project_spark.operators.ranks import (
        bucketed_global_rank,
    )

    o = load_table(spark, sf_dir, "orders").select(
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("v"),
        "o_orderkey",
    )
    ranked, n = bucketed_global_rank(o, "v", ["o_orderkey"])
    rows = []
    for p_str in _PCONT_PS:
        p = float(p_str)
        h = float(n - 1) * p
        lo_rn = int(math.floor(h)) + 1
        hi_rn = lo_rn + (0 if h == math.floor(h) else 1)
        rows.append((p, n, lo_rn, hi_rn, h - math.floor(h)))
    targets = spark.createDataFrame(
        rows, "p double, n long, lo_rn long, hi_rn long, frac double"
    )
    lo = ranked.select(F.col("rn").alias("lo_rn"), F.col("v").alias("lo_v"))
    hi = ranked.select(F.col("rn").alias("hi_rn"), F.col("v").alias("hi_v"))
    return (
        F.broadcast(targets)
        .join(lo, "lo_rn")
        .join(hi, "hi_rn")
        .select(
            "p",
            F.col("n").cast("long"),
            (
                F.col("lo_v").cast("double")
                + (F.col("hi_v").cast("double") - F.col("lo_v").cast("double"))
                * F.col("frac")
            ).alias("pcont_cents"),
        )
    )


# --------------------------------------------------------------------------
# Two-sample Kolmogorov-Smirnov distance between ingestion cohorts
# --------------------------------------------------------------------------
_KS_BUCKET = 64  # n_chars DIV 64: fixed arithmetic buckets for the cumsum

_KS_ORACLE = """
WITH pts AS (
  SELECT CAST(substr(source, 4) AS BIGINT) % 2 AS grp, n_chars AS v
  FROM documents
),
cells AS (
  SELECT v,
         SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS m0,
         SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS m1
  FROM pts GROUP BY v
),
n AS (SELECT SUM(m0) AS n0, SUM(m1) AS n1 FROM cells),
cum AS (
  SELECT v,
         SUM(m0) OVER (ORDER BY v
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS c0,
         SUM(m1) OVER (ORDER BY v
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS c1
  FROM cells
),
dev AS (
  SELECT v, ABS(c0 * n.n1 - c1 * n.n0) AS d_scaled FROM cum CROSS JOIN n
),
best AS (SELECT MAX(d_scaled) AS mx FROM dev)
SELECT CAST(n.n0 AS BIGINT) AS n0, CAST(n.n1 AS BIGINT) AS n1,
       CAST(best.mx AS BIGINT) AS d_scaled,
       CAST(best.mx AS DOUBLE)
       / (CAST(n.n0 AS DOUBLE) * CAST(n.n1 AS DOUBLE)) AS ks_d,
       CAST((SELECT MIN(v) FROM dev WHERE d_scaled = best.mx) AS BIGINT)
         AS first_v_at_max
FROM n CROSS JOIN best
"""


@workload("stats_ks_doclen_cohorts", oracle=_KS_ORACLE)
def stats_ks_doclen_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample KOLMOGOROV-SMIRNOV distance between the document-length
    distributions of two ingestion cohorts (even- vs odd-numbered
    sources) — the nonparametric "did pipeline B's shards drift from
    pipeline A's" detector, EXACT: D = max_v |F0(v) - F1(v)| maximized as
    the all-integer |c0*n1 - c1*n0| cross-product with one final
    division. The cumulative counts use the PARTITIONED CUMSUM pattern
    (the C4 rank machinery applied to sums): fixed-arithmetic value
    buckets, per-bucket totals collected once (domain/64-bounded), then
    within-bucket running sums over BUCKET-PARTITIONED windows offset by
    the lower buckets — no single-partition window anywhere on the Spark
    side (the oracle may use the plain global window; DuckDB is
    single-node). Argmax v is the earliest, a MIN under the max join."""
    d = load_table(spark, sf_dir, "documents")
    pts = d.select(
        (F.substring("source", 4, 10).cast("long") % 2).alias("grp"),
        F.col("n_chars").alias("v"),
    )
    cells = pts.groupBy("v").agg(
        F.sum(F.when(F.col("grp") == 0, 1).otherwise(0)).alias("m0"),
        F.sum(F.when(F.col("grp") == 1, 1).otherwise(0)).alias("m1"),
    )
    cells = cells.withColumn("bkt", (F.col("v") / _KS_BUCKET).cast("long"))
    # per-bucket totals -> exclusive prefix offsets (bounded collect:
    # one row per occupied bucket, domain/_KS_BUCKET rows total)
    btotals = sorted(
        cells.groupBy("bkt")
        .agg(F.sum("m0").alias("t0"), F.sum("m1").alias("t1"))
        .collect(),
        key=lambda r: r["bkt"],
    )
    offs, acc0, acc1 = [], 0, 0
    for r in btotals:
        offs.append((r["bkt"], acc0, acc1))
        acc0 += r["t0"]
        acc1 += r["t1"]
    n0, n1 = acc0, acc1
    off_df = F.broadcast(
        cells.sparkSession.createDataFrame(
            offs or [(0, 0, 0)], "bkt long, off0 long, off1 long"
        )
    )
    from pyspark.sql.window import Window as W

    w = (
        W.partitionBy("bkt")
        .orderBy("v")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum = (
        cells.join(off_df, "bkt")
        .select(
            "v",
            (F.sum("m0").over(w) + F.col("off0")).alias("c0"),
            (F.sum("m1").over(w) + F.col("off1")).alias("c1"),
        )
    )
    dev = cum.select(
        "v",
        F.abs(F.col("c0") * F.lit(n1) - F.col("c1") * F.lit(n0)).alias(
            "d_scaled"
        ),
    )
    best = dev.agg(F.max("d_scaled").alias("mx"))
    first_v = (
        dev.join(F.broadcast(best), dev["d_scaled"] == best["mx"])
        .agg(F.min("v").alias("first_v_at_max"))
    )
    return (
        best.crossJoin(F.broadcast(first_v))
        .select(
            F.lit(n0).cast("long").alias("n0"),
            F.lit(n1).cast("long").alias("n1"),
            F.col("mx").cast("long").alias("d_scaled"),
            (
                F.col("mx").cast("double")
                / (F.lit(n0).cast("double") * F.lit(n1).cast("double"))
            ).alias("ks_d"),
            F.col("first_v_at_max").cast("long"),
        )
    )


# --------------------------------------------------------------------------
# Winsorized mean per segment (robust mean with exact per-group quantiles)
# --------------------------------------------------------------------------
_WINS_LO_PCT = 5  # clamp below the 5th percentile
_WINS_HI_PCT = 95

_WINS_ORACLE = f"""
WITH pts AS (
  SELECT c.c_mktsegment AS segment, {_GINI_DOLLARS} AS v
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
),
cells AS (SELECT segment, v, COUNT(*) AS m FROM pts GROUP BY segment, v),
cum AS (
  SELECT segment, v, m,
         SUM(m) OVER (PARTITION BY segment ORDER BY v
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS c
  FROM cells
),
n AS (SELECT segment, SUM(m) AS n FROM cells GROUP BY segment),
bounds AS (
  SELECT cum.segment,
         MIN(CASE WHEN cum.c * 100 >= n.n * {_WINS_LO_PCT}
                  THEN cum.v END) AS lo,
         MIN(CASE WHEN cum.c * 100 >= n.n * {_WINS_HI_PCT}
                  THEN cum.v END) AS hi
  FROM cum JOIN n ON cum.segment = n.segment
  GROUP BY cum.segment
)
SELECT b.segment, CAST(n.n AS BIGINT) AS n_orders,
       CAST(b.lo AS BIGINT) AS lo_dollars, CAST(b.hi AS BIGINT) AS hi_dollars,
       CAST(SUM(cl.m * LEAST(GREATEST(cl.v, b.lo), b.hi)) AS DOUBLE)
       / CAST(n.n AS DOUBLE) AS winsorized_mean
FROM cells cl
JOIN bounds b ON cl.segment = b.segment
JOIN n ON cl.segment = n.segment
GROUP BY b.segment, n.n, b.lo, b.hi
"""


@workload("stats_winsorized_mean_by_segment", oracle=_WINS_ORACLE)
def stats_winsorized_mean_by_segment(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """WINSORIZED MEAN per segment — the robust average (clamp order
    values into [P5, P95] before averaging) that whale orders can't
    drag. Per-group EXACT percentile bounds come from cumulative counts
    over per-segment DISTINCT dollar values (group-partitioned windows,
    value-domain-bounded rows — never raw orders); the bound predicate
    cum*100 >= n*pct is all-integer, the clamp is LEAST/GREATEST over
    exact ints, and the single division lands last. One shuffle keyed
    (segment, v), then segment-keyed joins on 5-row tables."""
    from pyspark.sql.window import Window as W

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"),
        F.col("c_mktsegment").alias("segment"),
    )
    pts = o.join(F.broadcast(c), "o_custkey").select(
        "segment",
        ((F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long") / 100)
        .cast("long")
        .alias("v"),
    )
    cells = pts.groupBy("segment", "v").agg(F.count(F.lit(1)).alias("m"))
    w = (
        W.partitionBy("segment")
        .orderBy("v")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum = cells.select("segment", "v", "m", F.sum("m").over(w).alias("c"))
    n = cells.groupBy("segment").agg(F.sum("m").alias("n"))
    bounds = (
        cum.join(F.broadcast(n), "segment")
        .groupBy("segment")
        .agg(
            F.min(
                F.when(
                    F.col("c") * 100 >= F.col("n") * _WINS_LO_PCT, F.col("v")
                )
            ).alias("lo"),
            F.min(
                F.when(
                    F.col("c") * 100 >= F.col("n") * _WINS_HI_PCT, F.col("v")
                )
            ).alias("hi"),
        )
    )
    clamped = (
        cells.join(F.broadcast(bounds), "segment")
        .join(F.broadcast(n), "segment")
        .groupBy("segment", "n", "lo", "hi")
        .agg(
            F.sum(
                F.col("m")
                * F.least(F.greatest(F.col("v"), F.col("lo")), F.col("hi"))
            ).alias("wsum")
        )
    )
    return clamped.select(
        "segment",
        F.col("n").cast("long").alias("n_orders"),
        F.col("lo").cast("long").alias("lo_dollars"),
        F.col("hi").cast("long").alias("hi_dollars"),
        (F.col("wsum").cast("double") / F.col("n").cast("double")).alias(
            "winsorized_mean"
        ),
    )


# --------------------------------------------------------------------------
# RFM customer segmentation (per-nation quartiles, deterministic NTILE)
# --------------------------------------------------------------------------
_RFM_ANCHOR = "2001-09-01"  # fixed as-of date (after the data's max date)

_RFM_ORACLE = f"""
WITH base AS (
  SELECT o_custkey AS custkey,
         date_diff('day', CAST(MAX(o_orderdate) AS DATE),
                   DATE '{_RFM_ANCHOR}') AS recency_days,
         COUNT(*) AS frequency,
         SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
           AS monetary_cents
  FROM orders GROUP BY o_custkey
),
dim AS (SELECT c_custkey AS custkey, c_nationkey AS nk FROM customer),
j AS (SELECT b.*, d.nk FROM base b JOIN dim d ON b.custkey = d.custkey),
q AS (
  SELECT custkey, nk, recency_days, frequency, monetary_cents,
         NTILE(4) OVER (PARTITION BY nk
                        ORDER BY recency_days ASC, custkey ASC) AS r_q,
         NTILE(4) OVER (PARTITION BY nk
                        ORDER BY frequency DESC, custkey ASC) AS f_q,
         NTILE(4) OVER (PARTITION BY nk
                        ORDER BY monetary_cents DESC, custkey ASC) AS m_q
  FROM j
)
SELECT custkey, CAST(recency_days AS BIGINT) AS recency_days,
       CAST(frequency AS BIGINT) AS frequency,
       CAST(monetary_cents AS BIGINT) AS monetary_cents,
       CAST(r_q AS INTEGER) AS r_q, CAST(f_q AS INTEGER) AS f_q,
       CAST(m_q AS INTEGER) AS m_q,
       CAST(r_q * 100 + f_q * 10 + m_q AS INTEGER) AS rfm_code
FROM q
"""


@workload("rfm_customer_segmentation", oracle=_RFM_ORACLE)
def rfm_customer_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM SEGMENTATION — recency / frequency / monetary quartile codes
    per customer, normalized WITHIN nation (per-market quartiles, which
    also keeps every NTILE window nation-partitioned over customer-
    -bounded rows — never a global sort). Quartile 1 is best on each
    axis (most recent, most frequent, highest spend). NTILE is made
    deterministic by the unique custkey tiebreak (the C63 rule); recency
    anchors to a FIXED as-of date so the metric is reproducible. One
    orders aggregate, a broadcast dim join, three windows over the same
    partitioning — single shuffle."""
    from pyspark.sql.window import Window as W

    o = load_table(spark, sf_dir, "orders")
    base = o.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.datediff(
            F.lit(_RFM_ANCHOR).cast("date"),
            F.max(F.col("o_orderdate").cast("date")),
        )
        .cast("long")
        .alias("recency_days"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(
            (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
        ).alias("monetary_cents"),
    )
    dim = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey"), F.col("c_nationkey").alias("nk")
    )
    j = base.join(F.broadcast(dim), "custkey")
    r_q = F.ntile(4).over(
        W.partitionBy("nk").orderBy(F.col("recency_days").asc(), F.col("custkey").asc())
    )
    f_q = F.ntile(4).over(
        W.partitionBy("nk").orderBy(F.col("frequency").desc(), F.col("custkey").asc())
    )
    m_q = F.ntile(4).over(
        W.partitionBy("nk").orderBy(
            F.col("monetary_cents").desc(), F.col("custkey").asc()
        )
    )
    q = j.select(
        "custkey",
        F.col("recency_days").cast("long"),
        F.col("frequency").cast("long"),
        F.col("monetary_cents").cast("long"),
        r_q.cast("int").alias("r_q"),
        f_q.cast("int").alias("f_q"),
        m_q.cast("int").alias("m_q"),
    )
    return q.withColumn(
        "rfm_code",
        (F.col("r_q") * 100 + F.col("f_q") * 10 + F.col("m_q")).cast("int"),
    )


# --------------------------------------------------------------------------
# Cohort LTV curve: cumulative revenue by signup cohort x age
# --------------------------------------------------------------------------
_LTV_ORACLE = """
WITH firsts AS (
  SELECT o_custkey, CAST(date_trunc('month', MIN(o_orderdate)) AS DATE) AS cohort_month
  FROM orders GROUP BY o_custkey
),
rev AS (
  SELECT f.cohort_month,
         CAST(date_diff('month', f.cohort_month,
              date_trunc('month', o.o_orderdate)) AS BIGINT) AS age_months,
         SUM(CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
           AS rev_cents
  FROM orders o JOIN firsts f ON o.o_custkey = f.o_custkey
  GROUP BY 1, 2
),
sizes AS (
  SELECT cohort_month, COUNT(*) AS cohort_users
  FROM firsts GROUP BY cohort_month
)
SELECT r.cohort_month, r.age_months,
       CAST(s.cohort_users AS BIGINT) AS cohort_users,
       CAST(SUM(r.rev_cents) OVER (PARTITION BY r.cohort_month
            ORDER BY r.age_months
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cum_rev_cents
FROM rev r JOIN sizes s ON r.cohort_month = s.cohort_month
"""


@workload("cohort_ltv_curve", oracle=_LTV_ORACLE)
def cohort_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COHORT LTV CURVE — cumulative revenue per signup cohort by account
    age in months (the monetary twin of the C-retention matrix): how
    much has each cohort spent by month k of its life. First-order
    cohorting is one keyed MIN; the cumulative window rides
    (cohort-month)-partitioned, calendar-bounded (cohort x age) rows,
    never raw orders; revenue stays exact integer cents end-to-end."""
    from pyspark.sql.window import Window as W

    o = load_table(spark, sf_dir, "orders")
    firsts = o.groupBy("o_custkey").agg(
        F.to_date(F.date_trunc("month", F.min("o_orderdate"))).alias(
            "cohort_month"
        )
    )
    rev = (
        o.join(firsts, "o_custkey")
        .select(
            "cohort_month",
            (
                (F.year(F.date_trunc("month", "o_orderdate")) - F.year("cohort_month"))
                * 12
                + (
                    F.month(F.date_trunc("month", "o_orderdate"))
                    - F.month("cohort_month")
                )
            )
            .cast("long")
            .alias("age_months"),
            (F.col("o_totalprice").cast("decimal(18,2)") * 100)
            .cast("long")
            .alias("cents"),
        )
        .groupBy("cohort_month", "age_months")
        .agg(F.sum("cents").alias("rev_cents"))
    )
    sizes = firsts.groupBy("cohort_month").agg(
        F.count(F.lit(1)).alias("cohort_users")
    )
    w = (
        W.partitionBy("cohort_month")
        .orderBy("age_months")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        rev.join(F.broadcast(sizes), "cohort_month")
        .select(
            "cohort_month",
            "age_months",
            F.col("cohort_users").cast("long"),
            F.sum("rev_cents").over(w).cast("long").alias("cum_rev_cents"),
        )
    )


# --------------------------------------------------------------------------
# Largest-remainder (Hamilton) proportional allocation
# --------------------------------------------------------------------------
_ALLOC_TOTAL = 1_000_000  # units to allocate per nation


_ALLOC_ORACLE = f"""
WITH rev AS (
  SELECT c.c_nationkey AS nk, c.c_mktsegment AS segment,
         SUM(CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
           AS seg_cents
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2
),
tot AS (SELECT nk, SUM(seg_cents) AS nation_cents FROM rev GROUP BY nk),
q AS (
  SELECT r.nk, r.segment, r.seg_cents, t.nation_cents,
         (r.seg_cents * {_ALLOC_TOTAL}) // t.nation_cents AS floor_units,
         (r.seg_cents * {_ALLOC_TOTAL}) % t.nation_cents AS remainder
  FROM rev r JOIN tot t ON r.nk = t.nk
),
short AS (
  SELECT nk, {_ALLOC_TOTAL} - SUM(floor_units) AS missing FROM q GROUP BY nk
),
ranked AS (
  SELECT q.*, s.missing,
         ROW_NUMBER() OVER (PARTITION BY q.nk
                            ORDER BY q.remainder DESC, q.segment ASC) AS rr
  FROM q JOIN short s ON q.nk = s.nk
)
SELECT CAST(nk AS BIGINT) AS nk, segment,
       CAST(seg_cents AS BIGINT) AS seg_cents,
       CAST(floor_units + CASE WHEN rr <= missing THEN 1 ELSE 0 END
            AS BIGINT) AS allocated_units
FROM ranked
"""


@workload("alloc_largest_remainder", oracle=_ALLOC_ORACLE)
def alloc_largest_remainder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LARGEST-REMAINDER (Hamilton) ALLOCATION: distribute a fixed unit
    budget across each nation's segments proportionally to revenue such
    that the integer allocations sum EXACTLY to the budget — the
    apportionment algorithm every financial allocation / quota system
    needs (naive rounding over- or under-shoots). All arithmetic is
    exact integers: floor quota = (seg*T) DIV total, remainder =
    (seg*T) MOD total, and the missing units go to the largest
    remainders (segment-name tiebreak) via a nation-partitioned rank
    over <= |segments| rows per nation. seg_cents*T peaks ~1e13 * 1e6 =
    overflow? No: seg_cents <= ~5e10 at sf0.1 per (nation, segment), x
    1e6 = 5e16 — int64-safe through sf10."""
    from pyspark.sql.window import Window as W

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"),
        F.col("c_nationkey").alias("nk"),
        F.col("c_mktsegment").alias("segment"),
    )
    rev = (
        o.join(F.broadcast(c), "o_custkey")
        .groupBy("nk", "segment")
        .agg(
            F.sum(
                (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
            ).alias("seg_cents")
        )
    )
    tot = rev.groupBy("nk").agg(F.sum("seg_cents").alias("nation_cents"))
    q = rev.join(F.broadcast(tot), "nk").select(
        "nk",
        "segment",
        "seg_cents",
        # integer DIV, not float-divide-then-cast: seg_cents*T exceeds
        # 2^53 at scale, where double division could misplace the floor
        F.expr(f"seg_cents * {_ALLOC_TOTAL} DIV nation_cents")
        .cast("long")
        .alias("floor_units"),
        ((F.col("seg_cents") * _ALLOC_TOTAL) % F.col("nation_cents")).alias(
            "remainder"
        ),
    )
    short = q.groupBy("nk").agg(
        (F.lit(_ALLOC_TOTAL) - F.sum("floor_units")).alias("missing")
    )
    w = W.partitionBy("nk").orderBy(
        F.col("remainder").desc(), F.col("segment").asc()
    )
    ranked = q.join(F.broadcast(short), "nk").withColumn(
        "rr", F.row_number().over(w)
    )
    return ranked.select(
        F.col("nk").cast("long"),
        "segment",
        F.col("seg_cents").cast("long"),
        (
            F.col("floor_units")
            + F.when(F.col("rr") <= F.col("missing"), 1).otherwise(0)
        )
        .cast("long")
        .alias("allocated_units"),
    )


# --------------------------------------------------------------------------
# Two-proportion z-test (conversion-rate A/B)
# --------------------------------------------------------------------------
_ZT_WINDOW_DAYS = 2

_ZT_ORACLE = f"""
WITH u AS (
  SELECT user_id, user_id % 2 AS grp,
         MIN(CAST(ts AS DATE)) AS first_ev,
         MIN(CASE WHEN event_type = 'purchase' THEN CAST(ts AS DATE) END)
           AS first_buy
  FROM events GROUP BY user_id
),
conv AS (
  SELECT grp, COUNT(*) AS n,
         SUM(CASE WHEN date_diff('day', first_ev, first_buy)
                       <= {_ZT_WINDOW_DAYS} THEN 1 ELSE 0 END) AS x
  FROM u GROUP BY grp
),
w AS (
  SELECT a.n AS n_a, a.x AS x_a, b.n AS n_b, b.x AS x_b
  FROM conv a JOIN conv b ON a.grp = 0 AND b.grp = 1
)
SELECT CAST(n_a AS BIGINT) AS n_a, CAST(x_a AS BIGINT) AS x_a,
       CAST(n_b AS BIGINT) AS n_b, CAST(x_b AS BIGINT) AS x_b,
       (CAST(x_a AS DOUBLE) / CAST(n_a AS DOUBLE)
        - CAST(x_b AS DOUBLE) / CAST(n_b AS DOUBLE))
       / SQRT((CAST(x_a + x_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
              * (1.0 - CAST(x_a + x_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
              * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE)))
         AS z_stat
FROM w
"""


@workload("stats_two_proportion_ztest", oracle=_ZT_ORACLE)
def stats_two_proportion_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TWO-PROPORTION Z-TEST — the conversion-rate A/B significance twin
    of the Welch t-test (C85): did cohort A (even user ids) convert
    (first purchase within {w} days of first activity) at a different
    rate than cohort B. Counts are exact integers from ONE user-level
    aggregate; the pooled-proportion z statistic is a single
    identical-textual-order float expression over the 2-row result."""
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("first_ev"),
        F.min(
            F.when(
                F.col("event_type") == "purchase", F.col("ts").cast("date")
            )
        ).alias("first_buy"),
    )
    conv = (
        u.select(
            (F.col("user_id") % 2).alias("grp"),
            F.when(
                F.datediff("first_buy", "first_ev") <= _ZT_WINDOW_DAYS, 1
            )
            .otherwise(0)
            .alias("converted"),
        )
        .groupBy("grp")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("converted").alias("x"))
    )
    a = conv.filter(F.col("grp") == 0).alias("a")
    b = conv.filter(F.col("grp") == 1).alias("b")
    w = a.crossJoin(F.broadcast(b)).select(
        F.col("a.n").alias("n_a"),
        F.col("a.x").alias("x_a"),
        F.col("b.n").alias("n_b"),
        F.col("b.x").alias("x_b"),
    )
    p_pool = (F.col("x_a") + F.col("x_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    ).cast("double")
    z = (
        F.col("x_a").cast("double") / F.col("n_a").cast("double")
        - F.col("x_b").cast("double") / F.col("n_b").cast("double")
    ) / F.sqrt(
        p_pool
        * (F.lit(1.0) - p_pool)
        * (
            F.lit(1.0) / F.col("n_a").cast("double")
            + F.lit(1.0) / F.col("n_b").cast("double")
        )
    )
    return w.select(
        F.col("n_a").cast("long"),
        F.col("x_a").cast("long"),
        F.col("n_b").cast("long"),
        F.col("x_b").cast("long"),
        z.alias("z_stat"),
    )


# --------------------------------------------------------------------------
# Kaplan-Meier survival curve: time to first purchase, right-censored
# --------------------------------------------------------------------------
_KM_WINDOW = 7  # censor horizon (days): the time domain is CONSTANT 0..7

_KM_ORACLE = f"""
WITH u AS (
  SELECT user_id,
         MIN(CAST(ts AS DATE)) AS first_ev,
         MIN(CASE WHEN event_type = 'purchase' THEN CAST(ts AS DATE) END)
           AS first_buy
  FROM events GROUP BY user_id
),
obs AS (
  SELECT user_id,
         CASE WHEN first_buy IS NOT NULL
                   AND date_diff('day', first_ev, first_buy) <= {_KM_WINDOW}
              THEN date_diff('day', first_ev, first_buy)
              ELSE {_KM_WINDOW} END AS t,
         CASE WHEN first_buy IS NOT NULL
                   AND date_diff('day', first_ev, first_buy) <= {_KM_WINDOW}
              THEN 1 ELSE 0 END AS e
  FROM u
),
times AS (
  SELECT t, SUM(e) AS d, SUM(1 - e) AS c FROM obs GROUP BY t
),
total AS (SELECT COUNT(*) AS n FROM obs),
risk AS (
  SELECT t1.t, t1.d, t1.c,
         total.n - COALESCE((SELECT SUM(t2.d + t2.c) FROM times t2
                             WHERE t2.t < t1.t), 0) AS n_risk
  FROM times t1 CROSS JOIN total
),
terms AS (
  SELECT t, d, c, n_risk,
         CASE WHEN d >= n_risk THEN CAST(-1000000000000 AS BIGINT)
              WHEN d > 0 THEN CAST(ROUND(ln(CAST(n_risk - d AS DOUBLE)
                   / CAST(n_risk AS DOUBLE)) * 1000000000.0, 0) AS BIGINT)
              ELSE 0 END AS lnterm
  FROM risk
),
surv AS (
  SELECT t1.t, t1.d, t1.c, t1.n_risk,
         (SELECT SUM(t2.lnterm) FROM terms t2 WHERE t2.t <= t1.t) AS cumln
  FROM terms t1
)
SELECT CAST(t AS BIGINT) AS t, CAST(n_risk AS BIGINT) AS n_risk,
       CAST(d AS BIGINT) AS d, CAST(c AS BIGINT) AS c,
       ROUND(EXP(CAST(cumln AS DOUBLE) / 1000000000.0), 9) AS survival
FROM surv
"""


@workload("stats_kaplan_meier_purchase", oracle=_KM_ORACLE)
def stats_kaplan_meier_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KAPLAN-MEIER survival curve for time-to-first-purchase with RIGHT
    CENSORING at a {w}-day horizon — the product-limit estimator
    S(t) = prod_(t_i<=t) (1 - d_i/n_i) that handles users who never
    convert inside the window (censoring is what the naive conversion
    curve gets wrong). The raw stream collapses to ONE user-level
    aggregate, then everything rides the CONSTANT 0..{w} time domain:
    risk sets and the cumulative ln-sum use bounded TRIANGULAR
    self-joins (at most (w+1)^2 cells at any data scale — no window
    function at all), ln terms are scaled ints, and the final
    exp() goes through the ROUND(_, 9) libm guard."""
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("first_ev"),
        F.min(
            F.when(
                F.col("event_type") == "purchase", F.col("ts").cast("date")
            )
        ).alias("first_buy"),
    )
    days = F.datediff("first_buy", "first_ev")
    in_win = F.col("first_buy").isNotNull() & (days <= _KM_WINDOW)
    obs = u.select(
        F.when(in_win, days).otherwise(F.lit(_KM_WINDOW)).alias("t"),
        F.when(in_win, 1).otherwise(0).alias("e"),
    )
    times = obs.groupBy("t").agg(
        F.sum("e").alias("d"), F.sum(1 - F.col("e")).alias("c")
    )
    total = obs.agg(F.count(F.lit(1)).alias("n"))
    t1 = times.alias("t1")
    t2 = times.select(
        F.col("t").alias("t2t"), (F.col("d") + F.col("c")).alias("dc")
    )
    risk = (
        t1.join(F.broadcast(t2), F.col("t2t") < F.col("t1.t"), "left")
        .groupBy("t1.t", "t1.d", "t1.c")
        .agg(F.coalesce(F.sum("dc"), F.lit(0)).alias("before"))
        .crossJoin(F.broadcast(total))
        .select(
            "t", "d", "c", (F.col("n") - F.col("before")).alias("n_risk")
        )
    )
    # d == n_risk empties the risk set: S(t)=0 from here on. ln(0) would
    # error in DuckDB and NULL in Spark; instead both sides emit a scaled
    # -1000 sentinel whose exp() underflows to exactly +0.0 in IEEE
    # double on both engines (found at sf0.001 by the canon checker).
    lnterm = (
        F.when(
            F.col("d") >= F.col("n_risk"), F.lit(-1000000000000).cast("long")
        )
        .when(
            F.col("d") > 0,
            F.round(
                F.log(
                    (F.col("n_risk") - F.col("d")).cast("double")
                    / F.col("n_risk").cast("double")
                )
                * 1000000000.0,
                0,
            ).cast("long"),
        )
        .otherwise(F.lit(0).cast("long"))
    )
    terms = risk.select("t", "d", "c", "n_risk", lnterm.alias("lnterm"))
    ta = terms.alias("ta")
    tb = terms.select(F.col("t").alias("tbt"), F.col("lnterm").alias("lnb"))
    surv = (
        ta.join(F.broadcast(tb), F.col("tbt") <= F.col("ta.t"))
        .groupBy("ta.t", "ta.d", "ta.c", "ta.n_risk")
        .agg(F.sum("lnb").alias("cumln"))
    )
    return surv.select(
        F.col("t").cast("long"),
        F.col("n_risk").cast("long"),
        F.col("d").cast("long"),
        F.col("c").cast("long"),
        F.round(
            F.exp(F.col("cumln").cast("double") / 1000000000.0), 9
        ).alias("survival"),
    )


# --------------------------------------------------------------------------
# Class-centroid distance matrix over quantized embeddings
# --------------------------------------------------------------------------
_CENT_Q = 262144  # 2^18 quantization grid (the C79 Gram convention)
_CENT_SCALE = 10_000  # scaled-int sum grid for per-dim distance terms

_CENT_ORACLE = f"""
WITH q AS (
  SELECT label, d - 1 AS dim,
         CAST(FLOOR(CAST(embedding[d] AS DOUBLE) * {_CENT_Q}) AS BIGINT)
           AS qv
  FROM embeddings
  CROSS JOIN unnest(range(1, len(embedding) + 1)) AS r(d)
),
s AS (
  SELECT label, dim, SUM(qv) AS sq, COUNT(*) AS n
  FROM q GROUP BY label, dim
),
terms AS (
  SELECT a.label AS label_a, b.label AS label_b,
         CAST(ROUND(
           (CAST(a.sq * b.n - b.sq * a.n AS DOUBLE)
            / CAST(a.n * b.n AS DOUBLE))
           * (CAST(a.sq * b.n - b.sq * a.n AS DOUBLE)
              / CAST(a.n * b.n AS DOUBLE))
           / {_CENT_Q}.0 / {_CENT_Q}.0 * {_CENT_SCALE}.0, 0) AS BIGINT)
           AS term_scaled
  FROM s a JOIN s b ON a.dim = b.dim AND a.label < b.label
)
SELECT CAST(label_a AS BIGINT) AS label_a, CAST(label_b AS BIGINT) AS label_b,
       CAST(SUM(term_scaled) AS DOUBLE) / {_CENT_SCALE}.0 AS dist2
FROM terms GROUP BY label_a, label_b
"""


@workload("embedding_centroid_distances", oracle=_CENT_ORACLE)
def embedding_centroid_distances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CLASS-SEPARATION audit: pairwise squared distances between label
    centroids of the embedding table — the embedding-quality screen
    ("are classes separable at all") run before spending on ANN indexes.
    Embeddings quantize to the C79 2^18 integer grid map-side (explicit
    FLOOR on both engines — never a bare float->int cast), so per-label
    per-dim sums are EXACT ints and the centroid difference
    (sa*nb - sb*na)/(na*nb) is one controlled float division; per-dim
    terms use the scaled-integer sum. Shuffles carry (label x dim) cells
    only — |labels|*dims rows, never raw vectors."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.select(
        "label", F.posexplode("embedding").alias("dim", "x")
    ).select(
        "label",
        "dim",
        F.floor(F.col("x").cast("double") * _CENT_Q).cast("long").alias("qv"),
    )
    s = q.groupBy("label", "dim").agg(
        F.sum("qv").alias("sq"), F.count(F.lit(1)).alias("n")
    )
    a = s.alias("a")
    b = s.alias("b")
    diff = (
        F.col("a.sq") * F.col("b.n") - F.col("b.sq") * F.col("a.n")
    ).cast("double") / (F.col("a.n") * F.col("b.n")).cast("double")
    term = (
        F.round(
            diff * diff / _CENT_Q / _CENT_Q * _CENT_SCALE,
            0,
        )
        .cast("long")
        .alias("term_scaled")
    )
    terms = a.join(
        b,
        (F.col("a.dim") == F.col("b.dim"))
        & (F.col("a.label") < F.col("b.label")),
    ).select(
        F.col("a.label").alias("label_a"),
        F.col("b.label").alias("label_b"),
        term,
    )
    return (
        terms.groupBy("label_a", "label_b")
        .agg(
            (F.sum("term_scaled").cast("double") / _CENT_SCALE).alias("dist2")
        )
        .select(
            F.col("label_a").cast("long"),
            F.col("label_b").cast("long"),
            "dist2",
        )
    )


# --------------------------------------------------------------------------
# Fano-factor burstiness of daily event volume per type
# --------------------------------------------------------------------------
_FANO_ORACLE = """
WITH daily AS (
  SELECT event_type,
         date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
         COUNT(*) AS y
  FROM events GROUP BY 1, 2
),
s AS (
  SELECT event_type, COUNT(*) AS n, SUM(y) AS sy, SUM(y * y) AS syy
  FROM daily GROUP BY event_type
)
SELECT event_type, CAST(n AS BIGINT) AS n_days,
       CAST(sy AS BIGINT) AS n_events,
       ((CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
         - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))
        / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)))
       / (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)) AS fano
FROM s
"""


@workload("timeseries_fano_burstiness", oracle=_FANO_ORACLE)
def timeseries_fano_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FANO-FACTOR BURSTINESS per event type: variance-to-mean ratio of
    the daily count series — the dispersion screen that separates
    Poisson-like steady traffic (F ~ 1) from bursty/batchy arrivals
    (F >> 1) before alerting thresholds are set. One keyed daily
    aggregate, then exact int sufficient statistics (n, Sy, Syy) per
    type; sample variance and mean combine as identical-textual-order
    float expressions (the C85 pattern applied to counts)."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.select(
            "event_type",
            F.datediff(
                F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")
            )
            .cast("long")
            .alias("d"),
        )
        .groupBy("event_type", "d")
        .agg(F.count(F.lit(1)).alias("y"))
    )
    s = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("sy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    var = (
        F.col("n").cast("double") * F.col("syy").cast("double")
        - F.col("sy").cast("double") * F.col("sy").cast("double")
    ) / (F.col("n").cast("double") * (F.col("n") - 1).cast("double"))
    mean = F.col("sy").cast("double") / F.col("n").cast("double")
    return s.select(
        "event_type",
        F.col("n").cast("long").alias("n_days"),
        F.col("sy").cast("long").alias("n_events"),
        (var / mean).alias("fano"),
    )


# --------------------------------------------------------------------------
# Z-set (signed-multiplicity) incremental maintenance with retractions
# --------------------------------------------------------------------------
_ZSET_CUTOFF = "2024-01-15"
_ZSET_DEL_MOD = 10
_ZSET_DEL_RESIDUE = 3

_ZSET_ORACLE = f"""
WITH net AS (
  SELECT * FROM events
  WHERE NOT (CAST(ts AS DATE) < DATE '{_ZSET_CUTOFF}'
             AND event_id % {_ZSET_DEL_MOD} = {_ZSET_DEL_RESIDUE})
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM net GROUP BY event_type
"""


@workload("incremental_zset_maintenance", oracle=_ZSET_ORACLE)
def incremental_zset_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-SET INCREMENTAL MAINTENANCE — the RETRACTION algebra (DBSP /
    differential-dataflow style) that C6's append-only merge can't
    express: the changelog carries SIGNED multiplicities (+1 insert,
    -1 delete), and any linear aggregate is maintained by summing
    weighted contributions — deletes are just negative rows, no
    rewriting, no reprocessing of the base. Here the standing state (all
    events), a delete batch (every {m}th early event retracted), and the
    maintained view combine as ONE weighted aggregate: COUNT becomes
    SUM(w), SUM(value) becomes SUM(w * value_dec), both exact (DECIMAL
    partials). The oracle recomputes from the NET row set — equality
    proves the retraction algebra is lossless. Scale shape: changelogs
    are delta-sized; each maintenance tick is a map-side-combinable
    aggregate over the delta merged with aggregate-sized state."""
    ev = load_table(spark, sf_dir, "events")
    cutoff = F.lit(_ZSET_CUTOFF).cast("date")
    inserts = ev.select(
        "event_type",
        F.col("value").cast("decimal(18,6)").alias("v"),
        F.lit(1).alias("w"),
    )
    deletes = (
        ev.filter(
            (F.col("ts").cast("date") < cutoff)
            & (F.col("event_id") % _ZSET_DEL_MOD == _ZSET_DEL_RESIDUE)
        )
        .select(
            "event_type",
            F.col("value").cast("decimal(18,6)").alias("v"),
            F.lit(-1).alias("w"),
        )
    )
    changelog = inserts.unionByName(deletes)
    return (
        changelog.groupBy("event_type")
        .agg(
            F.sum("w").cast("long").alias("n_events"),
            F.sum(F.col("w") * F.col("v")).cast("double").alias("sum_value"),
        )
    )


# --------------------------------------------------------------------------
# Z-set JOIN maintenance: the bilinear delta rule with retractions
# --------------------------------------------------------------------------
# Deterministic change scenario:
#   orders: keys %7==3 arrive LATE (excluded from base, +1 in dO);
#           keys %7==2 are RETRACTED (-1 in dO)
#   customer: keys %5==0 MOVE to nation (nk+1)%25 (-1 old row, +1 new row)
_ZJ_ORACLE = """
WITH net_o AS (
  SELECT o_orderkey, o_custkey,
         CAST(o_totalprice AS DECIMAL(18,2)) AS price_dec
  FROM orders WHERE o_orderkey % 7 != 2
),
net_c AS (
  SELECT c_custkey,
         CASE WHEN c_custkey % 5 = 0 THEN (c_nationkey + 1) % 25
              ELSE c_nationkey END AS nk
  FROM customer
)
SELECT CAST(c.nk AS BIGINT) AS nk,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(o.price_dec) AS DOUBLE) AS revenue
FROM net_o o JOIN net_c c ON o.o_custkey = c.c_custkey
GROUP BY c.nk
"""


@workload("incremental_zset_join_maintenance", oracle=_ZJ_ORACLE)
def incremental_zset_join_maintenance(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Z-SET JOIN MAINTENANCE — the BILINEAR delta rule
    d(A |><| B) = dA |><| B + A |><| dB + dA |><| dB with signed
    multiplicities on BOTH sides (C96 covered the static-dimension
    special case; C131 the linear-aggregate case). The scenario retracts
    some orders, adds late-arriving ones, AND moves some customers to a
    new nation (a -1/+1 pair in dC); the maintained revenue-per-nation
    view is the standing view PLUS three delta-term aggregates, each
    join carrying weight w_o * w_c, merged by re-aggregating partials.
    Every term's join is delta-sized on at least one side except the
    standing view (computed once); weights make COUNT = SUM(w) and
    SUM = SUM(w * price_dec), both exact. The oracle recomputes from the
    net tables — equality proves the bilinear expansion lossless."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.col("o_totalprice").cast("decimal(18,2)").alias("price_dec"),
    )
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"),
        F.col("c_nationkey").alias("nk"),
        "c_custkey",
    )
    base_o = o.filter(F.col("o_orderkey") % 7 != 3).withColumn("wo", F.lit(1))
    d_o = (
        o.filter(F.col("o_orderkey") % 7 == 3).withColumn("wo", F.lit(1))
    ).unionByName(
        o.filter(F.col("o_orderkey") % 7 == 2).withColumn("wo", F.lit(-1))
    )
    base_c = c.select("o_custkey", "nk").withColumn("wc", F.lit(1))
    movers = c.filter(F.col("c_custkey") % 5 == 0)
    d_c = (
        movers.select("o_custkey", "nk").withColumn("wc", F.lit(-1))
    ).unionByName(
        movers.select(
            "o_custkey", ((F.col("nk") + 1) % 25).alias("nk")
        ).withColumn("wc", F.lit(1))
    )

    def term(ods: DataFrame, cds: DataFrame) -> DataFrame:
        j = ods.join(cds, "o_custkey")
        w = F.col("wo") * F.col("wc")
        return j.groupBy("nk").agg(
            F.sum(w).alias("n_orders"),
            F.sum(w.cast("decimal(18,2)") * F.col("price_dec")).alias(
                "rev_dec"
            ),
        )

    merged = (
        term(base_o, base_c)
        .unionByName(term(d_o, base_c))
        .unionByName(term(base_o, d_c))
        .unionByName(term(d_o, d_c))
        .groupBy("nk")
        .agg(
            F.sum("n_orders").alias("n_orders"),
            F.sum("rev_dec").alias("rev_dec"),
        )
        .filter(F.col("n_orders") != 0)
    )
    return merged.select(
        F.col("nk").cast("long"),
        F.col("n_orders").cast("long"),
        F.col("rev_dec").cast("double").alias("revenue"),
    )


# --------------------------------------------------------------------------
# Diversity-constrained top-k (fair ranking with a per-group quota)
# --------------------------------------------------------------------------
_FAIR_TOP = 10
_FAIR_QUOTA = 2

_FAIR_ORACLE = f"""
WITH ranked AS (
  SELECT n.n_name AS nation, o.o_orderkey,
         CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
           AS cents,
         ROW_NUMBER() OVER (
           PARTITION BY n.n_name
           ORDER BY CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100
                         AS BIGINT) DESC, o.o_orderkey ASC) AS rn
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
)
SELECT nation, o_orderkey, cents
FROM ranked WHERE rn <= {_FAIR_QUOTA}
ORDER BY cents DESC, o_orderkey ASC
LIMIT {_FAIR_TOP}
"""


@workload("window_fair_topk_quota", oracle=_FAIR_ORACLE)
def window_fair_topk_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DIVERSITY-CONSTRAINED TOP-K: the global top-{k} highest-value
    orders subject to AT MOST {q} per nation — the fair-ranking /
    result-diversification shape (leaderboards, search result dedup by
    domain, one-per-supplier quotas). Two-stage plan that scales: the
    quota filter is a nation-PARTITIONED rank (never a global window)
    that discards all but {q} rows per group map-side of the final
    ordering, and the global cut is TakeOrderedAndProject over the
    surviving |nations| x {q} rows; both stages fully tiebroken
    (cents DESC, orderkey ASC)."""
    from pyspark.sql.window import Window as W

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_nationkey"
    )
    n = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nationkey"),
        F.col("n_name").alias("nation"),
    )
    j = (
        o.join(F.broadcast(c), "o_custkey")
        .join(F.broadcast(n), "c_nationkey")
        .select(
            "nation",
            "o_orderkey",
            (F.col("o_totalprice").cast("decimal(18,2)") * 100)
            .cast("long")
            .alias("cents"),
        )
    )
    w = W.partitionBy("nation").orderBy(
        F.col("cents").desc(), F.col("o_orderkey").asc()
    )
    return (
        j.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _FAIR_QUOTA)
        .select("nation", "o_orderkey", "cents")
        .orderBy(F.col("cents").desc(), F.col("o_orderkey").asc())
        .limit(_FAIR_TOP)
    )


# --------------------------------------------------------------------------
# Deterministic epoch-shuffle plan (training-corpus shard + position map)
# --------------------------------------------------------------------------
from sample_data_pipeline_project_spark.functions.text import (  # noqa: E402
    md5_prefix_uint32_sql as _u32_sql,
)

_EPOCH_SHARDS = 8
_EPOCH_KEY = _u32_sql("CAST(doc_id AS STRING)")

_EPOCH_ORACLE = f"""
WITH keyed AS (
  SELECT doc_id,
         {_EPOCH_KEY} AS shuffle_key
  FROM documents
)
SELECT CAST(shuffle_key % {_EPOCH_SHARDS} AS BIGINT) AS shard,
       CAST(ROW_NUMBER() OVER (
         PARTITION BY shuffle_key % {_EPOCH_SHARDS}
         ORDER BY shuffle_key ASC, doc_id ASC) AS BIGINT) AS pos,
       doc_id
FROM keyed
ORDER BY shard, pos
"""


@workload("train_epoch_shuffle_plan", oracle=_EPOCH_ORACLE)
def train_epoch_shuffle_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DETERMINISTIC EPOCH SHUFFLE: assign every training document a
    pseudorandom-but-reproducible (shard, position) — the "shuffle the
    corpus between epochs" step of a training-data pipeline, seedable by
    swapping the key expression. The shuffle key is the portable md5-u32
    word (uniform over doc ids, identical in Spark SQL and DuckDB), shard
    is key % 8, and position is a shard-PARTITIONED rank ordered by
    (key, doc_id) — exactly the repartition-by-shard +
    sortWithinPartitions layout a 100 TB corpus export would use: ONE
    hash shuffle on shard, per-shard local sort, never a global window.
    Epoch 2 is the same plan keyed on md5(doc_id || ':2')."""
    docs = load_table(spark, sf_dir, "documents")
    keyed = docs.select(
        "doc_id", F.expr(_EPOCH_KEY).alias("shuffle_key")
    )
    shard = (F.col("shuffle_key") % _EPOCH_SHARDS).cast("long")
    w = Window.partitionBy(shard).orderBy(
        F.col("shuffle_key").asc(), F.col("doc_id").asc()
    )
    return keyed.select(
        shard.alias("shard"),
        F.row_number().over(w).cast("long").alias("pos"),
        "doc_id",
    ).orderBy("shard", "pos")
