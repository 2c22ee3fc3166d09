"""Round-3 analytics workloads: EWMA smoothing, BM25 ranking, z-order
layout cells, and a join-key skew diagnostic.

Determinism notes (the repo-wide cross-engine hash contract):
  - EWMA weights are embedded as `repr(float)` literals — the shortest
    round-tripping decimal, which both Spark's and DuckDB's parsers bind to
    the identical IEEE double — and the weighted sum is written in the same
    left-associative textual order on both sides, so every intermediate
    double is bit-identical.
  - BM25 goes through `ln`, whose last-ulp behavior is libm-dependent
    (JVM StrictMath vs C libm), so the score is ROUND(_, 9)ed on both
    sides before hashing/ordering — the same guard pagerank uses.
  - z-order bit interleaving is pure integer arithmetic (div/mod by powers
    of two) — exact on both engines, no float anywhere until the final
    revenue cast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sample_data_pipeline_project_spark.sources.catalog import load_table
from sample_data_pipeline_project_spark.workloads import workload

# --------------------------------------------------------------------------
# Per-user EWMA over event values — truncated-kernel exponential smoothing
# (kernel constants + SQL builder shared with the stream twin:
# functions/timeops.py)
# --------------------------------------------------------------------------
from sample_data_pipeline_project_spark.functions.timeops import (  # noqa: E402
    EWMA_LAGS as _EWMA_LAGS,
)
from sample_data_pipeline_project_spark.functions.timeops import (  # noqa: E402
    ewma_sql_exprs as _ewma_exprs,
)

_EWMA_NUM, _EWMA_DEN = _ewma_exprs("l{j}")

_EWMA_LAG_SELECT_LIST = [
    (
        "value AS l0"
        if j == 0
        else f"LAG(value, {j}) OVER "
        "(PARTITION BY user_id ORDER BY ts, event_id) AS l" + str(j)
    )
    for j in range(_EWMA_LAGS)
]
_EWMA_LAG_SELECTS = ",\n         ".join(_EWMA_LAG_SELECT_LIST)

_EWMA_ORACLE = f"""
WITH lagged AS (
  SELECT event_id, user_id, ts, value,
         {_EWMA_LAG_SELECTS}
  FROM events
)
SELECT event_id, user_id, ts, value,
       ({_EWMA_NUM}) / ({_EWMA_DEN}) AS ewma
FROM lagged
"""


@workload("timeseries_ewma", oracle=_EWMA_ORACLE)
def timeseries_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user EWMA of event values: a TRUNCATED exponential kernel over
    the last {K} observations via fixed-width LAG windows — partitioned by
    user (no global sort), constant state per row, the renormalized form
    sum(w_j x_(t-j)) / sum(w_j available). The fixed-width-kernel framing
    is what makes exponential smoothing a scale-safe window op instead of
    an unbounded recursive scan."""
    ev = load_table(spark, sf_dir, "events")
    lagged = ev.selectExpr(
        "event_id", "user_id", "ts", "value", *_EWMA_LAG_SELECT_LIST
    )
    return lagged.selectExpr(
        "event_id",
        "user_id",
        "ts",
        "value",
        f"({_EWMA_NUM}) / ({_EWMA_DEN}) AS ewma",
    )


# --------------------------------------------------------------------------
# BM25 full-text ranking for a fixed query
# --------------------------------------------------------------------------
_BM25_TERMS = ("spark", "join", "window")
_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_TOP = 20

_TERMS_SQL = ", ".join(f"'{t}'" for t in _BM25_TERMS)

_BM25_ORACLE = f"""
WITH docs AS (
  SELECT doc_id,
         string_split_regex(lower(trim(text)), '\\s+') AS toks
  FROM documents
),
dl AS (
  SELECT doc_id, len(toks) AS dl FROM docs
),
stats AS (
  SELECT COUNT(*) AS n_docs, SUM(dl) AS total_tok FROM dl
),
tf AS (
  SELECT doc_id, tok AS term, COUNT(*) AS tf
  FROM (SELECT doc_id, unnest(toks) AS tok FROM docs)
  WHERE tok IN ({_TERMS_SQL})
  GROUP BY doc_id, tok
),
df AS (
  SELECT term, COUNT(*) AS df FROM tf GROUP BY term
),
scored AS (
  SELECT tf.doc_id,
         SUM(
           ln((s.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
           * (tf.tf * ({_BM25_K1} + 1.0))
           / (tf.tf + {_BM25_K1} * (1.0 - {_BM25_B}
              + {_BM25_B} * dl.dl
                / (CAST(s.total_tok AS DOUBLE) / s.n_docs)))
         ) AS score
  FROM tf
  JOIN df ON tf.term = df.term
  JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN stats s
  GROUP BY tf.doc_id
)
SELECT doc_id, ROUND(score, 9) AS bm25
FROM scored
ORDER BY ROUND(score, 9) DESC, doc_id ASC
LIMIT {_BM25_TOP}
"""


@workload("text_bm25_search", oracle=_BM25_ORACLE)
def text_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranking of `documents` for the fixed query {terms}: tf from the
    token stream FILTERED to query terms before any shuffle (the grouped
    state is |terms| x |matching docs|, not the corpus token count),
    document-frequency and corpus stats are single-row/3-row broadcasts,
    top-{k} via orderBy().limit() (TakeOrderedAndProject). Lucene-standard
    idf = ln((N - df + .5)/(df + .5) + 1); scores rounded to 9 dp on both
    engines because ln()'s last ulp is libm-specific."""
    from sample_data_pipeline_project_spark.functions.text import tokens

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", tokens("text").alias("toks")
    )
    dl = d.select("doc_id", F.size("toks").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("total_tok")
    )
    tf = (
        d.select("doc_id", F.explode("toks").alias("term"))
        .filter(F.col("term").isin(*_BM25_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(F.broadcast(df_t), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "term_score",
            F.expr(
                f"ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)"
                f" * (tf * ({_BM25_K1} + 1.0))"
                f" / (tf + {_BM25_K1} * (1.0 - {_BM25_B}"
                f" + {_BM25_B} * dl / (CAST(total_tok AS DOUBLE) / n_docs)))"
            ),
        )
        .groupBy("doc_id")
        .agg(F.sum("term_score").alias("score"))
    )
    return (
        scored.select("doc_id", F.round("score", 9).alias("bm25"))
        .orderBy(F.col("bm25").desc(), F.col("doc_id").asc())
        .limit(_BM25_TOP)
    )


# --------------------------------------------------------------------------
# Z-order layout cells: multi-dimensional clustering key for file layout
# --------------------------------------------------------------------------
_Z_BITS = 4  # 16 buckets per dimension -> 256 cells
_Z_PRICE_WIDTH = 40000.0


def _zvalue_sql(xb: str, yb: str, intdiv: str) -> str:
    """Bit-interleave two {0..15} bucket ids into an 8-bit z-value using
    only integer div/mod (engine-portable; `intdiv` is the engine's
    integer-division operator: Spark 'DIV', DuckDB '//')."""
    terms = []
    for i in range(_Z_BITS):
        bit_x = f"((({xb}) {intdiv} {1 << i}) % 2)"
        bit_y = f"((({yb}) {intdiv} {1 << i}) % 2)"
        terms.append(f"({bit_x} * {1 << (2 * i)})")
        terms.append(f"({bit_y} * {1 << (2 * i + 1)})")
    return " + ".join(terms)


_XB = "CAST(o_custkey % 16 AS INT)"
_YB = (
    f"CAST(LEAST(15, CAST(FLOOR(o_totalprice / {_Z_PRICE_WIDTH}) AS INT)) AS INT)"
)

_Z_ORACLE = f"""
WITH cells AS (
  SELECT {_zvalue_sql(_XB, _YB, '//')} AS z_cell,
         CAST(o_totalprice AS DECIMAL(18,2)) AS price
  FROM orders
)
SELECT z_cell, COUNT(*) AS n_orders,
       CAST(SUM(price) AS DOUBLE) AS total_price
FROM cells GROUP BY z_cell
"""


@workload("layout_zorder_cells", oracle=_Z_ORACLE)
def layout_zorder_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-ORDER (Morton) layout cells over orders: bucketize (custkey,
    totalprice) to 4 bits each and bit-interleave into an 8-bit z-value —
    the multi-dimensional clustering key that, used as a sort/partition
    key at write time, gives min-max file skipping on BOTH dimensions at
    once (each z-cell is a rectangle in (custkey, price) space, so a range
    predicate on either dimension touches a provably bounded subset of
    cells — `sources/layout.py:write_zordered` is the writer and
    tests/test_layout.py measures the pruning). This workload is the
    driver-gated cell-assignment/aggregation half: per-cell row counts and
    revenue, interleaving via integer div/mod only — exact cross-engine."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select(
            F.expr(_zvalue_sql(_XB, _YB, "DIV")).alias("z_cell"),
            F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
        )
        .groupBy("z_cell")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("price").cast("double").alias("total_price"),
        )
    )


# --------------------------------------------------------------------------
# Join-key skew diagnostic
# --------------------------------------------------------------------------
_SKEW_TOP = 5

_SKEW_ORACLE = f"""
WITH per_key AS (
  SELECT l_suppkey, COUNT(*) AS cnt FROM lineitem GROUP BY l_suppkey
),
tot AS (
  SELECT SUM(cnt) AS total_rows, COUNT(*) AS n_keys FROM per_key
)
SELECT p.l_suppkey, p.cnt,
       CAST(p.cnt AS DOUBLE) / t.total_rows AS share,
       CAST(p.cnt AS DOUBLE) * t.n_keys / t.total_rows AS skew_vs_avg
FROM per_key p CROSS JOIN tot t
ORDER BY p.cnt DESC, p.l_suppkey ASC
LIMIT {_SKEW_TOP}
"""


@workload("dq_skew_report", oracle=_SKEW_ORACLE)
def dq_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JOIN-KEY SKEW diagnostic for lineitem.l_suppkey — the operational
    pre-check before a 100 TB shuffle join: per-key row counts, the top-{k}
    heaviest keys, each key's share of all rows and its ratio to the mean
    key (skew_vs_avg >> 1 means AQE skew-join splitting or salting —
    operators/skewjoin.py — is warranted). One keyed aggregate plus a
    broadcast single-row total; top-k via TakeOrderedAndProject. All
    divisions are exact-integer -> double: bit-identical cross-engine."""
    li = load_table(spark, sf_dir, "lineitem")
    per_key = li.groupBy("l_suppkey").agg(F.count(F.lit(1)).alias("cnt"))
    tot = per_key.agg(
        F.sum("cnt").alias("total_rows"), F.count(F.lit(1)).alias("n_keys")
    )
    return (
        per_key.crossJoin(F.broadcast(tot))
        .select(
            "l_suppkey",
            "cnt",
            (F.col("cnt").cast("double") / F.col("total_rows")).alias("share"),
            (
                F.col("cnt").cast("double")
                * F.col("n_keys")
                / F.col("total_rows")
            ).alias("skew_vs_avg"),
        )
        .orderBy(F.col("cnt").desc(), F.col("l_suppkey").asc())
        .limit(_SKEW_TOP)
    )


# --------------------------------------------------------------------------
# Per-group closed-form OLS regression (feature-engineering trend fit)
# --------------------------------------------------------------------------
_OLS_ORACLE = """
WITH pts AS (
  SELECT c.c_mktsegment AS segment,
         date_diff('day', DATE '1970-01-01', CAST(o.o_orderdate AS DATE)) AS x,
         CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS y
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
),
s AS (
  SELECT segment, COUNT(*) AS n,
         SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * x) AS sxx, SUM(x * y) AS sxy
  FROM pts GROUP BY segment
)
SELECT segment, CAST(n AS BIGINT) AS n,
       (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
       / NULLIF(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE), 0.0)
       AS slope_cents_per_day,
       (CAST(sy AS DOUBLE) - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
       / NULLIF(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE), 0.0))
       * CAST(sx AS DOUBLE))
       / CAST(n AS DOUBLE) AS intercept_cents
FROM s
"""


@workload("regression_price_trend_by_segment", oracle=_OLS_ORACLE)
def regression_price_trend_by_segment(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-group CLOSED-FORM OLS: order price (integer cents) regressed on
    order date (integer epoch-days) per market segment — the
    feature-engineering trend fit, as one keyed aggregate of five exact
    integer sufficient statistics (n, Sx, Sy, Sxx, Sxy) followed by
    driver-free arithmetic. No per-group iteration, no collect: the model
    fit IS a groupBy (the map-side-combinable shape that holds at any
    group count). Sums are exact int64 (Sxy peaks ~3e16 at sf0.1 — 300x
    headroom); slope/intercept combine the exact sums in identical
    textual order as doubles, so results are bit-identical cross-engine."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"),
        F.col("c_mktsegment").alias("segment"),
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("x"),
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("y"),
    )
    s = (
        o.join(F.broadcast(c), "o_custkey")
        .groupBy("segment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
            F.sum(F.col("x") * F.col("y")).alias("sxy"),
        )
    )
    # NULLIF guards the zero-x-variance degenerate group (all orders on
    # one date): ANSI Spark would otherwise raise DIVIDE_BY_ZERO and
    # non-ANSI engines would diverge (NaN vs inf); NULL slope is the
    # portable "no trend defined" answer both engines agree on.
    slope = (
        F.col("n").cast("double") * F.col("sxy").cast("double")
        - F.col("sx").cast("double") * F.col("sy").cast("double")
    ) / F.nullif(
        F.col("n").cast("double") * F.col("sxx").cast("double")
        - F.col("sx").cast("double") * F.col("sx").cast("double"),
        F.lit(0.0),
    )
    intercept = (
        F.col("sy").cast("double") - slope * F.col("sx").cast("double")
    ) / F.col("n").cast("double")
    return s.select(
        "segment",
        F.col("n").cast("long"),
        slope.alias("slope_cents_per_day"),
        intercept.alias("intercept_cents"),
    )


# --------------------------------------------------------------------------
# Deterministic MODE per group (most frequent value, exact tiebreak)
# --------------------------------------------------------------------------
_MODE_ORACLE = """
WITH cells AS (
  SELECT c.c_mktsegment AS segment, o.o_orderpriority AS priority,
         COUNT(*) AS n
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY c.c_mktsegment, o.o_orderpriority
),
ranked AS (
  SELECT segment, priority, n,
         ROW_NUMBER() OVER (PARTITION BY segment
                            ORDER BY n DESC, priority ASC) AS rn
  FROM cells
)
SELECT segment, priority AS mode_priority, CAST(n AS BIGINT) AS n_orders
FROM ranked WHERE rn = 1
"""


@workload("agg_mode_per_segment", oracle=_MODE_ORACLE)
def agg_mode_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact MODE per group with a DETERMINISTIC tiebreak — the aggregate
    SQL makes awkward (engine mode()/max_by() leave ties unspecified,
    which would break cross-engine hashing): count per (group, value),
    then a rank-1 pick ordered (count DESC, value ASC) over a window
    partitioned by group. Both shuffles key on the group column; the
    windowed input is the |groups| x |distinct values| cell table, not
    the fact table."""
    from pyspark.sql.window import Window

    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"),
        F.col("c_mktsegment").alias("segment"),
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", F.col("o_orderpriority").alias("priority")
    )
    cells = (
        o.join(F.broadcast(c), "o_custkey")
        .groupBy("segment", "priority")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("segment").orderBy(
        F.col("n").desc(), F.col("priority").asc()
    )
    return (
        cells.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "segment",
            F.col("priority").alias("mode_priority"),
            F.col("n").cast("long").alias("n_orders"),
        )
    )


# --------------------------------------------------------------------------
# Hybrid retrieval: reciprocal-rank fusion of BM25 + token-Jaccard
# --------------------------------------------------------------------------
_RRF_K = 60
_RRF_TOP = 10
_RRF_NQ = len(_BM25_TERMS)

_RRF_ORACLE = f"""
WITH docs AS (
  SELECT doc_id,
         string_split_regex(lower(trim(text)), '\\s+') AS toks
  FROM documents
),
dl AS (
  SELECT doc_id, len(toks) AS dl FROM docs
),
stats AS (
  SELECT COUNT(*) AS n_docs, SUM(dl) AS total_tok FROM dl
),
tf AS (
  SELECT doc_id, tok AS term, COUNT(*) AS tf
  FROM (SELECT doc_id, unnest(toks) AS tok FROM docs)
  WHERE tok IN ({_TERMS_SQL})
  GROUP BY doc_id, tok
),
dfx AS (
  SELECT term, COUNT(*) AS df FROM tf GROUP BY term
),
scored AS (
  SELECT tf.doc_id,
         SUM(
           ln((s.n_docs - dfx.df + 0.5) / (dfx.df + 0.5) + 1.0)
           * (tf.tf * ({_BM25_K1} + 1.0))
           / (tf.tf + {_BM25_K1} * (1.0 - {_BM25_B}
              + {_BM25_B} * dl.dl
                / (CAST(s.total_tok AS DOUBLE) / s.n_docs)))
         ) AS score
  FROM tf
  JOIN dfx ON tf.term = dfx.term
  JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN stats s
  GROUP BY tf.doc_id
),
bmtop AS (
  SELECT doc_id, ROUND(score, 9) AS bm25
  FROM scored
  ORDER BY ROUND(score, 9) DESC, doc_id ASC
  LIMIT {_BM25_TOP}
),
ra AS (
  SELECT x.doc_id, CAST(1 + COUNT(y.doc_id) AS BIGINT) AS rank_a
  FROM bmtop x LEFT JOIN bmtop y
    ON y.bm25 > x.bm25 OR (y.bm25 = x.bm25 AND y.doc_id < x.doc_id)
  GROUP BY x.doc_id
),
jtoks AS (
  SELECT doc_id, unnest(list_distinct(toks)) AS tok FROM docs
),
jac AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN tok IN ({_TERMS_SQL}) THEN 1 ELSE 0 END)
              AS BIGINT) AS shared,
         CAST(COUNT(*) AS BIGINT) AS n_tok
  FROM jtoks GROUP BY doc_id
),
jtop AS (
  SELECT doc_id,
         CAST(shared AS DOUBLE)
           / CAST(n_tok + {_RRF_NQ} - shared AS DOUBLE) AS jacc
  FROM jac
  ORDER BY CAST(shared AS DOUBLE)
             / CAST(n_tok + {_RRF_NQ} - shared AS DOUBLE) DESC,
           doc_id ASC
  LIMIT {_BM25_TOP}
),
rb AS (
  SELECT x.doc_id, CAST(1 + COUNT(y.doc_id) AS BIGINT) AS rank_b
  FROM jtop x LEFT JOIN jtop y
    ON y.jacc > x.jacc OR (y.jacc = x.jacc AND y.doc_id < x.doc_id)
  GROUP BY x.doc_id
),
fused AS (
  SELECT COALESCE(ra.doc_id, rb.doc_id) AS doc_id,
         ra.rank_a, rb.rank_b,
         COALESCE(1.0 / ({_RRF_K}.0 + CAST(ra.rank_a AS DOUBLE)), 0.0)
         + COALESCE(1.0 / ({_RRF_K}.0 + CAST(rb.rank_b AS DOUBLE)), 0.0)
           AS rrf
  FROM ra FULL OUTER JOIN rb ON ra.doc_id = rb.doc_id
)
SELECT doc_id, rank_a, rank_b, rrf
FROM fused
ORDER BY rrf DESC, doc_id ASC
LIMIT {_RRF_TOP}
"""


def _selfjoin_rank(top: DataFrame, score: str, rank_name: str) -> DataFrame:
    """Rank a bounded top-k frame by (score DESC, doc_id ASC) via a k x k
    self-join count — no window, no single-partition Exchange (the
    bigram-LM/BPE rank pattern)."""
    x = top.alias("x")
    y = top.alias("y")
    ahead = (F.col(f"y.{score}") > F.col(f"x.{score}")) | (
        (F.col(f"y.{score}") == F.col(f"x.{score}"))
        & (F.col("y.doc_id") < F.col("x.doc_id"))
    )
    return (
        x.join(y, ahead, "left")
        .groupBy(F.col("x.doc_id").alias("doc_id"))
        .agg((F.lit(1) + F.count(F.col("y.doc_id"))).cast("long").alias(rank_name))
    )


@workload("text_hybrid_rrf_fusion", oracle=_RRF_ORACLE)
def text_hybrid_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HYBRID SEARCH: reciprocal-rank fusion (k=60) of two independent
    retrievers over the same fixed query — lexical BM25 (the
    text_bm25_search ranking, reused verbatim) and token-set Jaccard —
    the standard way RAG stacks combine sparse retrievers without
    score calibration, since RRF consumes only RANKS. Both top-20 lists
    come from TakeOrderedAndProject; ranks are derived by bounded k x k
    self-joins (no global window); fusion is a 20-row full outer join.
    1/(60+rank) terms are exact-input IEEE divisions, identical on both
    engines. At 100 TB only the two retrievers touch the corpus — the
    fusion cost is O(k)."""
    from sample_data_pipeline_project_spark.functions.text import tokens

    bmtop = text_bm25_search(spark, sf_dir)
    ra = _selfjoin_rank(bmtop, "bm25", "rank_a")

    d = load_table(spark, sf_dir, "documents")
    jac = (
        d.select(
            "doc_id", F.explode(F.array_distinct(tokens("text"))).alias("tok")
        )
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.when(F.col("tok").isin(*_BM25_TERMS), 1).otherwise(0)
            )
            .cast("long")
            .alias("shared"),
            F.count(F.lit(1)).cast("long").alias("n_tok"),
        )
    )
    jtop = (
        jac.select(
            "doc_id",
            (
                F.col("shared").cast("double")
                / (F.col("n_tok") + F.lit(_RRF_NQ) - F.col("shared")).cast(
                    "double"
                )
            ).alias("jacc"),
        )
        .orderBy(F.col("jacc").desc(), F.col("doc_id").asc())
        .limit(_BM25_TOP)
    )
    rb = _selfjoin_rank(jtop, "jacc", "rank_b")

    fused = ra.join(rb, "doc_id", "full_outer").select(
        "doc_id",
        "rank_a",
        "rank_b",
        (
            F.coalesce(
                F.lit(1.0) / (F.lit(float(_RRF_K)) + F.col("rank_a").cast("double")),
                F.lit(0.0),
            )
            + F.coalesce(
                F.lit(1.0) / (F.lit(float(_RRF_K)) + F.col("rank_b").cast("double")),
                F.lit(0.0),
            )
        ).alias("rrf"),
    )
    return fused.orderBy(F.col("rrf").desc(), F.col("doc_id").asc()).limit(
        _RRF_TOP
    )


# --------------------------------------------------------------------------
# Embedding dimension covariance / correlation (exact-int Gram moments)
# --------------------------------------------------------------------------
_GRAM_SCALE = 262144  # 2^18 — floor(x * 2^18) is exponent-shift exact

_DIMCOV_ORACLE = f"""
WITH q AS (
  SELECT vec_id, CAST(t.i - 1 AS INTEGER) AS i,
         CAST(FLOOR(CAST(embedding[CAST(t.i AS INTEGER)] AS DOUBLE)
                    * {_GRAM_SCALE}) AS BIGINT) AS qv
  FROM embeddings, range(1, 65) AS t(i)
),
m AS (
  SELECT i, CAST(SUM(qv) AS BIGINT) AS sx,
         CAST(SUM(qv * qv) AS BIGINT) AS sxx,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM q GROUP BY i
),
p AS (
  SELECT a.i AS i, b.i AS j, CAST(SUM(a.qv * b.qv) AS BIGINT) AS sxy
  FROM q a JOIN q b ON a.vec_id = b.vec_id AND a.i < b.i
  GROUP BY a.i, b.i
)
SELECT p.i, p.j, p.sxy,
       ROUND(
         CAST(CAST(mi.n AS HUGEINT) * p.sxy
              - CAST(mi.sx AS HUGEINT) * mj.sx AS DOUBLE)
         / SQRT(CAST(CAST(mi.n AS HUGEINT) * mi.sxx
                     - CAST(mi.sx AS HUGEINT) * mi.sx AS DOUBLE))
         / SQRT(CAST(CAST(mj.n AS HUGEINT) * mj.sxx
                     - CAST(mj.sx AS HUGEINT) * mj.sx AS DOUBLE)),
         9) AS corr
FROM p
JOIN m mi ON p.i = mi.i
JOIN m mj ON p.j = mj.i
WHERE CAST(mi.n AS HUGEINT) * mi.sxx - CAST(mi.sx AS HUGEINT) * mi.sx > 0
  AND CAST(mj.n AS HUGEINT) * mj.sxx - CAST(mj.sx AS HUGEINT) * mj.sx > 0
"""


@workload("embedding_dim_covariance", oracle=_DIMCOV_ORACLE)
def embedding_dim_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-dimension correlation matrix (operators/gram.py): each
    Arrow batch collapses map-side to a d×d exact-int Gram partial
    (Q.T @ Q over floor(x·2^18) quantized values) + first moments, the
    shuffle carries O(d²) rows per BATCH, and the reduce is an
    associative integer sum — the X^T X shape an embedding-quality
    audit runs at corpus scale, with no per-row shuffle and no float
    drift. Pearson corr per dim pair is derived from the exact moments
    in wide-int arithmetic (DECIMAL(38,0) / HUGEINT); the only float
    math is the textually-identical cast/sqrt/divide chain, ROUND(_,9)
    guarded. Zero-variance dims are filtered identically on both
    sides."""
    from sample_data_pipeline_project_spark.operators.gram import gram_moments

    emb = load_table(spark, sf_dir, "embeddings")
    agg = (
        gram_moments(emb, "embedding")
        .groupBy("i", "j")
        .agg(
            F.sum("sxy").alias("sxy"),
            F.sum("sx").alias("sx"),
            F.sum("cnt").alias("cnt"),
        )
    )
    m = agg.filter(F.col("i") == F.col("j")).select(
        F.col("i").alias("d"),
        F.col("sx").alias("msx"),
        F.col("sxy").alias("msxx"),
        F.col("cnt").alias("mn"),
    )
    p = agg.filter(F.col("i") < F.col("j")).select("i", "j", "sxy")
    wide = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    mi = m.select(
        F.col("d").alias("i"),
        F.col("msx").alias("sx_i"),
        F.col("msxx").alias("sxx_i"),
        F.col("mn").alias("n"),
    )
    mj = m.select(
        F.col("d").alias("j"),
        F.col("msx").alias("sx_j"),
        F.col("msxx").alias("sxx_j"),
    )
    joined = p.join(F.broadcast(mi), "i").join(F.broadcast(mj), "j")
    num = wide("n") * wide("sxy") - wide("sx_i") * wide("sx_j")
    den_i = wide("n") * wide("sxx_i") - wide("sx_i") * wide("sx_i")
    den_j = wide("n") * wide("sxx_j") - wide("sx_j") * wide("sx_j")
    return (
        joined.filter((den_i > 0) & (den_j > 0))
        .select(
            "i",
            "j",
            "sxy",
            F.round(
                num.cast("double")
                / F.sqrt(den_i.cast("double"))
                / F.sqrt(den_j.cast("double")),
                9,
            ).alias("corr"),
        )
    )


# --------------------------------------------------------------------------
# Pareto frontier (skyline): cheapest-yet-latest orders per priority
# --------------------------------------------------------------------------
_SKYLINE_ORACLE = """
WITH o AS (
  SELECT o_orderpriority AS grp, o_orderkey,
         CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
           AS order_day,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
           AS price_cents
  FROM orders
)
SELECT grp, o_orderkey, order_day, price_cents
FROM o a
WHERE NOT EXISTS (
  SELECT 1 FROM o b
  WHERE b.grp = a.grp
    AND b.order_day >= a.order_day AND b.price_cents <= a.price_cents
    AND (b.order_day > a.order_day OR b.price_cents < a.price_cents)
)
"""


@workload("pareto_frontier_orders", oracle=_SKYLINE_ORACLE)
def pareto_frontier_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline query (operators/pareto.py): per order priority, the
    Pareto frontier maximizing order date while minimizing price — the
    multi-objective 'latest AND cheapest' set no single ORDER BY can
    express. Two-phase distributed skyline: local frontiers per
    (group, 32-way hash shard) kill dominated rows map-side inside
    Arrow batches, then a frontier-of-candidates pass per group over
    the shard survivors — phase-2 input is |shards| x frontier-sized,
    never data-sized. Exact integer axes (epoch days, DECIMAL cents);
    the oracle is the quadratic NOT EXISTS dominator test."""
    from sample_data_pipeline_project_spark.operators.pareto import (
        pareto_frontier_2d,
    )

    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("grp"),
        "o_orderkey",
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01"))
        .cast("long")
        .alias("order_day"),
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("price_cents"),
    )
    return pareto_frontier_2d(
        o,
        group_cols=["grp"],
        maximize_col="order_day",
        minimize_col="price_cents",
        id_cols=["o_orderkey"],
        n_shards=32,
    )
