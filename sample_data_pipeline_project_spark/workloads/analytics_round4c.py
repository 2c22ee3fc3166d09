"""Round-4c workloads: interval concurrency, distribution alignment,
ranking evaluation, dependency profiling, arrival-order auditing,
point-in-time dimension joins, and reflected (floor-clamped) running sums.

Determinism notes (the registry contract, workloads/__init__.py):
  - every metric that ends in a DOUBLE is exact-integer sufficient
    statistics with ONE final division (identical int64 bits in, identical
    double out on both engines);
  - NDCG/MRR log2 discount weights are precomputed in Python as scaled
    int64 literals and embedded in BOTH the Spark expression and the
    DuckDB oracle — no engine-side transcendental ever reaches the hash;
  - ranks that must be computed without a per-source global sort use the
    C113 partitioned-cumsum machinery (value-bucket counts -> exclusive
    offsets -> bucket-partitioned windows);
  - the capped running sum uses the Skorokhod reflection identity
    b_t = S_t - min(0, min_{j<=t} S_j), turning an apparently sequential
    clamp recurrence into two key-partitioned windows.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sample_data_pipeline_project_spark.ledger.derive import LEDGER_CTE, derived_ledger
from sample_data_pipeline_project_spark.operators.asof import asof_join
from sample_data_pipeline_project_spark.operators.scd2 import scd2_from_changelog
from sample_data_pipeline_project_spark.sources.catalog import load_table
from sample_data_pipeline_project_spark.workloads import workload

# --------------------------------------------------------------------------
# C170 — sweep-line max interval concurrency per (pipeline, index)
# --------------------------------------------------------------------------

_CONC_ORACLE = f"""
WITH {LEDGER_CTE},
pts AS (
  SELECT pipeline_name, index_name, query_window_start_ts AS ts,
         1 AS delta, run_id
  FROM pipeline_runs
  UNION ALL
  SELECT pipeline_name, index_name, query_window_end_ts AS ts,
         -1 AS delta, run_id
  FROM pipeline_runs
),
swept AS (
  SELECT pipeline_name, index_name, delta,
         SUM(delta) OVER (
           PARTITION BY pipeline_name, index_name
           ORDER BY ts, delta, run_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS conc
  FROM pts
)
SELECT pipeline_name, index_name,
       CAST(SUM(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_runs,
       CAST(MAX(conc) AS BIGINT) AS max_concurrent
FROM swept
GROUP BY pipeline_name, index_name
"""


@workload("ledger_max_concurrency", oracle=_CONC_ORACLE)
def ledger_max_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Max number of SIMULTANEOUSLY active runs per (pipeline, index) —
    the classic sweep line: +1 at each half-open interval's start, -1 at
    its end, running sum in (ts, delta, run_id) order (ends sort before
    starts at the same instant, so back-to-back runs never double-count),
    max per group. The running sum is a window PARTITIONED BY the group
    key — each partition is one pipeline/index stream, so the sweep
    parallelizes across groups at any scale; no global sort exists
    anywhere in the plan. This is the capacity-planning primitive for a
    run ledger (reference surface: snowflake_tasks.py interval queries)."""
    runs = derived_ledger(spark, sf_dir)
    starts = runs.select(
        "pipeline_name",
        "index_name",
        F.col("query_window_start_ts").alias("ts"),
        F.lit(1).alias("delta"),
        "run_id",
    )
    ends = runs.select(
        "pipeline_name",
        "index_name",
        F.col("query_window_end_ts").alias("ts"),
        F.lit(-1).alias("delta"),
        "run_id",
    )
    w = (
        Window.partitionBy("pipeline_name", "index_name")
        .orderBy("ts", "delta", "run_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    swept = starts.unionByName(ends).withColumn("conc", F.sum("delta").over(w))
    return swept.groupBy("pipeline_name", "index_name").agg(
        F.sum(F.when(F.col("delta") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_runs"),
        F.max("conc").cast("long").alias("max_concurrent"),
    )


# --------------------------------------------------------------------------
# C171 — quantile normalization of document length across sources
# --------------------------------------------------------------------------

_QN_TILES = 20
_QN_BUCKET = 16  # n_chars div 16: bounded value-bucket set for the cumsum

_QN_ORACLE = f"""
WITH ranked AS (
  SELECT source, n_chars,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY n_chars, doc_id) AS r,
         COUNT(*) OVER (PARTITION BY source) AS n_s
  FROM documents
),
tiled AS (
  SELECT source,
         CAST(((r - 1) * {_QN_TILES}) // n_s AS BIGINT) + 1 AS tile,
         n_chars
  FROM ranked
),
per_st AS (
  SELECT source, tile,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(n_chars) AS BIGINT) AS sum_chars
  FROM tiled GROUP BY source, tile
),
per_t AS (
  SELECT tile,
         CAST(SUM(n_docs) AS BIGINT) AS t_docs,
         CAST(SUM(sum_chars) AS BIGINT) AS t_chars
  FROM per_st GROUP BY tile
)
SELECT s.source, s.tile, s.n_docs,
       CAST(s.sum_chars AS DOUBLE) / s.n_docs AS mean_chars,
       CAST(t.t_chars AS DOUBLE) / t.t_docs AS target_mean_chars
FROM per_st s JOIN per_t t ON s.tile = t.tile
"""


@workload("stats_quantile_normalize_sources", oracle=_QN_ORACLE)
def stats_quantile_normalize_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile normalization of the per-source document-length
    distributions: every doc gets its within-source rank tile (20
    equi-depth tiles), and each (source, tile) cell reports its own mean
    length next to the POOLED cross-source mean for that tile — the
    normalization target that aligns every source's length distribution
    (the microarray quantile-normalization estimator, tile-pooled form).
    The within-source rank deliberately does NOT use a per-source global
    window (a handful of sources = a handful of giant partitions at
    corpus scale): it is the C113 partitioned cumsum — bounded per-
    (source, value-bucket) counts collected to the driver, exclusive
    offsets broadcast back, row_number over (source, bucket)-partitioned
    windows. Integer division floors identically on both engines for
    non-negative operands."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    d = d.withColumn("bkt", F.expr(f"n_chars div {_QN_BUCKET}"))
    btot = sorted(
        d.groupBy("source", "bkt").count().collect(),
        key=lambda r: (r["source"], r["bkt"]),
    )
    offs: list[tuple[str, int, int, int]] = []
    totals: dict[str, int] = {}
    for row in btot:
        totals[row["source"]] = totals.get(row["source"], 0) + row["count"]
    acc: dict[str, int] = {}
    for row in btot:
        src = row["source"]
        offs.append((src, row["bkt"], acc.get(src, 0), totals[src]))
        acc[src] = acc.get(src, 0) + row["count"]
    off_df = F.broadcast(
        spark.createDataFrame(offs, "source string, bkt long, off long, n_s long")
    )
    w = Window.partitionBy("source", "bkt").orderBy("n_chars", "doc_id")
    ranked = (
        d.withColumn("lr", F.row_number().over(w))
        .join(off_df, ["source", "bkt"])
        .withColumn("r", F.col("off") + F.col("lr"))
    )
    tiled = ranked.select(
        "source",
        (F.expr(f"(r - 1) * {_QN_TILES} div n_s") + 1).cast("long").alias("tile"),
        "n_chars",
    )
    per_st = tiled.groupBy("source", "tile").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("sum_chars"),
    )
    per_t = per_st.groupBy("tile").agg(
        F.sum("n_docs").cast("long").alias("t_docs"),
        F.sum("sum_chars").cast("long").alias("t_chars"),
    )
    return per_st.join(F.broadcast(per_t), "tile").select(
        "source",
        "tile",
        "n_docs",
        (F.col("sum_chars").cast("double") / F.col("n_docs")).alias("mean_chars"),
        (F.col("t_chars").cast("double") / F.col("t_docs")).alias(
            "target_mean_chars"
        ),
    )


# --------------------------------------------------------------------------
# C172 — NDCG@10 + MRR ranking evaluation with exact scaled-integer weights
# --------------------------------------------------------------------------

_W_SCALE = 10**12
_NDCG_K = 10
# 1/log2(r+1) discount, scaled to int64 in PYTHON (round half-even, but the
# values are nowhere near .5 ulp boundaries) — both engines consume the same
# integer literals, so no transcendental function is ever evaluated engine-side.
_DISC = [round(_W_SCALE / math.log2(r + 1)) for r in range(1, _NDCG_K + 1)]
_CUM_DISC = [sum(_DISC[: i + 1]) for i in range(_NDCG_K)]

_DISC_CASE = (
    "CASE rnk "
    + " ".join(f"WHEN {r} THEN {w}" for r, w in enumerate(_DISC, start=1))
    + " ELSE 0 END"
)
_IDCG_CASE = (
    "CASE LEAST(n_rel, 10) "
    + " ".join(f"WHEN {i} THEN {c}" for i, c in enumerate(_CUM_DISC, start=1))
    + " END"
)

_NDCG_ORACLE = f"""
WITH ranked AS (
  SELECT o_custkey,
         CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS rel,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rnk
  FROM orders
),
per_c AS (
  SELECT o_custkey,
         CAST(SUM(rel * ({_DISC_CASE})) AS BIGINT) AS dcg,
         CAST(SUM(rel) AS BIGINT) AS n_rel,
         MIN(CASE WHEN rel = 1 THEN rnk END) AS first_rel
  FROM ranked GROUP BY o_custkey
),
evald AS (
  SELECT dcg,
         {_IDCG_CASE} AS idcg,
         CAST(ROUND(CAST({_W_SCALE} AS DOUBLE) / first_rel) AS BIGINT) AS rr
  FROM per_c WHERE n_rel >= 1
),
milli AS (
  SELECT dcg, idcg, rr,
         CAST(ROUND(CAST(dcg * 1000 AS DOUBLE) / idcg) AS BIGINT) AS ndcg_milli
  FROM evald
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_eval_customers,
       CAST(SUM(dcg) AS BIGINT) AS sum_dcg,
       CAST(SUM(idcg) AS BIGINT) AS sum_idcg,
       CAST(SUM(dcg) AS DOUBLE) / CAST(SUM(idcg) AS DOUBLE) AS micro_ndcg10,
       CAST(SUM(ndcg_milli) AS DOUBLE) / CAST(1000 * COUNT(*) AS DOUBLE)
         AS macro_ndcg10,
       CAST(SUM(rr) AS DOUBLE) / CAST({_W_SCALE} * COUNT(*) AS DOUBLE) AS mrr
FROM milli
"""


@workload("stats_ndcg_mrr_ranking", oracle=_NDCG_ORACLE)
def stats_ndcg_mrr_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-quality evaluation: treat each customer's orders ranked by
    price (desc, orderkey tiebreak) as a retrieval run with URGENT orders
    as the relevant set, and report NDCG@10 (micro: pooled DCG/IDCG;
    macro: mean of per-customer NDCG) plus MRR over customers with >=1
    relevant item. The log2 discount weights are precomputed in Python as
    1e12-scaled int64 literals shared verbatim by the Spark expression and
    the oracle, so every per-customer DCG/IDCG is EXACT integer
    arithmetic; each final metric is one division of identical int64
    sums — no engine-side log, no order-dependent float summation. The
    ranking window partitions by customer (millions of small groups at
    scale), and the eval reduces in one aggregation pass."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    ranked = o.select(
        "o_custkey",
        F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0).alias("rel"),
        F.row_number().over(w).alias("rnk"),
    )
    per_c = ranked.groupBy("o_custkey").agg(
        F.sum(F.col("rel") * F.expr(_DISC_CASE)).cast("long").alias("dcg"),
        F.sum("rel").cast("long").alias("n_rel"),
        F.min(F.when(F.col("rel") == 1, F.col("rnk"))).alias("first_rel"),
    )
    evald = per_c.filter(F.col("n_rel") >= 1).select(
        "dcg",
        F.expr(_IDCG_CASE).alias("idcg"),
        F.round(F.lit(float(_W_SCALE)) / F.col("first_rel"))
        .cast("long")
        .alias("rr"),
    )
    milli = evald.withColumn(
        "ndcg_milli",
        F.round((F.col("dcg") * 1000).cast("double") / F.col("idcg")).cast("long"),
    )
    return milli.agg(
        F.count(F.lit(1)).cast("long").alias("n_eval_customers"),
        F.sum("dcg").cast("long").alias("sum_dcg"),
        F.sum("idcg").cast("long").alias("sum_idcg"),
        (
            F.sum("dcg").cast("long").cast("double")
            / F.sum("idcg").cast("long").cast("double")
        ).alias("micro_ndcg10"),
        (
            F.sum("ndcg_milli").cast("long").cast("double")
            / (F.lit(1000) * F.count(F.lit(1))).cast("long").cast("double")
        ).alias("macro_ndcg10"),
        (
            F.sum("rr").cast("long").cast("double")
            / (F.lit(_W_SCALE) * F.count(F.lit(1))).cast("long").cast("double")
        ).alias("mrr"),
    )


# --------------------------------------------------------------------------
# C173 — functional-dependency discovery scores (g3 violation rate)
# --------------------------------------------------------------------------

_FD_SPECS: list[tuple[str, str, str]] = [
    ("orders", "o_orderkey", "o_orderdate"),
    ("orders", "o_custkey", "o_orderpriority"),
    ("lineitem", "l_orderkey", "l_returnflag"),
    ("lineitem", "l_partkey", "l_suppkey"),
]


def _fd_sql(table: str, lhs: str, rhs: str) -> str:
    return f"""
SELECT '{table}.{lhs}->{rhs}' AS fd,
       CAST(SUM(cnt) AS BIGINT) AS n_rows,
       CAST(COUNT(*) AS BIGINT) AS n_lhs,
       CAST(SUM(cnt) - SUM(mx) AS BIGINT) AS violations,
       CAST(SUM(cnt) - SUM(mx) AS DOUBLE) / CAST(SUM(cnt) AS DOUBLE) AS g3_rate
FROM (
  SELECT {lhs}, CAST(SUM(c) AS BIGINT) AS cnt, CAST(MAX(c) AS BIGINT) AS mx
  FROM (
    SELECT {lhs}, {rhs}, CAST(COUNT(*) AS BIGINT) AS c
    FROM {table} GROUP BY {lhs}, {rhs}
  ) GROUP BY {lhs}
)"""


_FD_ORACLE = "\nUNION ALL\n".join(_fd_sql(*spec) for spec in _FD_SPECS)


@workload("dq_functional_dependency", oracle=_FD_ORACLE)
def dq_functional_dependency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate functional-dependency profiling: for each candidate
    X -> Y, the g3 measure — the minimum fraction of rows to delete for
    the FD to hold exactly (n_rows minus, per X group, the count of the
    plurality Y value). Two grouped aggregations per candidate, both
    keyed on the candidate columns — fully distributed, no windows, and
    the per-candidate results union into one tiny report. The schema-
    inference primitive data-quality suites (Deequ/Metanome-style) run
    before trusting a key or denormalizing a column at warehouse scale."""
    frames = []
    for table, lhs, rhs in _FD_SPECS:
        t = load_table(spark, sf_dir, table)
        pairs = t.groupBy(lhs, rhs).agg(F.count(F.lit(1)).cast("long").alias("c"))
        per_lhs = pairs.groupBy(lhs).agg(
            F.sum("c").cast("long").alias("cnt"),
            F.max("c").cast("long").alias("mx"),
        )
        frames.append(
            per_lhs.agg(
                F.lit(f"{table}.{lhs}->{rhs}").alias("fd"),
                F.sum("cnt").cast("long").alias("n_rows"),
                F.count(F.lit(1)).cast("long").alias("n_lhs"),
                (F.sum("cnt") - F.sum("mx")).cast("long").alias("violations"),
                (
                    (F.sum("cnt") - F.sum("mx")).cast("long").cast("double")
                    / F.sum("cnt").cast("long").cast("double")
                ).alias("g3_rate"),
            )
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


# --------------------------------------------------------------------------
# C174 — event-arrival disorder audit (lateness vs ingestion order)
# --------------------------------------------------------------------------

_LATE_ORACLE = """
WITH seq AS (
  SELECT event_type, epoch_us(ts) AS us,
         MAX(epoch_us(ts)) OVER (
           PARTITION BY user_id ORDER BY event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ) AS hwm
  FROM events
),
flagged AS (
  SELECT event_type,
         CASE WHEN hwm IS NOT NULL AND us < hwm THEN 1 ELSE 0 END AS late,
         CASE WHEN hwm IS NOT NULL AND us < hwm THEN hwm - us END AS late_us
  FROM seq
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(late) AS BIGINT) AS n_late,
       CAST(SUM(late) AS DOUBLE) / COUNT(*) AS late_frac,
       CAST(MAX(late_us) AS BIGINT) AS max_lateness_us,
       CAST(SUM(late_us) AS BIGINT) AS sum_lateness_us
FROM flagged
GROUP BY event_type
"""


@workload("events_late_arrival_audit", oracle=_LATE_ORACLE)
def events_late_arrival_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-order-arrival audit: within each user's stream in INGESTION
    order (event_id), an event is late if its event time sits below the
    running event-time high-water mark — exactly the rows a streaming
    watermark would have to buffer or drop. Reports, per event type, the
    late count/fraction and the worst and total lateness in microseconds:
    the numbers that size `withWatermark` delays before deploying the
    streaming twins of these pipelines. The high-water mark is a running
    MAX over a user-partitioned window (millions of small partitions at
    scale); lateness sums are exact int64 microseconds."""
    e = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    seq = e.select("event_type", "user_id", "event_id", us.alias("us")).withColumn(
        "hwm", F.max("us").over(w)
    )
    late_cond = F.col("hwm").isNotNull() & (F.col("us") < F.col("hwm"))
    flagged = seq.select(
        "event_type",
        F.when(late_cond, 1).otherwise(0).alias("late"),
        F.when(late_cond, F.col("hwm") - F.col("us")).alias("late_us"),
    )
    return flagged.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum("late").cast("long").alias("n_late"),
        (F.sum("late").cast("double") / F.count(F.lit(1))).alias("late_frac"),
        F.max("late_us").cast("long").alias("max_lateness_us"),
        F.sum("late_us").cast("long").alias("sum_lateness_us"),
    )


# --------------------------------------------------------------------------
# C175 — point-in-time (PIT) join of facts against an SCD2 dimension
# --------------------------------------------------------------------------

_PIT_ORACLE = """
WITH dedup AS (
  SELECT o_custkey, o_orderdate, o_orderpriority
  FROM (
    SELECT o_custkey, o_orderdate, o_orderpriority,
           ROW_NUMBER() OVER (PARTITION BY o_custkey, o_orderdate
                              ORDER BY o_orderkey DESC) AS rn
    FROM orders
  ) WHERE rn = 1
), collapsed AS (
  SELECT o_custkey, o_orderdate, o_orderpriority
  FROM (
    SELECT o_custkey, o_orderdate, o_orderpriority,
           LAG(o_orderpriority) OVER (PARTITION BY o_custkey
                                      ORDER BY o_orderdate) AS prev
    FROM dedup
  ) WHERE prev IS NULL OR prev <> o_orderpriority
), hist AS (
  SELECT o_custkey AS custkey,
         o_orderpriority AS priority,
         o_orderdate AS valid_from,
         COALESCE(LEAD(o_orderdate) OVER w,
                  TIMESTAMP '2262-01-01 00:00:00') AS valid_to
  FROM collapsed
  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate)
), ships AS (
  SELECT o.o_custkey AS custkey, l.l_shipdate AS ship_ts, l.l_quantity
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
)
SELECT h.priority AS priority_at_ship,
       CAST(COUNT(*) AS BIGINT) AS n_shipments,
       CAST(SUM(CAST(s.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM ships s
LEFT JOIN hist h
  ON s.custkey = h.custkey
 AND s.ship_ts >= h.valid_from
 AND s.ship_ts < h.valid_to
GROUP BY h.priority
"""


@workload("scd2_point_in_time_join", oracle=_PIT_ORACLE)
def scd2_point_in_time_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time enrichment against a versioned dimension: what was
    each customer's order priority AS OF each lineitem's ship date? The
    SCD2 history (operators/scd2.py, one shuffle on the business key) is
    probed with the as-of operator (operators/asof.py union-merge) rather
    than a BETWEEN range join — the naive validity-interval join is a
    non-equi join Spark can only BNLJ, while the as-of form is ONE
    shuffle shared by both sides and a key-partitioned window, the shape
    that survives a dimension with billions of versions. Backward as-of
    on valid_from is exactly SCD2 validity-window semantics because
    versions tile the time axis half-open."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    changes = o.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderdate").alias("ts"),
        F.col("o_orderpriority").alias("priority"),
        "o_orderkey",
    )
    hist = scd2_from_changelog(
        changes,
        key_cols=["custkey"],
        ts_col="ts",
        attr_cols=["priority"],
        tiebreak_col="o_orderkey",
    ).select("custkey", F.col("valid_from").alias("vf"), "priority")
    ships = li.join(
        o.select("o_orderkey", F.col("o_custkey").alias("custkey")),
        li["l_orderkey"] == F.col("o_orderkey"),
    ).select("custkey", F.col("l_shipdate").alias("ship_ts"), "l_quantity")
    enriched = asof_join(
        ships,
        hist,
        on=["custkey"],
        left_ts="ship_ts",
        right_ts="vf",
        how="left",
    )
    return enriched.groupBy(F.col("priority").alias("priority_at_ship")).agg(
        F.count(F.lit(1)).cast("long").alias("n_shipments"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_qty"),
    )


# --------------------------------------------------------------------------
# C176 — floor-clamped running balance via Skorokhod reflection
# --------------------------------------------------------------------------

_CAP_ORACLE = """
WITH flows AS (
  SELECT o_custkey,
         CASE WHEN o_orderstatus = 'F'
              THEN -CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
              ELSE  CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
         END AS delta,
         o_orderdate, o_orderkey
  FROM orders
),
pref AS (
  SELECT o_custkey, delta, o_orderdate, o_orderkey,
         SUM(delta) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s
  FROM flows
),
marked AS (
  SELECT o_custkey, delta, s,
         LEAST(0, COALESCE(MIN(s) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)) AS m_prev
  FROM pref
),
per_c AS (
  SELECT o_custkey,
         CAST(SUM(delta) - LEAST(0, MIN(s)) AS BIGINT) AS final_cents,
         CAST(SUM(CASE WHEN s < m_prev THEN 1 ELSE 0 END) AS BIGINT)
           AS n_floor_events
  FROM marked
  GROUP BY o_custkey
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(final_cents) AS BIGINT) AS sum_final_cents,
       CAST(MAX(final_cents) AS BIGINT) AS max_final_cents,
       CAST(SUM(n_floor_events) AS BIGINT) AS n_floor_events,
       CAST(SUM(CASE WHEN n_floor_events > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_customers_floored
FROM per_c
"""


@workload("window_capped_running_sum", oracle=_CAP_ORACLE)
def window_capped_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Floor-clamped running balance — b_t = max(0, b_{t-1} + delta_t) —
    the bounded-inventory / store-credit recurrence that LOOKS inherently
    sequential (each step's clamp feeds the next) but has the closed-form
    reflection solution b_t = S_t - min(0, min_{j<=t} S_j) over plain
    prefix sums S. That identity turns a per-row scan into two
    key-partitioned windows sharing one sort (prefix sum + running min),
    so the operator scales exactly like any other windowed aggregate —
    no applyInPandas, no driver loop. Deltas are exact DECIMAL cents
    (credits for open/pending orders, debits for fulfilled), clamped at
    zero; a floor EVENT is a row where the prefix sum undercuts the prior
    running minimum. Output: corpus-level balance/floor statistics, all
    exact int64."""
    o = load_table(spark, sf_dir, "orders")
    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
    flows = o.select(
        "o_custkey",
        F.when(F.col("o_orderstatus") == "F", -cents).otherwise(cents).alias(
            "delta"
        ),
        "o_orderdate",
        "o_orderkey",
    )
    w_cur = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_prev = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    pref = flows.withColumn("s", F.sum("delta").over(w_cur)).withColumn(
        "m_prev",
        F.least(F.lit(0).cast("long"), F.coalesce(F.min("s").over(w_prev), F.lit(0).cast("long"))),
    )
    per_c = pref.groupBy("o_custkey").agg(
        (F.sum("delta") - F.least(F.lit(0).cast("long"), F.min("s")))
        .cast("long")
        .alias("final_cents"),
        F.sum(F.when(F.col("s") < F.col("m_prev"), 1).otherwise(0))
        .cast("long")
        .alias("n_floor_events"),
    )
    return per_c.agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.sum("final_cents").cast("long").alias("sum_final_cents"),
        F.max("final_cents").cast("long").alias("max_final_cents"),
        F.sum("n_floor_events").cast("long").alias("n_floor_events"),
        F.sum(F.when(F.col("n_floor_events") > 0, 1).otherwise(0))
        .cast("long")
        .alias("n_customers_floored"),
    )
