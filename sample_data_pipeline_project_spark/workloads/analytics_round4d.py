"""Round-4d workloads: k-fold cross-validation from complement statistics,
exact decision-stump induction, binary/hash scalar parity, and bitemporal
ledger reconstruction.

Determinism notes:
  - The CV workload never re-scans training data per fold: train-side
    sufficient statistics are TOTALS MINUS FOLD (one pass + a 5-row
    broadcast), and every model coefficient / error metric is a FIXED
    double expression over exact integer (or DECIMAL(38,0)) sums — the
    identical formula text is fed to Spark via F.expr and to DuckDB in
    the oracle, so both engines execute the same IEEE operation sequence.
  - sqrt is correctly rounded under IEEE-754 on both engines, so
    RMSE = sqrt(exact-expression) is hash-stable (unlike log/exp, which
    never appear engine-side in this registry).
  - The decision stump ranks candidate splits by a weighted-Gini double
    computed from exact int64 cumulative class counts (C113 partitioned
    cumsum on the Spark side; single-node window in the oracle) and picks
    the argmin via ORDER BY + LIMIT 1 (TakeOrderedAndProject) with a
    threshold tiebreak — no global window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sample_data_pipeline_project_spark.functions.text import md5_prefix_uint32_sql
from sample_data_pipeline_project_spark.ledger.derive import LEDGER_CTE, derived_ledger
from sample_data_pipeline_project_spark.sources.catalog import load_table
from sample_data_pipeline_project_spark.workloads import workload

# --------------------------------------------------------------------------
# C177 — k-fold cross-validated OLS from complement sufficient statistics
# --------------------------------------------------------------------------

_K_FOLDS = 5
_FOLD_U32 = md5_prefix_uint32_sql("'fold|' || CAST(o_orderkey AS STRING)")
_FOLD_EXPR = f"{_FOLD_U32} % {_K_FOLDS}"

# Shared formula text (Spark F.expr == DuckDB SQL): every operand is an
# exact int64 / DECIMAL(38,0) aggregate cast to DOUBLE at a fixed point,
# so both engines run the identical IEEE operation sequence.
_B1_EXPR = (
    "(CAST(n_tr AS DOUBLE) * CAST(sxy_tr AS DOUBLE)"
    " - CAST(sx_tr AS DOUBLE) * CAST(sy_tr AS DOUBLE))"
    " / (CAST(n_tr AS DOUBLE) * CAST(sxx_tr AS DOUBLE)"
    " - CAST(sx_tr AS DOUBLE) * CAST(sx_tr AS DOUBLE))"
)
_B0_EXPR = "(CAST(sy_tr AS DOUBLE) - b1 * CAST(sx_tr AS DOUBLE)) / CAST(n_tr AS DOUBLE)"
# syy (cents^2 sums) exceeds 2^53 at sf >= 0.1, and DECIMAL -> DOUBLE
# conversion above 2^53 is NOT identically rounded across engines (the
# round-8 sf0.1 gate caught a 1-ulp divergence in exactly this cast).
# Each pipeline therefore ships syy as TWO exact int64 halves
# (hi = syy div 2^32, lo = syy mod 2^32 — both < 2^53, so their DOUBLE
# casts are exact) and the shared formula reassembles them with one
# IEEE multiply-add both engines execute identically.
_SYY_DBL = (
    "(CAST(syy_te_hi AS DOUBLE) * 4294967296.0 + CAST(syy_te_lo AS DOUBLE))"
)
_SSE_EXPR = (
    f"{_SYY_DBL} - 2 * b0 * CAST(sy_te AS DOUBLE)"
    " - 2 * b1 * CAST(sxy_te AS DOUBLE) + CAST(n_te AS DOUBLE) * b0 * b0"
    " + 2 * b0 * b1 * CAST(sx_te AS DOUBLE) + b1 * b1 * CAST(sxx_te AS DOUBLE)"
)
_RMSE_EXPR = f"sqrt(GREATEST(CAST(0 AS DOUBLE), ({_SSE_EXPR}) / CAST(n_te AS DOUBLE)))"

_CV_ORACLE = f"""
WITH xy AS (
  SELECT o.o_orderkey,
         CAST({_FOLD_EXPR} AS BIGINT) AS fold,
         COALESCE(li.x, 0) AS x,
         CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS y
  FROM orders o
  LEFT JOIN (
    SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS x
    FROM lineitem GROUP BY l_orderkey
  ) li ON o.o_orderkey = li.l_orderkey
),
per_fold AS (
  SELECT fold,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * y) AS BIGINT) AS sxy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(CAST(SUM(CAST(y AS DECIMAL(38,0)) * y) AS HUGEINT)
              // 4294967296 AS BIGINT) AS syy_hi,
         CAST(CAST(SUM(CAST(y AS DECIMAL(38,0)) * y) AS HUGEINT)
              % 4294967296 AS BIGINT) AS syy_lo
  FROM xy GROUP BY fold
),
tot AS (
  SELECT CAST(SUM(n) AS BIGINT) AS n_all,
         CAST(SUM(sx) AS BIGINT) AS sx_all,
         CAST(SUM(sy) AS BIGINT) AS sy_all,
         CAST(SUM(sxy) AS BIGINT) AS sxy_all,
         CAST(SUM(sxx) AS BIGINT) AS sxx_all
  FROM per_fold
),
split AS (
  SELECT fold,
         n AS n_te, sx AS sx_te, sy AS sy_te, sxy AS sxy_te,
         sxx AS sxx_te, syy_hi AS syy_te_hi, syy_lo AS syy_te_lo,
         n_all - n AS n_tr, sx_all - sx AS sx_tr, sy_all - sy AS sy_tr,
         sxy_all - sxy AS sxy_tr, sxx_all - sxx AS sxx_tr
  FROM per_fold CROSS JOIN tot
),
with_b1 AS (SELECT *, {_B1_EXPR} AS b1 FROM split),
with_b0 AS (SELECT *, {_B0_EXPR} AS b0 FROM with_b1)
SELECT fold, n_tr AS n_train, n_te AS n_test, b1, b0,
       {_RMSE_EXPR} AS rmse_test
FROM with_b0
"""


@workload("ml_kfold_cv_ols", oracle=_CV_ORACLE)
def ml_kfold_cv_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-fold cross-validated simple OLS (order price ~ lineitem count)
    WITHOUT re-scanning training data per fold: one pass computes exact
    per-fold sufficient statistics (counts, sums, cross-products; the
    y^2 sum in DECIMAL(38,0) because cents-squared overflows int64 at
    scale), and each fold's TRAINING statistics are totals-minus-fold —
    a 5-row broadcast instead of k passes over the data, the trick that
    makes k-fold CV a single-shuffle operation at 100 TB. Coefficients
    and test RMSE come from fixed shared-text double formulas over those
    exact aggregates (sqrt is IEEE-correctly-rounded on both engines).
    Folds are deterministic md5-u32 hashes of the order key."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    xcnt = li.groupBy("l_orderkey").agg(F.count(F.lit(1)).cast("long").alias("x"))
    xy = (
        o.join(xcnt, o["o_orderkey"] == xcnt["l_orderkey"], "left")
        .select(
            F.expr(_FOLD_EXPR).cast("long").alias("fold"),
            F.coalesce(F.col("x"), F.lit(0).cast("long")).alias("x"),
            (F.col("o_totalprice").cast("decimal(18,2)") * 100)
            .cast("long")
            .alias("y"),
        )
    )
    per_fold = (
        xy.groupBy("fold")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("x").cast("long").alias("sx"),
            F.sum("y").cast("long").alias("sy"),
            F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
            F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
            F.sum(F.col("y").cast("decimal(38,0)") * F.col("y"))
            .cast("decimal(38,0)")
            .alias("syy"),
        )
        # two exact int64 halves — see the _SYY_DBL note above
        .withColumn(
            "syy_hi", F.expr("CAST(syy div 4294967296 AS BIGINT)")
        )
        .withColumn("syy_lo", F.expr("CAST(syy % 4294967296 AS BIGINT)"))
        .drop("syy")
    )
    tot = per_fold.agg(
        F.sum("n").cast("long").alias("n_all"),
        F.sum("sx").cast("long").alias("sx_all"),
        F.sum("sy").cast("long").alias("sy_all"),
        F.sum("sxy").cast("long").alias("sxy_all"),
        F.sum("sxx").cast("long").alias("sxx_all"),
    )
    split = per_fold.join(F.broadcast(tot)).select(
        "fold",
        F.col("n").alias("n_te"),
        F.col("sx").alias("sx_te"),
        F.col("sy").alias("sy_te"),
        F.col("sxy").alias("sxy_te"),
        F.col("sxx").alias("sxx_te"),
        F.col("syy_hi").alias("syy_te_hi"),
        F.col("syy_lo").alias("syy_te_lo"),
        (F.col("n_all") - F.col("n")).alias("n_tr"),
        (F.col("sx_all") - F.col("sx")).alias("sx_tr"),
        (F.col("sy_all") - F.col("sy")).alias("sy_tr"),
        (F.col("sxy_all") - F.col("sxy")).alias("sxy_tr"),
        (F.col("sxx_all") - F.col("sxx")).alias("sxx_tr"),
    )
    out = (
        split.withColumn("b1", F.expr(_B1_EXPR))
        .withColumn("b0", F.expr(_B0_EXPR))
        .select(
            "fold",
            F.col("n_tr").alias("n_train"),
            F.col("n_te").alias("n_test"),
            "b1",
            "b0",
            F.expr(_RMSE_EXPR).alias("rmse_test"),
        )
    )
    return out


# --------------------------------------------------------------------------
# C178 — exact decision stump (best Gini split) via partitioned cumsum
# --------------------------------------------------------------------------

_STUMP_BUCKET = 1 << 20

_H_EXPR = (
    "CAST(pos_le * pos_le + neg_le * neg_le AS DOUBLE) / CAST(n_l AS DOUBLE)"
    " + CAST(pos_r * pos_r + neg_r * neg_r AS DOUBLE) / CAST(n_r AS DOUBLE)"
)
_GINI_EXPR = f"(CAST(n_all AS DOUBLE) - ({_H_EXPR})) / CAST(n_all AS DOUBLE)"

_STUMP_ORACLE = f"""
WITH pts AS (
  SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS v,
         CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS y
  FROM orders
),
cells AS (
  SELECT v, CAST(SUM(y) AS BIGINT) AS pos, CAST(SUM(1 - y) AS BIGINT) AS neg
  FROM pts GROUP BY v
),
cum AS (
  SELECT v,
         SUM(pos) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                        AND CURRENT ROW) AS pos_le,
         SUM(neg) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                        AND CURRENT ROW) AS neg_le,
         CAST(SUM(pos) OVER () AS BIGINT) AS p_all,
         CAST(SUM(neg) OVER () AS BIGINT) AS n_neg_all
  FROM cells
),
scored AS (
  SELECT v AS threshold_cents,
         CAST(pos_le + neg_le AS BIGINT) AS n_l,
         CAST(pos_le AS BIGINT) AS pos_le,
         CAST(neg_le AS BIGINT) AS neg_le,
         CAST(p_all + n_neg_all - pos_le - neg_le AS BIGINT) AS n_r,
         CAST(p_all - pos_le AS BIGINT) AS pos_r,
         CAST(n_neg_all - neg_le AS BIGINT) AS neg_r,
         CAST(p_all + n_neg_all AS BIGINT) AS n_all
  FROM cum
),
ranked AS (
  SELECT threshold_cents, n_l AS n_left, pos_le AS pos_left,
         n_r AS n_right, pos_r AS pos_right,
         {_GINI_EXPR} AS weighted_gini
  FROM scored WHERE n_r > 0
)
SELECT * FROM ranked
ORDER BY weighted_gini ASC, threshold_cents ASC
LIMIT 1
"""


@workload("ml_decision_stump", oracle=_STUMP_ORACLE)
def ml_decision_stump(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact decision-stump induction: the single price threshold that
    minimizes weighted Gini impurity for the is-urgent label, over ALL
    distinct feature values. Cumulative class counts per candidate split
    use the C113 partitioned cumsum (bounded per-value-bucket totals ->
    exclusive offsets -> bucket-partitioned windows), so no global
    window touches the value table at any scale; the split score is a
    fixed double expression over exact int64 counts, and the argmin is
    ORDER BY + LIMIT 1 (TakeOrderedAndProject) with a deterministic
    threshold tiebreak. This is one boosting-round / one tree-node of
    exact greedy tree induction, the shape distributed GBDT kernels
    (XGBoost-on-Spark histogram mode) approximate."""
    o = load_table(spark, sf_dir, "orders")
    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
    pts = o.select(
        cents.alias("v"),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0).alias("y"),
    )
    cells = pts.groupBy("v").agg(
        F.sum("y").cast("long").alias("pos"),
        F.sum(1 - F.col("y")).cast("long").alias("neg"),
    )
    cells = cells.withColumn("bkt", F.expr(f"v div {_STUMP_BUCKET}"))
    btotals = sorted(
        cells.groupBy("bkt")
        .agg(F.sum("pos").alias("tp"), F.sum("neg").alias("tn"))
        .collect(),
        key=lambda r: r["bkt"],
    )
    offs, acc_p, acc_n = [], 0, 0
    for r in btotals:
        offs.append((r["bkt"], acc_p, acc_n))
        acc_p += r["tp"]
        acc_n += r["tn"]
    p_all, n_neg_all = acc_p, acc_n
    off_df = F.broadcast(
        spark.createDataFrame(offs or [(0, 0, 0)], "bkt long, off_p long, off_n long")
    )
    w = (
        Window.partitionBy("bkt")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = cells.join(off_df, "bkt").select(
        "v",
        (F.sum("pos").over(w) + F.col("off_p")).cast("long").alias("pos_le"),
        (F.sum("neg").over(w) + F.col("off_n")).cast("long").alias("neg_le"),
    )
    scored = cum.select(
        F.col("v").alias("threshold_cents"),
        (F.col("pos_le") + F.col("neg_le")).alias("n_l"),
        "pos_le",
        "neg_le",
        (F.lit(p_all + n_neg_all) - F.col("pos_le") - F.col("neg_le")).alias("n_r"),
        (F.lit(p_all) - F.col("pos_le")).alias("pos_r"),
        (F.lit(n_neg_all) - F.col("neg_le")).alias("neg_r"),
        F.lit(p_all + n_neg_all).cast("long").alias("n_all"),
    )
    ranked = scored.filter(F.col("n_r") > 0).select(
        "threshold_cents",
        F.col("n_l").alias("n_left"),
        F.col("pos_le").alias("pos_left"),
        F.col("n_r").alias("n_right"),
        F.col("pos_r").alias("pos_right"),
        F.expr(_GINI_EXPR).alias("weighted_gini"),
    )
    return ranked.orderBy("weighted_gini", "threshold_cents").limit(1)


# --------------------------------------------------------------------------
# C179 — binary / hash scalar function parity
# --------------------------------------------------------------------------

_BIN_ORACLE = """
SELECT n_nationkey,
       md5(n_name) AS md5_name,
       sha256(n_name) AS sha256_name,
       to_base64(CAST(n_name AS BLOB)) AS b64_name,
       hex(n_name) AS hex_name,
       CAST(xor(n_nationkey, n_regionkey) AS BIGINT) AS k_xor,
       CAST(n_nationkey & n_regionkey AS BIGINT) AS k_and,
       CAST(n_nationkey | n_regionkey AS BIGINT) AS k_or,
       CAST(n_nationkey << 3 AS BIGINT) AS k_shl,
       CAST(n_nationkey >> 1 AS BIGINT) AS k_shr,
       CAST(bit_count((CAST(n_nationkey AS BIGINT) << 20)
                      | CAST(n_regionkey AS BIGINT)) AS BIGINT) AS k_popcnt
FROM nation
"""


@workload("scalar_binary_funcs", oracle=_BIN_ORACLE)
def scalar_binary_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary / cryptographic-hash scalar surface parity: md5, sha-256,
    base64, hex, and the int64 bitwise algebra (xor/and/or/shifts/
    popcount) — the building blocks the engine's own operators lean on
    (md5-u32 deterministic sampling, simhash bit arithmetic, bitmap
    sketches) exposed as a user-facing scalar vocabulary and pinned
    against the oracle byte-for-byte. All JVM-side whole-stage-codegen
    expressions; no UDFs."""
    n = load_table(spark, sf_dir, "nation")
    return n.select(
        "n_nationkey",
        F.md5(F.col("n_name")).alias("md5_name"),
        F.sha2(F.col("n_name"), 256).alias("sha256_name"),
        F.base64(F.col("n_name").cast("binary")).alias("b64_name"),
        F.hex(F.col("n_name")).alias("hex_name"),
        F.expr("n_nationkey ^ n_regionkey").cast("long").alias("k_xor"),
        F.expr("n_nationkey & n_regionkey").cast("long").alias("k_and"),
        F.expr("n_nationkey | n_regionkey").cast("long").alias("k_or"),
        F.expr("shiftleft(n_nationkey, 3)").cast("long").alias("k_shl"),
        F.expr("shiftright(n_nationkey, 1)").cast("long").alias("k_shr"),
        F.expr(
            "bit_count(shiftleft(CAST(n_nationkey AS BIGINT), 20)"
            " | CAST(n_regionkey AS BIGINT))"
        )
        .cast("long")
        .alias("k_popcnt"),
    )


# --------------------------------------------------------------------------
# C180 — bitemporal ledger: event-time latest AS OF a system-time cut
# --------------------------------------------------------------------------

_BITEMP_ORACLE = f"""
WITH {LEDGER_CTE},
cut AS (SELECT CAST(MAX(run_id) // 2 AS BIGINT) AS s FROM pipeline_runs),
asof_v AS (
  SELECT pipeline_name, index_name, run_id, query_window_start_ts,
         ROW_NUMBER() OVER (PARTITION BY pipeline_name, index_name
                            ORDER BY query_window_start_ts DESC,
                                     run_id DESC) AS rn
  FROM pipeline_runs, cut
  WHERE run_id <= cut.s
),
now_ AS (
  SELECT pipeline_name, index_name, run_id, query_window_start_ts,
         ROW_NUMBER() OVER (PARTITION BY pipeline_name, index_name
                            ORDER BY query_window_start_ts DESC,
                                     run_id DESC) AS rn
  FROM pipeline_runs
)
SELECT n.pipeline_name, n.index_name,
       a.run_id AS asof_run_id,
       a.query_window_start_ts AS asof_start_ts,
       n.run_id AS now_run_id,
       n.query_window_start_ts AS now_start_ts,
       (a.run_id IS DISTINCT FROM n.run_id) AS changed
FROM now_ n
LEFT JOIN asof_v a
  ON n.pipeline_name = a.pipeline_name AND n.index_name = a.index_name
 AND a.rn = 1
WHERE n.rn = 1
"""


@workload("ledger_bitemporal_asof", oracle=_BITEMP_ORACLE)
def ledger_bitemporal_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitemporal ledger reconstruction: the ledger's append-only run_id
    is its SYSTEM time, the query windows its EVENT time. 'What did the
    latest-run-per-(pipeline, index) view look like when only the first
    half of the ledger had been ingested?' — filter to run_id <= cut
    (system-time travel over an append-only table needs no snapshots,
    just a monotone ingest id), take the event-time latest per group on
    both the cut and the full ledger, and diff. The cut is a bounded
    driver scalar (MAX // 2); per-group latest rows are key-partitioned
    windows. This is the audit query behind 'which groups' current state
    is newer than snapshot S' — reference ledger semantics
    (snowflake_tasks.py latest-record queries) extended along the system
    axis."""
    runs = derived_ledger(spark, sf_dir)
    cut = runs.agg(F.expr("CAST(MAX(run_id) div 2 AS BIGINT)").alias("s")).collect()[
        0
    ]["s"]
    w = Window.partitionBy("pipeline_name", "index_name").orderBy(
        F.col("query_window_start_ts").desc(), F.col("run_id").desc()
    )
    base = runs.select(
        "pipeline_name", "index_name", "run_id", "query_window_start_ts"
    )
    asof = (
        base.filter(F.col("run_id") <= F.lit(cut))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "pipeline_name",
            "index_name",
            F.col("run_id").alias("asof_run_id"),
            F.col("query_window_start_ts").alias("asof_start_ts"),
        )
    )
    now = (
        base.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "pipeline_name",
            "index_name",
            F.col("run_id").alias("now_run_id"),
            F.col("query_window_start_ts").alias("now_start_ts"),
        )
    )
    return now.join(asof, ["pipeline_name", "index_name"], "left").select(
        "pipeline_name",
        "index_name",
        "asof_run_id",
        "asof_start_ts",
        "now_run_id",
        "now_start_ts",
        (~F.col("asof_run_id").eqNullSafe(F.col("now_run_id"))).alias("changed"),
    )
