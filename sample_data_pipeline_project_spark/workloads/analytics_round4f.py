"""Round-4f workloads: volatility bands over grouped time series,
deterministic Poisson-bootstrap standard errors, and partitioned-layout
write/read certification.

Determinism notes:
  - Bollinger statistics are rolling exact sums (BIGINT cents, and
    DECIMAL(38,0) for the squared term, which overflows int64 at scale)
    with the mean/sd/band arithmetic in ONE fixed shared double
    expression; sqrt is IEEE-correctly-rounded on both engines.
  - Bootstrap replicate weights are Poisson(1) draws taken by inverting
    the CDF against the portable md5-u32 hash — the cumulative
    thresholds are precomputed integer literals, so both engines assign
    identical weights; each replicate mean is rounded to integer cents
    before the across-replicate variance so no order-dependent float
    summation ever happens.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sample_data_pipeline_project_spark.functions.text import md5_prefix_uint32_sql
from sample_data_pipeline_project_spark.sources.catalog import load_table
from sample_data_pipeline_project_spark.sources.scratch import scratch_dir
from sample_data_pipeline_project_spark.workloads import workload

_CENTS_O = "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"

# --------------------------------------------------------------------------
# C185 — Bollinger bands over per-nation daily revenue
# --------------------------------------------------------------------------

_BB_MEAN = "CASE WHEN roll_n = 7 THEN CAST(roll_s AS DOUBLE) / 7.0 END"
_BB_SD = (
    "CASE WHEN roll_n = 7 THEN sqrt(GREATEST(CAST(0 AS DOUBLE),"
    " (CAST(roll_ssq AS DOUBLE)"
    " - CAST(roll_s AS DOUBLE) * CAST(roll_s AS DOUBLE) / 7.0) / 6.0)) END"
)
_BB_UP = "mean7 + 2.0 * sd7"
_BB_LO = "mean7 - 2.0 * sd7"
_BB_OUT = (
    "CASE WHEN roll_n = 7 THEN CAST(rev_cents AS DOUBLE) > upper_band"
    " OR CAST(rev_cents AS DOUBLE) < lower_band END"
)

_BB_ORACLE = f"""
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
         CAST(SUM(rev_cents) OVER w AS BIGINT) AS roll_s,
         CAST(SUM(CAST(rev_cents AS DECIMAL(38,0)) * rev_cents) OVER w
              AS DECIMAL(38,0)) AS roll_ssq
  FROM daily
  WINDOW w AS (PARTITION BY nationkey ORDER BY day
               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
),
banded AS (
  SELECT nationkey, day, rev_cents, roll_n,
         {_BB_MEAN} AS mean7, {_BB_SD} AS sd7
  FROM rolled
),
full_ AS (
  SELECT *, {_BB_UP} AS upper_band, {_BB_LO} AS lower_band FROM banded
)
SELECT nationkey, day, rev_cents, roll_n, mean7, sd7, upper_band, lower_band,
       {_BB_OUT} AS is_outlier
FROM full_
"""


@workload("timeseries_bollinger_bands", oracle=_BB_ORACLE)
def timeseries_bollinger_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bollinger volatility bands over each nation's daily revenue
    series: 7-observation rolling mean and sample standard deviation
    (exact BIGINT cents sums; the squared-sum rides DECIMAL(38,0)
    because cents^2 overflows int64 at warehouse scale), bands at
    mean +/- 2 sd, and an outlier flag for days that pierce a band —
    the classic control-chart / anomaly-band primitive. Bands are NULL
    until a full 7-day history exists (trading-days semantics: the
    window counts OBSERVED days per nation). The rolling windows
    partition by nation — many independent series, never a global sort;
    all band arithmetic is one fixed shared double expression over the
    exact rolling sums."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    cents = F.expr(_CENTS_O)
    daily = (
        o.join(F.broadcast(c.select("c_custkey", "c_nationkey")),
               o["o_custkey"] == F.col("c_custkey"))
        .groupBy(
            F.col("c_nationkey").alias("nationkey"),
            F.col("o_orderdate").cast("date").alias("day"),
        )
        .agg(F.sum(cents).cast("long").alias("rev_cents"))
    )
    w = Window.partitionBy("nationkey").orderBy("day").rowsBetween(-6, 0)
    rolled = daily.select(
        "nationkey",
        "day",
        "rev_cents",
        F.count(F.lit(1)).over(w).cast("long").alias("roll_n"),
        F.sum("rev_cents").over(w).cast("long").alias("roll_s"),
        F.sum(F.col("rev_cents").cast("decimal(38,0)") * F.col("rev_cents"))
        .over(w)
        .cast("decimal(38,0)")
        .alias("roll_ssq"),
    )
    banded = rolled.withColumn("mean7", F.expr(_BB_MEAN)).withColumn(
        "sd7", F.expr(_BB_SD)
    )
    full = banded.withColumn("upper_band", F.expr(_BB_UP)).withColumn(
        "lower_band", F.expr(_BB_LO)
    )
    return full.select(
        "nationkey",
        "day",
        "rev_cents",
        "roll_n",
        "mean7",
        "sd7",
        "upper_band",
        "lower_band",
        F.expr(_BB_OUT).alias("is_outlier"),
    )


# --------------------------------------------------------------------------
# C186 — Poisson bootstrap standard error with deterministic hash draws
# --------------------------------------------------------------------------

_BOOT_B = 32
# Cumulative Poisson(1) CDF * 2^16 as integer thresholds (k = 0..5; the
# residual mass maps to weight 6). Computed once in Python — both
# engines compare the same 16-bit hash draw against the same literals.
_POIS_T = []
_acc = 0.0
for _k in range(6):
    _acc += math.exp(-1) / math.factorial(_k)
    _POIS_T.append(round(_acc * (1 << 16)))


# 32 u16 draws per row from 4 md5 digests (8 draws each). The digests
# are MATERIALIZED as columns h0..h3 in a prior projection (forced CSE:
# each engine hashes 4x per row, not 32x), then each draw is a cheap
# 4-hex-char slice decoded to 0..65535 — Spark via conv(,16,10), DuckDB
# via the 0x-prefix cast; both are the correctly-rounded integer of the
# same hex text.
_BOOT_GS = [(g, s) for g in range(_BOOT_B // 8) for s in range(8)]
_BOOT_DRAWS_SPARK = [
    f"CAST(conv(substr(h{g}, {s * 4 + 1}, 4), 16, 10) AS INT)" for g, s in _BOOT_GS
]
_BOOT_DRAWS_DUCK = [
    f"CAST('0x' || substr(h{g}, {s * 4 + 1}, 4) AS INTEGER)" for g, s in _BOOT_GS
]
_BOOT_HASH_SQL = [
    f"md5('boot' || {g} || '|' || CAST(o_orderkey AS STRING)) AS h{g}"
    for g in range(_BOOT_B // 8)
]
_W_CASE = (
    "CASE "
    + " ".join(f"WHEN u16 < {t} THEN {k}" for k, t in enumerate(_POIS_T))
    + " ELSE 6 END"
)
_SE_EXPR = (
    "sqrt(GREATEST(CAST(0 AS DOUBLE), (CAST(ss AS DOUBLE)"
    f" - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / {_BOOT_B}.0) / {_BOOT_B - 1}.0))"
)

_BOOT_ORACLE = f"""
WITH hashed AS (
  SELECT {_CENTS_O} AS y, {", ".join(_BOOT_HASH_SQL)}
  FROM orders
),
weighted AS (
  SELECT unnest([{", ".join(str(b) for b in range(_BOOT_B))}]) AS b,
         unnest([{", ".join(_BOOT_DRAWS_DUCK)}]) AS u16,
         y
  FROM hashed
),
reps AS (
  SELECT b,
         CAST(SUM({_W_CASE}) AS BIGINT) AS sum_w,
         CAST(SUM(({_W_CASE}) * y) AS BIGINT) AS sum_wy
  FROM weighted GROUP BY b
),
means AS (
  SELECT b, CAST(ROUND(CAST(sum_wy AS DOUBLE) / CAST(sum_w AS DOUBLE))
                AS BIGINT) AS mean_cents_b
  FROM reps
),
agg AS (
  SELECT CAST(SUM(mean_cents_b) AS BIGINT) AS s,
         CAST(SUM(mean_cents_b * mean_cents_b) AS BIGINT) AS ss
  FROM means
),
base AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(SUM({_CENTS_O}) AS BIGINT) AS sum_y
  FROM orders
)
SELECT n_rows,
       CAST(sum_y AS DOUBLE) / CAST(n_rows AS DOUBLE) AS mean_cents,
       CAST({_BOOT_B} AS BIGINT) AS n_reps,
       CAST(s AS DOUBLE) / {_BOOT_B}.0 AS boot_mean_cents,
       {_SE_EXPR} AS se_cents
FROM base JOIN agg ON 1 = 1
"""


@workload("stats_poisson_bootstrap_se", oracle=_BOOT_ORACLE)
def stats_poisson_bootstrap_se(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standard error of the mean order price by DETERMINISTIC Poisson
    bootstrap: each of B=32 replicates weights every row by a Poisson(1)
    draw obtained by inverting the CDF against a 16-bit slice of the
    row's md5 digests (precomputed integer thresholds — no RNG,
    identical draws on both engines and on every rerun). Each row hashes
    only B/8 times: one 128-bit digest yields EIGHT independent u16
    draws, extracted before a posexplode fans the replicate dimension
    out map-side (no join, no data duplication on disk). Replicate sums
    are one grouped aggregation of exact int64s, and each replicate
    mean is rounded to integer cents before the across-replicate
    variance — the trick that keeps the final sd free of
    order-dependent float summation."""
    o = load_table(spark, sf_dir, "orders")
    y = F.expr(_CENTS_O)
    hashed = o.select(
        y.alias("y"),
        *[
            F.expr(
                f"md5('boot' || {g} || '|' || CAST(o_orderkey AS STRING))"
            ).alias(f"h{g}")
            for g in range(_BOOT_B // 8)
        ],
    )
    weighted = hashed.select(
        "y",
        F.posexplode(F.array(*[F.expr(d) for d in _BOOT_DRAWS_SPARK])).alias(
            "b", "u16"
        ),
    ).select("y", "b", F.expr(_W_CASE).alias("w"))
    reps = weighted.groupBy("b").agg(
        F.sum("w").cast("long").alias("sum_w"),
        F.sum(F.col("w") * F.col("y")).cast("long").alias("sum_wy"),
    )
    means = reps.select(
        F.round(F.col("sum_wy").cast("double") / F.col("sum_w").cast("double"))
        .cast("long")
        .alias("mean_cents_b")
    )
    agg = means.agg(
        F.sum("mean_cents_b").cast("long").alias("s"),
        F.sum(F.col("mean_cents_b") * F.col("mean_cents_b")).cast("long").alias("ss"),
    ).withColumn("j", F.lit(1))
    base = o.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(y).cast("long").alias("sum_y"),
    ).withColumn("j", F.lit(1))
    return base.join(F.broadcast(agg), "j").select(
        "n_rows",
        (F.col("sum_y").cast("double") / F.col("n_rows").cast("double")).alias(
            "mean_cents"
        ),
        F.lit(_BOOT_B).cast("long").alias("n_reps"),
        (F.col("s").cast("double") / F.lit(float(_BOOT_B))).alias("boot_mean_cents"),
        F.expr(_SE_EXPR).alias("se_cents"),
    )


# --------------------------------------------------------------------------
# C187 — hive-partitioned write + partition-pruned read-back certification
# --------------------------------------------------------------------------

_PART_ORACLE = """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(ROUND(value, 2) AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events
WHERE event_type IN ('click', 'view')
GROUP BY event_type
"""


@workload("source_partitioned_roundtrip", oracle=_PART_ORACLE)
def source_partitioned_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-partitioned layout certification: write events partitioned
    by event_type to a per-process scratch path, read the layout back
    with a partition filter, and prove the round trip preserves the
    data (per-type counts and exact DECIMAL value sums vs the oracle on
    the ORIGINAL table). The workload HARD-FAILS unless the read plan
    shows partition pruning (PartitionFilters on event_type) — a silent
    full-layout scan is a correctness bug of the layout, not a perf
    footnote, because partition pruning is the entire point of the
    directory scheme at 100 TB. Timestamps round-trip through the
    engine's NTZ normalization (sources/catalog.py)."""
    e = load_table(spark, sf_dir, "events")
    root = scratch_dir("part_roundtrip")
    e.write.partitionBy("event_type").mode("overwrite").parquet(root)
    back = spark.read.parquet(root).filter(
        F.col("event_type").isin("click", "view")
    )
    plan = back._jdf.queryExecution().executedPlan().toString()
    if "PartitionFilters: [" not in plan or "event_type" not in plan.split(
        "PartitionFilters", 1
    )[1].split("]", 1)[0]:
        raise AssertionError(
            "partitioned read-back did not prune on event_type; plan:\n" + plan
        )
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(F.round(F.col("value"), 2).cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_value"),
    )
