"""Round-4i workloads: Cramér's V effect size and the Python DataSource
API surface.

Determinism notes:
  - Cramér's V extends the C93 chi-square machinery (exact integer
    cross-products per cell, scaled-integer term sum) with one more
    fixed expression — sqrt is IEEE-correctly-rounded, so
    V = sqrt(chi2 / (n * min(r-1, c-1))) is hash-stable.
  - The det_range source generates pure-integer rows; the oracle states
    the identical generator over DuckDB's range(n).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sample_data_pipeline_project_spark.sources.catalog import load_table
from sample_data_pipeline_project_spark.sources.pydatasource import (
    register_det_range,
)
from sample_data_pipeline_project_spark.workloads import workload

# --------------------------------------------------------------------------
# C194 — Cramér's V effect size over the type x weekday contingency table
# --------------------------------------------------------------------------

_CHI2_TERM = (
    "(CAST(n AS DOUBLE) * CAST(c_xy AS DOUBLE)"
    " - CAST(c_x AS DOUBLE) * CAST(c_y AS DOUBLE))"
    " * (CAST(n AS DOUBLE) * CAST(c_xy AS DOUBLE)"
    " - CAST(c_x AS DOUBLE) * CAST(c_y AS DOUBLE))"
    " / (CAST(n AS DOUBLE) * CAST(c_x AS DOUBLE) * CAST(c_y AS DOUBLE))"
)
_V_EXPR = (
    "sqrt((CAST(chi2_scaled AS DOUBLE) / 1000000000.0)"
    " / (CAST(n_events AS DOUBLE)"
    " * CAST(LEAST(n_rows - 1, n_cols - 1) AS DOUBLE)))"
)

_CV_ORACLE = f"""
WITH e AS (
  SELECT event_type AS x,
         date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) % 7 AS y
  FROM events
),
xy AS (SELECT x, y, COUNT(*) AS c_xy FROM e GROUP BY x, y),
mx AS (SELECT x, SUM(c_xy) AS c_x FROM xy GROUP BY x),
my AS (SELECT y, SUM(c_xy) AS c_y FROM xy GROUP BY y),
n AS (SELECT SUM(c_xy) AS n FROM xy),
dims AS (
  SELECT (SELECT COUNT(*) FROM mx) AS n_rows,
         (SELECT COUNT(*) FROM my) AS n_cols
),
terms AS (
  SELECT CAST(ROUND({_CHI2_TERM} * 1000000000.0, 0) AS BIGINT) AS term_scaled,
         n.n
  FROM xy JOIN mx ON xy.x = mx.x JOIN my ON xy.y = my.y CROSS JOIN n
),
agg AS (
  SELECT CAST(t.n AS BIGINT) AS n_events,
         CAST(SUM(t.term_scaled) AS BIGINT) AS chi2_scaled
  FROM terms t GROUP BY t.n
)
SELECT a.n_events,
       CAST(d.n_rows AS BIGINT) AS n_rows,
       CAST(d.n_cols AS BIGINT) AS n_cols,
       CAST(a.chi2_scaled AS DOUBLE) / 1000000000.0 AS chi2,
       {_V_EXPR} AS cramers_v
FROM agg a CROSS JOIN dims d
"""


@workload("stats_cramers_v_type_dow", oracle=_CV_ORACLE)
def stats_cramers_v_type_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V — the [0,1]-normalized effect size of the C93
    chi-square statistic: V = sqrt(chi2 / (n * min(r-1, c-1))). The
    chi-square test says WHETHER type and weekday are dependent; V says
    HOW MUCH, comparably across tables of different shape. Identical
    exact-integer cell machinery (scaled-int term sum), one extra fixed
    expression; r and c are the contingency dimensions. sqrt is
    IEEE-exact on both engines."""
    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        F.col("event_type").alias("x"),
        F.pmod(
            F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")),
            F.lit(7),
        )
        .cast("long")
        .alias("y"),
    )
    xy = e.groupBy("x", "y").agg(F.count(F.lit(1)).alias("c_xy"))
    mx = xy.groupBy("x").agg(F.sum("c_xy").alias("c_x"))
    my = xy.groupBy("y").agg(F.sum("c_xy").alias("c_y"))
    n = xy.agg(F.sum("c_xy").alias("n"))
    r_c = mx.agg(F.count(F.lit(1)).alias("n_rows")).crossJoin(
        F.broadcast(my.agg(F.count(F.lit(1)).alias("n_cols")))
    )
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
    agg = (
        terms.groupBy("n")
        .agg(F.sum("term_scaled").cast("long").alias("chi2_scaled"))
        .select(F.col("n").cast("long").alias("n_events"), "chi2_scaled")
    )
    return agg.crossJoin(F.broadcast(r_c)).select(
        "n_events",
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("n_cols").cast("long").alias("n_cols"),
        (F.col("chi2_scaled").cast("double") / 1000000000.0).alias("chi2"),
        F.expr(_V_EXPR).alias("cramers_v"),
    )


# --------------------------------------------------------------------------
# C195 — Python DataSource API: partitioned deterministic generator
# --------------------------------------------------------------------------

_DS_N = 100_000
_DS_PARTS = 8

_DS_ORACLE = f"""
WITH t AS (
  SELECT CAST(r.range AS BIGINT) AS id,
         CAST(r.range % 10 AS BIGINT) AS bucket,
         CAST((r.range * 2654435761) % 1000003 AS BIGINT) AS val
  FROM range({_DS_N}) r
)
SELECT bucket,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(val) AS BIGINT) AS sum_val,
       CAST(MIN(val) AS BIGINT) AS min_val,
       CAST(MAX(val) AS BIGINT) AS max_val,
       CAST(SUM(CASE WHEN val % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_even
FROM t GROUP BY bucket
"""


@workload("source_python_datasource", oracle=_DS_ORACLE)
def source_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Spark 4 Python DataSource API exercised end to end: a custom
    `DataSource` subclass (sources/pydatasource.py) declares a schema,
    consumes reader options, plans {parts} splittable partitions, and
    streams Arrow batches per partition — the contract for exposing any
    external system (API, queue, bespoke format) as a distributed table
    WITHOUT a JVM connector. The generator is pure integer arithmetic
    (Knuth multiplicative mix), so the oracle states the identical rows
    from range({n}) and the whole source rides the ordinary value-hash
    gate. Partition count is the parallelism knob; each partition owns a
    residue class, so the split is balanced and order-independent."""
    register_det_range(spark)
    t = (
        spark.read.format("det_range")
        .option("n", str(_DS_N))
        .option("partitions", str(_DS_PARTS))
        .load()
    )
    return t.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum("val").cast("long").alias("sum_val"),
        F.min("val").cast("long").alias("min_val"),
        F.max("val").cast("long").alias("max_val"),
        F.sum(F.when(F.col("val") % 2 == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_even"),
    )
