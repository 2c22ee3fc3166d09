"""Round-4k workload: cumulative feature-adoption curves.

Determinism notes: first-use days are exact MIN() per (user, type); the
cumulative curve over days uses the C113 bucketed cumsum ((type, month)
offsets + bucket-partitioned windows), so the full-history running total
never rides a single-partition window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sample_data_pipeline_project_spark.sources.catalog import load_table
from sample_data_pipeline_project_spark.workloads import workload

# --------------------------------------------------------------------------
# C199 — cumulative adoption curve per event type (first-use accumulation)
# --------------------------------------------------------------------------

_NU_ORACLE = """
WITH first_use AS (
  SELECT event_type, user_id, MIN(CAST(ts AS DATE)) AS day
  FROM events GROUP BY event_type, user_id
),
daily AS (
  SELECT event_type, day, CAST(COUNT(*) AS BIGINT) AS new_users
  FROM first_use GROUP BY event_type, day
)
SELECT event_type, day, new_users,
       CAST(SUM(new_users) OVER (PARTITION BY event_type ORDER BY day
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND CURRENT ROW) AS BIGINT)
         AS cumulative_users
FROM daily
"""


@workload("events_new_user_cumulative", oracle=_NU_ORACLE)
def events_new_user_cumulative(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-adoption curves: per event type and day, how many users
    perform that action for the FIRST time, and the running total of
    users who have ever performed it — the "users who have tried X"
    chart, and the exact complement of the HLL trailing-WAU sketch
    (C128): all-time distinct accumulation is windowable because
    first-use collapses each (user, type) to one row. The running total
    uses the C113 bucketed cumsum with (type, MONTH) buckets — bounded
    per-bucket totals collected, exclusive offsets broadcast back,
    day-level running sums inside bucket-partitioned windows — so the
    full-history curve has no per-type global window even when one type
    spans years. The oracle states the same curve with plain single-node
    windows."""
    e = load_table(spark, sf_dir, "events")
    first_use = e.groupBy("event_type", "user_id").agg(
        F.min(F.col("ts").cast("date")).alias("day")
    )
    daily = first_use.groupBy("event_type", "day").agg(
        F.count(F.lit(1)).cast("long").alias("new_users")
    )
    daily = daily.withColumn(
        "mon", F.date_trunc("month", F.col("day")).cast("date")
    )
    mtot = sorted(
        daily.groupBy("event_type", "mon")
        .agg(F.sum("new_users").alias("s"))
        .collect(),
        key=lambda r: (r["event_type"], r["mon"]),
    )
    offs, acc = [], {}
    for r in mtot:
        t = r["event_type"]
        offs.append((t, r["mon"], acc.get(t, 0)))
        acc[t] = acc.get(t, 0) + r["s"]
    off_df = F.broadcast(
        spark.createDataFrame(
            offs or [(None, None, 0)], "event_type string, mon date, off long"
        )
    )
    w = (
        Window.partitionBy("event_type", "mon")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        daily.join(off_df, ["event_type", "mon"])
        .select(
            "event_type",
            "day",
            "new_users",
            (F.col("off") + F.sum("new_users").over(w))
            .cast("long")
            .alias("cumulative_users"),
        )
    )
