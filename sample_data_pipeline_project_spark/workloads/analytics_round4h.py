"""Round-4h workloads: association rules, hierarchical share-of-parent
rollups, and join-based period-over-period growth.

Determinism notes:
  - Association-rule metrics (support / confidence / lift) are fixed
    double expressions over exact basket counts; the minimum-support
    filter is pure integer arithmetic (n_both * 200 >= n_orders).
  - Share-of-parent uses a REGION-partitioned window over the grouped
    frame (many small partitions); the corpus total re-enters as a
    bounded driver scalar, never a global window.
  - Month-over-month / year-over-year growth is computed by SELF-JOINS
    on calendar-shifted month keys — no window at all, so the monthly
    series can live on any partitioning at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sample_data_pipeline_project_spark.sources.catalog import load_table
from sample_data_pipeline_project_spark.workloads import workload

_CENTS_O = "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"

# --------------------------------------------------------------------------
# C191 — brand-level association rules (support / confidence / lift)
# --------------------------------------------------------------------------

_AR_EXPRS = {
    "support": "CAST(n_both AS DOUBLE) / CAST(n_orders AS DOUBLE)",
    "confidence": "CAST(n_both AS DOUBLE) / CAST(n_a AS DOUBLE)",
    "lift": (
        "CAST(n_both AS DOUBLE) * CAST(n_orders AS DOUBLE)"
        " / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))"
    ),
}

_AR_ORACLE = f"""
WITH baskets AS (
  SELECT DISTINCT l.l_orderkey AS ok, p.p_brand AS brand
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
),
nn AS (SELECT CAST(COUNT(DISTINCT ok) AS BIGINT) AS n_orders FROM baskets),
items AS (SELECT brand, CAST(COUNT(*) AS BIGINT) AS n_item FROM baskets GROUP BY brand),
pairs AS (
  SELECT a.brand AS a, b.brand AS b, CAST(COUNT(*) AS BIGINT) AS n_both
  FROM baskets a JOIN baskets b ON a.ok = b.ok AND a.brand <> b.brand
  GROUP BY a.brand, b.brand
),
scored AS (
  SELECT p.a, p.b, p.n_both, ia.n_item AS n_a, ib.n_item AS n_b, nn.n_orders
  FROM pairs p
  JOIN items ia ON p.a = ia.brand
  JOIN items ib ON p.b = ib.brand
  CROSS JOIN nn
  WHERE p.n_both * 200 >= nn.n_orders
)
SELECT a, b, n_both, n_a, n_b,
       {_AR_EXPRS["support"]} AS support,
       {_AR_EXPRS["confidence"]} AS confidence,
       {_AR_EXPRS["lift"]} AS lift
FROM scored
"""


@workload("reco_association_rules", oracle=_AR_ORACLE)
def reco_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-antecedent association rules X -> Y over order baskets at
    the brand level: support, confidence and lift for every DIRECTED
    brand pair clearing a 0.5% minimum support (an integer-arithmetic
    filter, n_both*200 >= n_orders — no float threshold). The basket
    table is DISTINCT (order, brand) so per-order pair fan-out is
    bounded by the squared basket width, and the rule table is
    item-domain-bounded (|brands|^2) — the Apriori L2 step, which is
    the part of market-basket mining that matters at warehouse scale
    because L1/L2 prune everything downstream. Metrics are fixed double
    expressions over exact counts; C55 (event-type lift) and C118
    (co-purchase cosine) cover the undirected normalizations."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    p = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey"), F.col("p_brand").alias("brand")
    )
    baskets = (
        li.join(F.broadcast(p), "l_partkey")
        .select(F.col("l_orderkey").alias("ok"), "brand")
        .distinct()
    )
    n_orders = baskets.select("ok").distinct().count()
    items = baskets.groupBy("brand").agg(
        F.count(F.lit(1)).cast("long").alias("n_item")
    )
    a, b = baskets.alias("a"), baskets.alias("b")
    pairs = (
        a.join(b, (F.col("a.ok") == F.col("b.ok")) & (F.col("a.brand") != F.col("b.brand")))
        .groupBy(F.col("a.brand").alias("a"), F.col("b.brand").alias("b"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_both"))
    )
    ia = items.select(F.col("brand").alias("a"), F.col("n_item").alias("n_a"))
    ib = items.select(F.col("brand").alias("b"), F.col("n_item").alias("n_b"))
    scored = (
        pairs.join(F.broadcast(ia), "a")
        .join(F.broadcast(ib), "b")
        .withColumn("n_orders", F.lit(int(n_orders)).cast("long"))
        .filter(F.col("n_both") * 200 >= F.col("n_orders"))
    )
    return scored.select(
        "a",
        "b",
        "n_both",
        "n_a",
        "n_b",
        F.expr(_AR_EXPRS["support"]).alias("support"),
        F.expr(_AR_EXPRS["confidence"]).alias("confidence"),
        F.expr(_AR_EXPRS["lift"]).alias("lift"),
    )


# --------------------------------------------------------------------------
# C192 — hierarchical share-of-parent revenue rollup
# --------------------------------------------------------------------------

_SHARE_EXPRS = {
    "share_of_region": "CAST(rev_cents AS DOUBLE) / CAST(region_cents AS DOUBLE)",
    "share_of_total": "CAST(rev_cents AS DOUBLE) / CAST(total_cents AS DOUBLE)",
}

_SHARE_ORACLE = f"""
WITH rev AS (
  SELECT r.r_name AS region, n.n_name AS nation,
         CAST(SUM({_CENTS_O}) AS BIGINT) AS rev_cents
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  GROUP BY r.r_name, n.n_name
),
shares AS (
  SELECT region, nation, rev_cents,
         CAST(SUM(rev_cents) OVER (PARTITION BY region) AS BIGINT)
           AS region_cents,
         CAST(SUM(rev_cents) OVER () AS BIGINT) AS total_cents
  FROM rev
)
SELECT region, nation, rev_cents, region_cents,
       {_SHARE_EXPRS["share_of_region"]} AS share_of_region,
       {_SHARE_EXPRS["share_of_total"]} AS share_of_total
FROM shares
"""


@workload("rollup_share_of_parent", oracle=_SHARE_ORACLE)
def rollup_share_of_parent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share-of-parent revenue rollup along the geography hierarchy:
    each nation's revenue beside its share of the region and of the
    corpus — the percent-of-parent column every BI drilldown renders
    next to a rollup. The region share is a REGION-partitioned window
    over the (|nations|-row) grouped frame; the corpus total re-enters
    as a bounded driver scalar, so no global window exists. Dimension
    joins broadcast; shares are fixed divisions of exact cents."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    r = load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    rev = (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(F.sum(F.expr(_CENTS_O)).cast("long").alias("rev_cents"))
    )
    total = int(rev.agg(F.sum("rev_cents")).first()[0])
    w = Window.partitionBy("region")
    shares = rev.select(
        "region",
        "nation",
        "rev_cents",
        F.sum("rev_cents").over(w).cast("long").alias("region_cents"),
        F.lit(total).cast("long").alias("total_cents"),
    )
    return shares.select(
        "region",
        "nation",
        "rev_cents",
        "region_cents",
        F.expr(_SHARE_EXPRS["share_of_region"]).alias("share_of_region"),
        F.expr(_SHARE_EXPRS["share_of_total"]).alias("share_of_total"),
    )


# --------------------------------------------------------------------------
# C193 — MoM / YoY growth via calendar-shifted self-joins (window-free)
# --------------------------------------------------------------------------

_GROWTH_EXPRS = {
    "mom": "CAST(rev_cents - prev_cents AS DOUBLE) / CAST(prev_cents AS DOUBLE)",
    "yoy": "CAST(rev_cents - yoy_cents AS DOUBLE) / CAST(yoy_cents AS DOUBLE)",
}

_MOMYOY_ORACLE = f"""
WITH monthly AS (
  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
         CAST(SUM({_CENTS_O}) AS BIGINT) AS rev_cents
  FROM orders GROUP BY 1
),
joined AS (
  SELECT c.month, c.rev_cents,
         p.rev_cents AS prev_cents,
         y.rev_cents AS yoy_cents
  FROM monthly c
  LEFT JOIN monthly p ON p.month + INTERVAL 1 MONTH = c.month
  LEFT JOIN monthly y ON y.month + INTERVAL 12 MONTH = c.month
)
SELECT month, rev_cents, prev_cents, yoy_cents,
       {_GROWTH_EXPRS["mom"]} AS mom_growth,
       {_GROWTH_EXPRS["yoy"]} AS yoy_growth
FROM joined
"""


@workload("timeseries_mom_yoy_growth", oracle=_MOMYOY_ORACLE)
def timeseries_mom_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month and year-over-year revenue growth WITHOUT any
    window function: the monthly aggregate self-joins on calendar-
    shifted month keys (m-1, m-12), so the series needs no ordering
    guarantee and no single-partition sort — the period-over-period
    pattern that scales to per-key series by just adding the key to the
    join. Growth rates are one fixed division of exact cents deltas;
    series-start months carry NULLs (LEFT joins), matching standard BI
    semantics."""
    o = load_table(spark, sf_dir, "orders")
    monthly = (
        o.groupBy(
            F.date_trunc("month", F.col("o_orderdate")).cast("date").alias("month")
        )
        .agg(F.sum(F.expr(_CENTS_O)).cast("long").alias("rev_cents"))
    )
    c = monthly.alias("c")
    p = monthly.select(
        F.add_months(F.col("month"), 1).alias("month"),
        F.col("rev_cents").alias("prev_cents"),
    )
    y = monthly.select(
        F.add_months(F.col("month"), 12).alias("month"),
        F.col("rev_cents").alias("yoy_cents"),
    )
    joined = c.join(F.broadcast(p), "month", "left").join(
        F.broadcast(y), "month", "left"
    )
    return joined.select(
        "month",
        "rev_cents",
        "prev_cents",
        "yoy_cents",
        F.expr(_GROWTH_EXPRS["mom"]).alias("mom_growth"),
        F.expr(_GROWTH_EXPRS["yoy"]).alias("yoy_growth"),
    )
