"""Relational workloads (B7 + general SQL coverage) over the TPC-H-ish
testdata: grouped aggregates, multi-table equi-joins (broadcast-able dims),
ranking windows, semi/anti joins, set ops, rollup, distinct, having.

Scale notes:
  - dimension tables (region/nation/supplier/part/customer) are explicitly
    `broadcast()`-hinted in the Spark builders — at 100 TB the fact tables
    shuffle only for their own aggregations, never to co-locate a dim join;
  - aggregates are partial (map-side combine) by construction;
  - double-typed metrics go through exact DECIMAL sums then one final cast
    to DOUBLE, making results independent of partial-agg ordering (and
    bit-identical to the DuckDB oracle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sample_data_pipeline_project_spark.sources.catalog import load_table
from sample_data_pipeline_project_spark.workloads import workload


def _dsum(expr: Column, dec: str = "DECIMAL(18,2)") -> Column:
    """Order-independent sum of a double expression: exact decimal sum,
    cast back to double at the end. The testdata money/quantity/rate
    columns are exact 2-decimal values, so the input cast is lossless; the
    decimal sum is then independent of partial-aggregation order and
    bit-identical across engines (double summation would be neither)."""
    return F.sum(expr.cast(dec)).cast("double")


def _revenue_dec() -> Column:
    """extendedprice * (1 - discount) in EXACT decimal arithmetic: inputs
    are 2-decimal values, so casting each operand to decimal first (not the
    double product afterwards) avoids engine-specific double->decimal
    rounding at the mantissa edge."""
    return (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1) - F.col("l_discount").cast("decimal(4,2)"))
    ).cast("decimal(18,4)")


_REV_DEC_SQL = (
    "CAST(CAST(l_extendedprice AS DECIMAL(18,2))"
    " * (1 - CAST(l_discount AS DECIMAL(4,2))) AS DECIMAL(18,4))"
)
_REV_SQL = f"CAST(SUM({_REV_DEC_SQL}) AS DOUBLE)"


# --------------------------------------------------------------------------
# TPC-H Q1 shape: scan + filter + group-agg (A2/A3/A8/B7)
# --------------------------------------------------------------------------
@workload(
    "tpch_q1_pricing_summary",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM({_REV_DEC_SQL}) AS DOUBLE) AS sum_disc_price,
       CAST(SUM({_REV_DEC_SQL} * (1 + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
       CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
)
def tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary: the canonical scan->filter->groupBy->agg pipeline.
    Partial aggregation keeps the shuffle at |groups| x |partitions| rows."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp_ntz")
    )
    n = F.count(F.lit(1))
    return l.groupBy("l_returnflag", "l_linestatus").agg(
        _dsum(F.col("l_quantity"), "DECIMAL(18,2)").alias("sum_qty"),
        _dsum(F.col("l_extendedprice"), "DECIMAL(18,2)").alias("sum_base_price"),
        F.sum(_revenue_dec()).cast("double").alias("sum_disc_price"),
        F.sum(_revenue_dec() * (F.lit(1) + F.col("l_tax").cast("decimal(4,2)")))
        .cast("double")
        .alias("sum_charge"),
        (_dsum(F.col("l_quantity"), "DECIMAL(18,2)") / n).alias("avg_qty"),
        (_dsum(F.col("l_extendedprice"), "DECIMAL(18,2)") / n).alias("avg_price"),
        (_dsum(F.col("l_discount"), "DECIMAL(18,6)") / n).alias("avg_disc"),
        n.alias("count_order"),
    )


# --------------------------------------------------------------------------
# TPC-H Q3 shape: 3-way join + group-agg + top-k (B7)
# --------------------------------------------------------------------------
@workload(
    "tpch_q3_shipping_priority",
    oracle=f"""
SELECT l_orderkey,
       {_REV_SQL} AS revenue,
       o_orderdate, o_orderpriority
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
""",
)
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unshipped-orders revenue: customer (filtered, broadcast) |><| orders
    |><| lineitem, grouped per order, global top-10 by revenue."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp_ntz")
    )
    l = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15 00:00:00").cast("timestamp_ntz")
    )
    return (
        F.broadcast(c.select("c_custkey"))
        .join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(_revenue_dec()).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


# --------------------------------------------------------------------------
# TPC-H Q5 shape: 6-way join + group-agg (B7)
# --------------------------------------------------------------------------
@workload(
    "tpch_q5_local_supplier_volume",
    oracle=f"""
SELECT n_name,
       {_REV_SQL} AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
""",
)
def tpch_q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-supplier volume: the classic snowflake-schema join tree.
    region/nation/supplier/customer are broadcast; only orders |><| lineitem
    shuffles (on orderkey)."""
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nt = load_table(spark, sf_dir, "nation")
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
    )
    l = load_table(spark, sf_dir, "lineitem")
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(s),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nt), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(F.sum(_revenue_dec()).cast("double").alias("revenue"))
    )


# --------------------------------------------------------------------------
# Ranking window: top-N per group (dense coverage for window functions)
# --------------------------------------------------------------------------
@workload(
    "window_topn_per_nation",
    oracle="""
SELECT n_name, c_custkey, c_acctbal, rnk
FROM (
  SELECT n_name, c_custkey, c_acctbal,
         RANK() OVER (PARTITION BY n_name ORDER BY c_acctbal DESC, c_custkey ASC) AS rnk
  FROM customer JOIN nation ON c_nationkey = n_nationkey
) t
WHERE rnk <= 3
""",
)
def window_topn_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 customers by balance per nation — RANK() over a partitioned
    window. Runs as one shuffle on the partition key (no global sort)."""
    c = load_table(spark, sf_dir, "customer")
    nt = load_table(spark, sf_dir, "nation")
    w = Window.partitionBy("n_name").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )
    return (
        c.join(F.broadcast(nt), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("n_name", "c_custkey", "c_acctbal", F.rank().over(w).alias("rnk"))
        .filter(F.col("rnk") <= 3)
    )


@workload(
    "window_running_order_total",
    oracle="""
SELECT o_custkey, o_orderkey, o_orderdate,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS DOUBLE) AS running_total
FROM orders
WHERE o_custkey < 100
""",
)
def window_running_order_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer running order total — frame-bounded window aggregate
    (rowsBetween unboundedPreceding/currentRow)."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 100)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).over(w).cast("double").alias("running_total"),
    )


# --------------------------------------------------------------------------
# Semi / anti joins
# --------------------------------------------------------------------------
@workload(
    "join_semi_customers_with_orders",
    oracle="""
SELECT c_custkey, c_name
FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
""",
)
def join_semi_customers_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join (EXISTS): customers having at least one order."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left_semi").select(
        "c_custkey", "c_name"
    )


@workload(
    "join_anti_customers_without_orders",
    oracle="""
SELECT c_custkey, c_name
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
""",
)
def join_anti_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join (NOT EXISTS): customers with no orders."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti").select(
        "c_custkey", "c_name"
    )


# --------------------------------------------------------------------------
# Set operations, distinct, rollup, having
# --------------------------------------------------------------------------
@workload(
    "setop_nations_customers_minus_suppliers",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
EXCEPT
SELECT s_nationkey AS nationkey FROM supplier
""",
)
def setop_nations_customers_minus_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (set difference) over nation keys."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.subtract(s)


@workload(
    "setop_union_all_keys",
    oracle="""
SELECT nationkey, COUNT(*) AS n
FROM (
  SELECT c_nationkey AS nationkey FROM customer
  UNION ALL
  SELECT s_nationkey AS nationkey FROM supplier
) u
GROUP BY nationkey
""",
)
def setop_union_all_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL + group count."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.unionAll(s).groupBy("nationkey").agg(F.count(F.lit(1)).alias("n"))


@workload(
    "distinct_mktsegments",
    oracle="SELECT DISTINCT c_mktsegment FROM customer",
)
def distinct_mktsegments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT (dedup on a projection)."""
    return load_table(spark, sf_dir, "customer").select("c_mktsegment").distinct()


@workload(
    "rollup_customers_by_region_nation",
    oracle="""
SELECT r_name, n_name, COUNT(*) AS n_customers
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
""",
)
def rollup_customers_by_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ROLLUP — hierarchical subtotals (region, nation, grand)."""
    c = load_table(spark, sf_dir, "customer")
    nt = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(nt), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .rollup("r_name", "n_name")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@workload(
    "having_big_orders_per_customer",
    oracle="""
SELECT o_custkey, COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spent
FROM orders
GROUP BY o_custkey
HAVING COUNT(*) >= 15
""",
)
def having_big_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY + HAVING (post-aggregation filter)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            _dsum(F.col("o_totalprice"), "DECIMAL(18,2)").alias("total_spent"),
        )
        .filter(F.col("n_orders") >= 15)
    )


# --------------------------------------------------------------------------
# Scalar function coverage: strings, dates, case (A18 + string funcs)
# --------------------------------------------------------------------------
@workload(
    "scalar_string_date_funcs",
    oracle="""
SELECT p_partkey,
       UPPER(p_brand) AS brand_upper,
       SUBSTRING(p_type, 1, 5) AS type_prefix,
       LENGTH(p_name) AS name_len,
       p_name || '/' || p_brand AS name_brand,
       CASE WHEN p_size >= 25 THEN 'large' WHEN p_size >= 10 THEN 'medium' ELSE 'small' END AS size_class
FROM part
WHERE p_partkey <= 500
""",
)
def scalar_string_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String/conditional scalar functions, all JVM-side codegen."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 500)
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.substring("p_type", 1, 5).alias("type_prefix"),
        F.length("p_name").alias("name_len"),
        F.concat_ws("/", "p_name", "p_brand").alias("name_brand"),
        F.when(F.col("p_size") >= 25, "large")
        .when(F.col("p_size") >= 10, "medium")
        .otherwise("small")
        .alias("size_class"),
    )


@workload(
    "date_trunc_monthly_orders",
    oracle="""
SELECT DATE_TRUNC('month', o_orderdate) AS order_month,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS month_total
FROM orders
GROUP BY DATE_TRUNC('month', o_orderdate)
""",
)
def date_trunc_monthly_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date functions (A18): month truncation + grouped aggregate.
    `F.trunc` yields DateType, matching DuckDB's date_trunc('month')."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(F.trunc(F.col("o_orderdate"), "month").alias("order_month"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            _dsum(F.col("o_totalprice"), "DECIMAL(18,2)").alias("month_total"),
        )
    )


@workload(
    "agg_minmax_minby_maxby",
    oracle="""
SELECT l_returnflag,
       MIN(l_extendedprice) AS min_price,
       MAX(l_extendedprice) AS max_price,
       MIN(l_shipdate) AS first_ship,
       MAX(l_shipdate) AS last_ship
FROM lineitem
GROUP BY l_returnflag
""",
)
def agg_minmax_minby_maxby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MIN/MAX over doubles and timestamps (comparison-only — exact across
    engines, no summation)."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
        F.min("l_shipdate").alias("first_ship"),
        F.max("l_shipdate").alias("last_ship"),
    )


@workload(
    "cube_orders_status_priority",
    oracle="""
SELECT o_orderstatus, o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
""",
)
def cube_orders_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY CUBE — all 4 grouping-set combinations in one pass (Spark
    expands to a single Expand + hash aggregate; no repeated scans)."""
    o = load_table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        _dsum(F.col("o_totalprice"), "DECIMAL(18,2)").alias("total_price"),
    )


@workload(
    "setop_intersect_nation_keys",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
INTERSECT
SELECT s_nationkey AS nationkey FROM supplier
""",
)
def setop_intersect_nation_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (set semantics): nations having both customers and
    suppliers. Spark plans a left-semi hash join over distincts."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.intersect(s)


@workload(
    "orders_above_customer_avg",
    oracle="""
SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
FROM orders o
WHERE o.o_totalprice > (
  SELECT 2 * AVG(o2.o_totalprice) FROM orders o2 WHERE o2.o_custkey = o.o_custkey
)
""",
)
def orders_above_customer_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (each order vs 2x its customer's average),
    decorrelated the way an optimizer would: one windowed average over
    o_custkey instead of a per-row subquery re-scan — a single shuffle.

    The comparison uses exact decimal division (count/sum decimals), so
    both engines evaluate the same predicate bit-for-bit."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey")
    avg_dec = (
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).over(w)
        / F.count(F.lit(1)).over(w)
    )
    return (
        o.withColumn("__avg", avg_dec)
        .filter(F.col("o_totalprice").cast("decimal(18,2)") > 2 * F.col("__avg"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@workload(
    "join_bigbig_orders_lineitem",
    oracle=f"""
SELECT o.o_orderpriority,
       COUNT(*) AS n_items,
       {_REV_SQL} AS revenue
FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderpriority
""",
)
def join_bigbig_orders_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-to-fact join (orders x lineitem): at warehouse scale neither
    side broadcasts, so this is the shuffle-join path — both sides hash on
    l_orderkey/o_orderkey and AQE coalesces/splits partitions at runtime.
    (At test SF AQE may still elect a broadcast; the logical shape is what
    scales.)"""
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(_revenue_dec()).cast("double").alias("revenue"),
        )
    )


@workload(
    "percentile_order_prices",
    oracle="""
SELECT o_orderpriority,
       quantile_cont(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT), 0.25) AS p25_cents,
       quantile_cont(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT), 0.5)  AS p50_cents,
       quantile_cont(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT), 0.75) AS p75_cents
FROM orders
GROUP BY o_orderpriority
""",
)
def percentile_order_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (type-7 quantile, the definition both
    Spark's `percentile` and DuckDB's `quantile_cont` implement). Inputs
    are integer cents VIA DECIMAL — a direct float*100 -> BIGINT cast
    truncates in Spark but rounds in DuckDB, and float error puts ~half
    of all 2-decimal prices a hair below the integer (caught by the
    driver-canon checker at sf0.001); the DECIMAL(18,2) hop makes the
    cents exact on both engines. At scale exact percentile is a
    sort-based aggregate — approx_percentile is the O(1)-memory
    variant."""
    o = load_table(spark, sf_dir, "orders")
    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint")
    return o.groupBy("o_orderpriority").agg(
        F.percentile(cents, F.lit(0.25)).alias("p25_cents"),
        F.percentile(cents, F.lit(0.5)).alias("p50_cents"),
        F.percentile(cents, F.lit(0.75)).alias("p75_cents"),
    )


@workload(
    "tpch_q6_forecast_revenue",
    oracle="""
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
             * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
)
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan + conjunctive sargable filters + ungrouped
    aggregate — every predicate must reach the parquet reader
    (PushedFilters), making this the canonical pushdown benchmark."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * F.col("l_discount").cast("decimal(4,2)")
            ).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@workload(
    "tpch_q4_order_priority",
    oracle="""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
  )
GROUP BY o_orderpriority
""",
)
def tpch_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS correlated subquery -> LEFT SEMI join (the
    decorrelation Catalyst performs on the SQL form, written directly as
    the DataFrame plan). Semi join carries no payload columns from the
    probe side — minimal shuffle width."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-10-01")
    )
    l = load_table(spark, sf_dir, "lineitem")
    cond = (F.col("l.l_orderkey") == F.col("o.o_orderkey")) & (
        F.col("l.l_shipdate") > F.col("o.o_orderdate")
    )
    return (
        o.alias("o")
        .join(l.alias("l"), cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )
