"""Additional relational shapes (B7 widening): conditional aggregation,
outer-join histograms, promo-ratio CASE joins, disjunctive pushdown,
uncorrelated scalar subqueries, multi-DISTINCT aggregation, and the
bucketed range join.

Each is a distinct physical shape the first relational module doesn't
cover, modeled on the TPC-H queries whose columns exist in the testdata
(no partsupp table here, so Q2/Q16/Q20 shapes are out of reach):

  - tpch_q12: join + SUM(CASE ...) conditional aggregates;
  - tpch_q13: LEFT OUTER join with a join-side filter + two-level agg
    (the count-of-counts histogram);
  - tpch_q14: CASE-ratio over an equi-join (promo revenue share);
  - tpch_q19: OR-of-ANDs predicate — Catalyst must still push the
    common join key and prune columns despite the disjunction;
  - tpch_q22: uncorrelated scalar subquery (avg balance) + anti join,
    with the comparison rewritten multiplication-side for exactness;
  - agg_count_distinct: multiple COUNT(DISTINCT) in one aggregate
    (Expand-based plan);
  - range_join_price_bands: interval containment via
    operators/rangejoin.band_range_join (hash join, not nested loop).

Scale notes mirror workloads/relational.py: dims broadcast, money math in
exact DECIMAL with one final DOUBLE cast, ratios computed in DOUBLE with
identical operation order on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sample_data_pipeline_project_spark.operators.rangejoin import band_range_join
from sample_data_pipeline_project_spark.sources.catalog import load_table
from sample_data_pipeline_project_spark.workloads import workload

_REV_DEC_SQL = (
    "CAST(CAST(l_extendedprice AS DECIMAL(18,2))"
    " * (1 - CAST(l_discount AS DECIMAL(4,2))) AS DECIMAL(18,4))"
)


def _revenue_dec() -> F.Column:
    return (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1) - F.col("l_discount").cast("decimal(4,2)"))
    ).cast("decimal(18,4)")


# --------------------------------------------------------------------------
# TPC-H Q12 shape: join + conditional (CASE) aggregates
# --------------------------------------------------------------------------
@workload(
    "tpch_q12_conditional_agg",
    oracle="""
SELECT l_returnflag,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY l_returnflag
""",
)
def tpch_q12_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shape: fact-to-fact equi-join, then SUM(CASE...) pivot-style
    conditional counts — integer arithmetic only, exact on both engines."""
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~is_high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


# --------------------------------------------------------------------------
# TPC-H Q13 shape: LEFT OUTER join with join-side filter + count histogram
# --------------------------------------------------------------------------
@workload(
    "tpch_q13_order_distribution",
    oracle="""
WITH c_orders AS (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer
  LEFT JOIN orders ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
SELECT c_count, COUNT(*) AS custdist
FROM c_orders
GROUP BY c_count
""",
)
def tpch_q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 shape: LEFT OUTER join whose filter lives in the join condition
    (NOT the WHERE — it must preserve customers with zero orders), then a
    count-of-counts histogram. COUNT(o_orderkey) counts non-nulls, so
    no-order customers land in bucket 0. Two shuffles by construction:
    custkey, then c_count."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


# --------------------------------------------------------------------------
# TPC-H Q14 shape: CASE-ratio aggregate over an equi-join
# --------------------------------------------------------------------------
@workload(
    "tpch_q14_promo_revenue",
    oracle=f"""
SELECT CAST(SUM(CASE WHEN p_type LIKE 'PROMO%' THEN {_REV_DEC_SQL} ELSE 0 END) AS DOUBLE)
         * 100.0
         / CAST(SUM({_REV_DEC_SQL}) AS DOUBLE) AS promo_revenue_pct,
       COUNT(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
""",
)
def tpch_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 shape: promo revenue share. Numerator and denominator are exact
    decimal sums; the ratio is computed in DOUBLE with the same operation
    order on both engines ((cast * 100.0) / cast), so it is bit-identical.
    part broadcasts; lineitem never shuffles (ungrouped agg = one partial
    per partition + driver-side merge)."""
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-03-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    promo = F.when(F.col("p_type").like("PROMO%"), _revenue_dec()).otherwise(
        F.lit(0).cast("decimal(18,4)")
    )
    return (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (
                F.sum(promo).cast("double")
                * F.lit(100.0)
                / F.sum(_revenue_dec()).cast("double")
            ).alias("promo_revenue_pct"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# --------------------------------------------------------------------------
# TPC-H Q19 shape: disjunction of conjunctions (OR-of-ANDs)
# --------------------------------------------------------------------------
@workload(
    "tpch_q19_disjunctive_filter",
    oracle=f"""
SELECT CAST(SUM({_REV_DEC_SQL}) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#22' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 35)
   OR (p_brand = 'Brand#25' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 50)
""",
)
def tpch_q19_disjunctive_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 shape: OR-of-ANDs across both join sides. Catalyst still joins on
    the common p_partkey equi-key and applies the disjunction as a join
    residual; per-side implied filters (p_brand IN (...), l_quantity <= 50)
    are inferred and pushed below the join by constraint propagation."""
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    l = load_table(spark, sf_dir, "lineitem")
    arm = lambda brand, s_lo, s_hi, q_lo, q_hi: (  # noqa: E731
        (F.col("p_brand") == brand)
        & F.col("p_size").between(s_lo, s_hi)
        & F.col("l_quantity").between(q_lo, q_hi)
    )
    cond = (
        arm("Brand#11", 1, 15, 1, 20)
        | arm("Brand#22", 10, 30, 10, 35)
        | arm("Brand#25", 20, 50, 20, 50)
    )
    return (
        l.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .filter(cond)
        .agg(
            F.sum(_revenue_dec()).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# --------------------------------------------------------------------------
# TPC-H Q22 shape: uncorrelated scalar subquery + anti join
# --------------------------------------------------------------------------
@workload(
    "tpch_q22_idle_rich_customers",
    oracle="""
WITH stats AS (
  SELECT COUNT(*) AS n_pos,
         SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS total_pos
  FROM customer WHERE c_acctbal > 0.0
)
SELECT c_mktsegment,
       COUNT(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
FROM customer, stats
WHERE CAST(c_acctbal AS DECIMAL(18,2)) * n_pos > total_pos
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
GROUP BY c_mktsegment
""",
)
def tpch_q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape: above-average-balance customers who never placed an
    URGENT order, grouped by segment. (Every testdata customer has orders,
    so the classic "no orders at all" anti-join is degenerate — the
    priority filter keeps the anti join selective AND non-empty.) The
    global average arrives as an uncorrelated scalar subquery — a 1-row
    broadcast cross join, NOT a collect() (the plan stays fully
    declarative). The `bal > avg` comparison is rewritten as
    `bal * n > total` so it is exact decimal arithmetic on both engines
    (no decimal division rounding to disagree about)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    bal_dec = F.col("c_acctbal").cast("decimal(18,2)")
    stats = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.count(F.lit(1)).alias("n_pos"),
        F.sum(bal_dec).alias("total_pos"),
    )
    return (
        c.crossJoin(F.broadcast(stats))
        .filter(bal_dec * F.col("n_pos") > F.col("total_pos"))
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(bal_dec).cast("double").alias("totacctbal"),
        )
    )


# --------------------------------------------------------------------------
# Multiple COUNT(DISTINCT) in one aggregate
# --------------------------------------------------------------------------
@workload(
    "agg_count_distinct_parts_suppliers",
    oracle="""
SELECT l_returnflag,
       COUNT(DISTINCT l_partkey) AS n_parts,
       COUNT(DISTINCT l_suppkey) AS n_supps,
       COUNT(*) AS n_rows
FROM lineitem
GROUP BY l_returnflag
""",
)
def agg_count_distinct_parts_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two COUNT(DISTINCT) columns + a plain count in one aggregate: Spark
    plans this with Expand (one replica of each row per distinct column),
    partial-distinct before the shuffle, so duplicate keys collapse
    map-side. The exact form of what sketch_approx_distinct_users
    approximates in O(1) memory."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.count_distinct("l_partkey").alias("n_parts"),
        F.count_distinct("l_suppkey").alias("n_supps"),
        F.count(F.lit(1)).alias("n_rows"),
    )


# --------------------------------------------------------------------------
# Bucketed range join (operators/rangejoin.py)
# --------------------------------------------------------------------------
@workload(
    "range_join_price_bands",
    oracle="""
WITH bands AS (
  SELECT i AS band_idx,
         895.0 + 8.0 * i AS lo,
         908.0 + 8.0 * i AS hi
  FROM generate_series(0, 11) t(i)
)
SELECT band_idx,
       COUNT(*) AS n_parts,
       CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM part JOIN bands ON p_retailprice >= lo AND p_retailprice < hi
GROUP BY band_idx
""",
)
def range_join_price_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: parts priced within overlapping [lo, hi) bands (stride 8,
    width 13 — rows legitimately match 2 bands). The bands are deliberately
    NOT aligned to the bucket width (10), proving the bucketed equi-join +
    residual reproduces the pure theta-join semantics. At scale this is a
    hash join on the bucket key instead of a nested loop."""
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_retailprice")
    bands = spark.range(12).select(
        F.col("id").alias("band_idx"),
        (F.lit(895.0) + 8.0 * F.col("id")).alias("lo"),
        (F.lit(908.0) + 8.0 * F.col("id")).alias("hi"),
    )
    joined = band_range_join(p, "p_retailprice", bands, "lo", "hi", bucket_width=10.0)
    return joined.groupBy("band_idx").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.sum(F.col("p_retailprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_price"),
    )


# --------------------------------------------------------------------------
# Pivot (grouped transpose) — conditional-aggregation expansion
# --------------------------------------------------------------------------
@workload(
    "pivot_status_by_priority",
    oracle="""
SELECT o_orderpriority,
       COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS status_f,
       COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS status_o,
       COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS status_p,
       CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
            FILTER (WHERE o_orderstatus = 'F'), 0) AS DOUBLE) AS total_f
FROM orders
GROUP BY o_orderpriority
""",
)
def pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT with an explicit value list: one grouped pass (single shuffle),
    each pivot cell a conditional aggregate — the same plan `groupBy().
    pivot(col, values)` produces, written explicitly so empty cells are 0
    (Spark's pivot yields NULL there, DuckDB's FILTER yields 0/empty-sum).
    Explicit values matter at scale: value-discovering pivot runs an extra
    distinct job over the fact table first."""
    o = load_table(spark, sf_dir, "orders")

    def cnt(status: str) -> F.Column:
        return F.count(F.when(F.col("o_orderstatus") == status, 1))

    return o.groupBy("o_orderpriority").agg(
        cnt("F").alias("status_f"),
        cnt("O").alias("status_o"),
        cnt("P").alias("status_p"),
        F.coalesce(
            F.sum(
                F.when(
                    F.col("o_orderstatus") == "F",
                    F.col("o_totalprice").cast("decimal(18,2)"),
                )
            ),
            F.lit(0).cast("decimal(18,2)"),
        )
        .cast("double")
        .alias("total_f"),
    )


# --------------------------------------------------------------------------
# Deterministic hash sampling — reproducible TABLESAMPLE at any scale
# --------------------------------------------------------------------------
@workload(
    "sample_hash_orders",
    oracle="""
SELECT o_orderpriority,
       COUNT(*) AS n_sampled,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sampled_total
FROM orders
WHERE substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) IN ('0', '1')
GROUP BY o_orderpriority
""",
)
def sample_hash_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 2/16 hash sample: keep rows whose key's md5 starts
    with nibble 0 or 1. Unlike TABLESAMPLE/df.sample (RNG- and
    partition-layout-dependent, irreproducible across engines, retries, or
    repartitioning), a key-hash predicate picks the SAME logical rows
    everywhere — the only sampling that is auditable on a 100 TB pipeline.
    Embarrassingly parallel: no coordination, prunes before the shuffle."""
    o = load_table(spark, sf_dir, "orders")
    nibble = F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 1)
    return (
        o.filter(nibble.isin("0", "1"))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sampled_total"),
        )
    )


# --------------------------------------------------------------------------
# Bucketed co-located join — storage-layout shuffle elimination
# --------------------------------------------------------------------------
@workload(
    "join_bucketed_orders_lineitem",
    oracle=f"""
SELECT o_orderstatus,
       COUNT(*) AS n_items,
       CAST(SUM({_REV_DEC_SQL}) AS DOUBLE) AS revenue
FROM orders JOIN lineitem ON l_orderkey = o_orderkey
GROUP BY o_orderstatus
""",
)
def join_bucketed_orders_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-to-fact join read from BUCKETED storage (both tables hash-
    bucketed on the order key at write time): the join itself needs no
    Exchange — only the final small groupBy shuffles. Results are
    identical to the plain parquet join (the oracle); the timing includes
    the one-time bucketed write, which is the trade a warehouse makes
    once to never shuffle this join again."""
    from sample_data_pipeline_project_spark.sources.bucketed import bucketed_join

    joined = bucketed_join(spark, sf_dir)
    return joined.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(_revenue_dec()).cast("double").alias("revenue"),
    )


# --------------------------------------------------------------------------
# Array aggregation (collect to sorted array) + window-function variety
# --------------------------------------------------------------------------
@workload(
    "agg_collect_sorted_segments",
    oracle="""
SELECT c_nationkey,
       array_to_string(list_sort(list(DISTINCT c_mktsegment)), ',') AS segments,
       COUNT(DISTINCT c_mktsegment) AS n_segments
FROM customer
GROUP BY c_nationkey
""",
)
def agg_collect_sorted_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-valued aggregation: distinct segments per nation collected to
    a SORTED array (collect_set order is partition-dependent; sort_array
    makes the value deterministic — the only way an array aggregate can be
    compared across engines or retries), then serialized to ONE
    comma-joined STRING: the driver's pandas canonicalizer cannot
    sort/factorize list cells (proven by the r04 red row on
    features_hashing_trick), so the final schema stays scalar."""
    c = load_table(spark, sf_dir, "customer")
    return c.groupBy("c_nationkey").agg(
        F.array_join(F.sort_array(F.collect_set("c_mktsegment")), ",").alias(
            "segments"
        ),
        F.count_distinct("c_mktsegment").alias("n_segments"),
    )


@workload(
    "window_lead_first_seq",
    oracle="""
SELECT o_custkey, o_orderkey, o_orderdate,
       LEAD(o_orderdate) OVER w AS next_order_date,
       FIRST_VALUE(o_orderdate) OVER w AS first_order_date,
       ROW_NUMBER() OVER w AS order_seq
FROM orders
WHERE o_custkey < 200
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
""",
)
def window_lead_first_seq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-function variety beyond LAG/RANK: LEAD (next event),
    FIRST_VALUE (anchor row), ROW_NUMBER (sequence) — all share ONE window
    spec, so Spark computes them in a single shuffle+sort pass."""
    from pyspark.sql.window import Window

    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 200)
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc(), F.col("o_orderkey").asc()
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.lead("o_orderdate").over(w).alias("next_order_date"),
        F.first("o_orderdate").over(w).alias("first_order_date"),
        F.row_number().over(w).alias("order_seq"),
    )


# --------------------------------------------------------------------------
# Exact variance/stddev from associative partials
# --------------------------------------------------------------------------
@workload(
    "agg_variance_exact",
    oracle="""
WITH partials AS (
  SELECT o_orderpriority,
         COUNT(*) AS n,
         SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS s,
         SUM(CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS DECIMAL(18,0))
             * CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS DECIMAL(18,0))) AS sq
  FROM orders
  GROUP BY o_orderpriority
)
, sq_double AS (
  SELECT o_orderpriority, n, s,
         CAST(CAST(sq AS HUGEINT) // 1000000000 AS DOUBLE) * 1000000000.0
         + CAST(CAST(sq AS HUGEINT) % 1000000000 AS DOUBLE) AS sq_d
  FROM partials
)
SELECT o_orderpriority, n,
       (sq_d - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n) / (n - 1) / 10000.0 AS variance,
       sqrt((sq_d - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n) / (n - 1)) / 100.0 AS stddev
FROM sq_double
""",
)
def agg_variance_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample variance/stddev from exact integer-cents partials (n, sum,
    sum of squares) with the float math done once, identically, at the
    end — engine-native stddev aggregates (Welford updates) are summation-
    order-dependent and never bit-match across engines. The count and sum
    partials are int64; the sum-of-squares partial is exact DECIMAL(38,0)
    (int64 overflows it past ~10^5 rows per group) — integer-valued either
    way, so the one cast to double is IEEE-nearest identically in both
    engines. The partials are associative,
    so this is also the form that merges across partitions, rollup tiers,
    or incremental batches."""
    o = load_table(spark, sf_dir, "orders")
    # cents via the decimal(18,2) conversion every money workload relies on:
    # double*100 -> bigint truncates in Spark but rounds in DuckDB.
    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint")
    # The squares sum exceeds int64 around sf0.1 (8-digit cents squared,
    # summed over 10^5+ rows) — hold it in exact wide DECIMAL instead:
    # both engines sum 128-bit exactly, and an integer-valued decimal
    # casts to double with the same IEEE-nearest rounding as an int.
    cents_dec = cents.cast("decimal(18,0)")
    partials = o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(cents).alias("s"),
        F.sum(cents_dec * cents_dec).alias("sq"),
    )
    # sq has ~20 digits: casting a >2^53 decimal to double is NOT
    # correctly rounded in every engine (DuckDB's 128-bit path is 1 ulp
    # off Spark's). Pin the conversion by splitting into two <2^53
    # integers and reassembling with plain IEEE ops — deterministic
    # everywhere (the oracle does the identical split via HUGEINT).
    sq_d = F.expr(
        "CAST(sq DIV 1000000000 AS DOUBLE) * 1000000000.0"
        " + CAST(sq % 1000000000 AS DOUBLE)"
    )
    var_cents2 = (
        sq_d
        - F.col("s").cast("double") * F.col("s").cast("double") / F.col("n")
    ) / (F.col("n") - 1)
    return partials.select(
        "o_orderpriority",
        "n",
        (var_cents2 / 10000.0).alias("variance"),
        (F.sqrt(var_cents2) / 100.0).alias("stddev"),
    )


# --------------------------------------------------------------------------
# Parameterized SQL-text surface (the reference's native API shape)
# --------------------------------------------------------------------------
@workload(
    "sql_text_param_revenue",
    oracle="""
SELECT o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderstatus = 'F'
GROUP BY o_orderpriority
""",
)
def sql_text_param_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL-TEXT entry path end-to-end (reference's native surface:
    templated SQL + bound parameters, snowflake_tasks.py:173-178 et al.):
    tables registered as views, query given as text with :name binds via
    `spark.sql(text, args=...)` — same Catalyst plan as the DataFrame
    form, so pushdown/pruning are identical. Parameters are BOUND, not
    interpolated — no SQL-injection-shaped string formatting (the
    reference f-strings dates into SQL at snowflake_tasks.py:525-526; we
    deliberately do not)."""
    from sample_data_pipeline_project_spark.sources.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderpriority,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM orders
        WHERE o_orderdate >= :start_ts
          AND o_orderdate <  :end_ts
          AND o_orderstatus = :status
        GROUP BY o_orderpriority
        """,
        args={
            "start_ts": "1996-01-01 00:00:00",
            "end_ts": "1997-01-01 00:00:00",
            "status": "F",
        },
    )
