"""Further relational operator breadth: GROUPING SETS, UNPIVOT (melt),
distribution window functions (NTILE / PERCENT_RANK / CUME_DIST), and
regex/string scalar functions. Each is a stock Catalyst operator — the
point of these workloads is oracle-checked parity coverage, not custom
machinery.

Determinism notes:
  - grouping-sets output is distinguished by NULL group keys (the data
    has no NULL keys of its own, so the marker is unambiguous);
  - percent_rank/cume_dist divide identically-derived integers on both
    engines (one double division per row, same operands -> same bits);
  - regex patterns stay within the common semantics of Java regex
    (Spark) and RE2 (DuckDB): literal/char-class/anchor only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sample_data_pipeline_project_spark.sources.catalog import load_table, register_views
from sample_data_pipeline_project_spark.workloads import workload
from sample_data_pipeline_project_spark.workloads.relational import _dsum


# --------------------------------------------------------------------------
# GROUPING SETS (beyond the cube/rollup already covered)
# --------------------------------------------------------------------------
@workload(
    "grouping_sets_region_segment",
    oracle="""
SELECT r_name, c_mktsegment, COUNT(*) AS n_customers,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY GROUPING SETS ((r_name), (c_mktsegment), ())
""",
)
def grouping_sets_region_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — the general form of cube/rollup: per-region
    totals, per-segment totals, and the grand total in ONE pass (a single
    Expand + hash aggregate, not three scans unioned)."""
    c = load_table(spark, sf_dir, "customer")
    nt = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    joined = c.join(
        F.broadcast(nt), F.col("c_nationkey") == F.col("n_nationkey")
    ).join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
    return joined.groupingSets(
        [["r_name"], ["c_mktsegment"], []], "r_name", "c_mktsegment"
    ).agg(
        F.count(F.lit(1)).alias("n_customers"),
        _dsum(F.col("c_acctbal"), "DECIMAL(18,2)").alias("total_bal"),
    )


# --------------------------------------------------------------------------
# UNPIVOT / melt (wide -> long reshaping)
# --------------------------------------------------------------------------
@workload(
    "unpivot_lineitem_measures",
    oracle="""
SELECT l_orderkey, l_linenumber, 'l_extendedprice' AS measure, l_extendedprice AS amount
FROM lineitem WHERE l_orderkey < 50
UNION ALL
SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
FROM lineitem WHERE l_orderkey < 50
UNION ALL
SELECT l_orderkey, l_linenumber, 'l_tax', l_tax
FROM lineitem WHERE l_orderkey < 50
""",
)
def unpivot_lineitem_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (melt): three measure columns to (measure, amount) long
    form — Spark's native `unpivot` plans one Expand over one scan, where
    the UNION ALL oracle formulation scans three times."""
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 50)
    return l.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_extendedprice", "l_discount", "l_tax"],
        "measure",
        "amount",
    )


# --------------------------------------------------------------------------
# Distribution window functions
# --------------------------------------------------------------------------
@workload(
    "window_distribution_funcs",
    oracle="""
SELECT n_name, c_custkey, c_acctbal,
       NTILE(4) OVER w AS quartile,
       PERCENT_RANK() OVER w AS pct_rank,
       CUME_DIST() OVER w AS cume
FROM customer JOIN nation ON c_nationkey = n_nationkey
WINDOW w AS (PARTITION BY n_name ORDER BY c_acctbal ASC, c_custkey ASC)
""",
)
def window_distribution_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE / PERCENT_RANK / CUME_DIST sharing one window spec — one
    shuffle on the partition key, one sort, three analytic outputs. The
    order key is made unique (acctbal, custkey) so ranks are deterministic."""
    c = load_table(spark, sf_dir, "customer")
    nt = load_table(spark, sf_dir, "nation")
    w = Window.partitionBy("n_name").orderBy(
        F.col("c_acctbal").asc(), F.col("c_custkey").asc()
    )
    return (
        c.join(F.broadcast(nt), F.col("c_nationkey") == F.col("n_nationkey"))
        .select(
            "n_name",
            "c_custkey",
            "c_acctbal",
            F.ntile(4).over(w).alias("quartile"),
            F.percent_rank().over(w).alias("pct_rank"),
            F.cume_dist().over(w).alias("cume"),
        )
    )


# --------------------------------------------------------------------------
# Regex + string scalar functions
# --------------------------------------------------------------------------
@workload(
    "scalar_regex_funcs",
    oracle="""
SELECT p_partkey,
       regexp_extract(p_name, '([a-z]+)$', 1) AS noun,
       regexp_replace(p_name, ' ', '_') AS snake_name,
       split_part(p_name, ' ', 1) AS adjective,
       lpad(CAST(p_size AS VARCHAR), 3, '0') AS size_padded,
       reverse(p_brand) AS brand_rev,
       levenshtein(p_brand, 'Brand#1') AS brand_dist
FROM part
WHERE p_partkey <= 300
""",
)
def scalar_regex_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex extraction/replacement + split_part/lpad/reverse/levenshtein —
    all JVM-side codegen expressions (no UDF), patterns restricted to the
    Java-regex/RE2 common subset."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 300)
    return p.select(
        "p_partkey",
        F.regexp_extract("p_name", r"([a-z]+)$", 1).alias("noun"),
        F.regexp_replace("p_name", " ", "_").alias("snake_name"),
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(1)).alias("adjective"),
        F.lpad(F.col("p_size").cast("string"), 3, "0").alias("size_padded"),
        F.reverse("p_brand").alias("brand_rev"),
        F.levenshtein(F.col("p_brand"), F.lit("Brand#1")).alias("brand_dist"),
    )


# --------------------------------------------------------------------------
# Array / higher-order functions over the embedding column
# --------------------------------------------------------------------------
@workload(
    "array_embedding_stats",
    oracle="""
SELECT vec_id,
       len(embedding) AS dim,
       list_min(embedding) AS mn,
       list_max(embedding) AS mx,
       len(list_filter(embedding, x -> x > 0)) AS n_pos,
       embedding[1] AS head1,
       embedding[2] AS head2,
       embedding[3] AS head3
FROM embeddings
WHERE vec_id < 500
""",
)
def array_embedding_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array + lambda higher-order functions over `embedding:
    array<float>`: size, element min/max, a filtered count (HOF lambda),
    and the first three elements — all JVM-side expressions on the nested
    type, no UDF. Only comparisons and reshaping (no float arithmetic),
    so results are bit-exact across engines. The head slice is emitted as
    THREE SCALAR float columns (not array<float>): the driver's pandas
    canonicalizer cannot sort/factorize list cells (r04 red row on
    features_hashing_trick), so final output schemas stay scalar."""
    e = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 500)
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.array_min("embedding").alias("mn"),
        F.array_max("embedding").alias("mx"),
        F.size(F.filter("embedding", lambda x: x > 0)).alias("n_pos"),
        F.col("embedding")[0].alias("head1"),
        F.col("embedding")[1].alias("head2"),
        F.col("embedding")[2].alias("head3"),
    )


# --------------------------------------------------------------------------
# RANGE window frame (value-based, vs the ROWS frames covered elsewhere)
# --------------------------------------------------------------------------
@workload(
    "window_trailing_7day_revenue",
    oracle="""
WITH t AS (
  SELECT o_custkey, o_orderkey,
         date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE))
           AS day_num,
         o_totalprice
  FROM orders
)
SELECT o_custkey, o_orderkey, day_num,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
         PARTITION BY o_custkey ORDER BY day_num
         RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE)
         AS trailing_7day_revenue
FROM t
""",
)
def window_trailing_7day_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer trailing-7-day revenue: a RANGE window frame
    (rangeBetween over a day-number order key), i.e. value-based frame
    bounds where peers with the same order date share one frame —
    semantically different from any ROWS frame when dates repeat. The
    exact-DECIMAL sum keeps the double cast order-independent."""
    o = load_table(spark, sf_dir, "orders").withColumn(
        "day_num",
        F.datediff(F.to_date("o_orderdate"), F.lit("1992-01-01").cast("date")),
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("day_num")
        .rangeBetween(-6, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "day_num",
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("trailing_7day_revenue"),
    )


# --------------------------------------------------------------------------
# Recursive CTE (WITH RECURSIVE, Spark 4.x): date-spine gap filling
# --------------------------------------------------------------------------
@workload(
    "timeseries_recursive_date_spine",
    oracle="""
WITH RECURSIVE spine(day) AS (
  SELECT DATE '1995-01-01'
  UNION ALL
  SELECT day + 1 FROM spine WHERE day < DATE '1995-02-28'
),
daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day, COUNT(*) AS n_orders,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
  FROM orders
  WHERE o_orderdate >= TIMESTAMP '1995-01-01'
    AND o_orderdate < TIMESTAMP '1995-03-01'
  GROUP BY CAST(o_orderdate AS DATE)
)
SELECT s.day, COALESCE(d.n_orders, 0) AS n_orders,
       COALESCE(d.revenue, 0.0) AS revenue
FROM spine s LEFT JOIN daily d ON s.day = d.day
""",
)
def timeseries_recursive_date_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (WITH RECURSIVE — Spark 4.x SQL surface): generate a
    dense daily date spine, left-join sparse per-day order aggregates, and
    gap-fill with zeros — the dense-time-series shape every monitoring /
    feature pipeline needs. Recursion is monotone (day+1 to a bound), so
    it terminates within the engine's recursion budget; a 59-row spine
    joined broadcast against the aggregated side."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_spine_src")
    return spark.sql("""
WITH RECURSIVE spine(day) AS (
  SELECT DATE '1995-01-01'
  UNION ALL
  SELECT date_add(day, 1) FROM spine WHERE day < DATE '1995-02-28'
),
daily AS (
  SELECT to_date(o_orderdate) AS day, COUNT(*) AS n_orders,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
  FROM orders_spine_src
  WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
    AND o_orderdate < TIMESTAMP '1995-03-01 00:00:00'
  GROUP BY to_date(o_orderdate)
)
SELECT s.day, COALESCE(d.n_orders, 0) AS n_orders,
       COALESCE(d.revenue, CAST(0.0 AS DOUBLE)) AS revenue
FROM spine s LEFT JOIN daily d ON s.day = d.day
""")


# --------------------------------------------------------------------------
# Equi-width histogram (bucketed distribution profile)
# --------------------------------------------------------------------------
@workload(
    "agg_price_histogram",
    oracle="""
SELECT CAST(FLOOR(o_totalprice / 50000.0) AS BIGINT) AS bucket,
       CAST(FLOOR(o_totalprice / 50000.0) AS BIGINT) * 50000.0 AS bucket_lo,
       COUNT(*) AS n_orders,
       MIN(o_totalprice) AS min_price,
       MAX(o_totalprice) AS max_price
FROM orders
GROUP BY CAST(FLOOR(o_totalprice / 50000.0) AS BIGINT)
""",
)
def agg_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of order prices: one hash aggregate over
    integer bucket keys (floor of one IEEE division — deterministic across
    engines), the distribution-profiling shape data-quality monitoring
    runs on every batch. Buckets carry min/max so empty-tail detection and
    bucket boundaries are checkable without a second pass."""
    o = load_table(spark, sf_dir, "orders")
    bucket = F.floor(F.col("o_totalprice") / 50000.0).cast("long")
    return (
        o.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
        )
        .select(
            "bucket",
            (F.col("bucket") * 50000.0).alias("bucket_lo"),
            "n_orders",
            "min_price",
            "max_price",
        )
    )


# --------------------------------------------------------------------------
# FULL OUTER join (null-producing on both sides)
# --------------------------------------------------------------------------
@workload(
    "join_full_outer_user_activity",
    oracle="""
WITH clicks AS (
  SELECT user_id, COUNT(*) AS n_clicks FROM events
  WHERE event_type = 'click' AND ts < TIMESTAMP '2024-01-02 00:00:00'
  GROUP BY user_id
),
purchases AS (
  SELECT user_id, COUNT(*) AS n_purchases FROM events
  WHERE event_type = 'purchase' AND ts < TIMESTAMP '2024-01-02 00:00:00'
  GROUP BY user_id
)
SELECT COALESCE(c.user_id, p.user_id) AS user_id,
       COALESCE(c.n_clicks, 0) AS n_clicks,
       COALESCE(p.n_purchases, 0) AS n_purchases
FROM clicks c FULL OUTER JOIN purchases p ON c.user_id = p.user_id
""",
)
def join_full_outer_user_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join over asymmetric key sets: day-one clickers vs
    day-one purchasers — users appearing on only one side survive with the
    other side's count null-coalesced to zero. The join type the
    semi/anti/inner/left coverage elsewhere doesn't exercise."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("ts") < "2024-01-02 00:00:00"
    )
    clicks = (
        e.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_clicks"))
        .select(F.col("user_id").alias("c_uid"), "n_clicks")
    )
    purchases = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_purchases"))
        .select(F.col("user_id").alias("p_uid"), "n_purchases")
    )
    return clicks.join(
        purchases, clicks["c_uid"] == purchases["p_uid"], "full_outer"
    ).select(
        F.coalesce("c_uid", "p_uid").alias("user_id"),
        F.coalesce("n_clicks", F.lit(0)).alias("n_clicks"),
        F.coalesce("n_purchases", F.lit(0)).alias("n_purchases"),
    )


# --------------------------------------------------------------------------
# Stratified deterministic sampling (dataset-mix resampling)
# --------------------------------------------------------------------------
@workload(
    "sample_stratified_mix",
    oracle="""
SELECT source, COUNT(*) AS n_sampled
FROM documents
WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN
      (CASE WHEN length(source) = 4 THEN '0' ELSE 'x' END,
       '1', '2', '3', '4', '5')
GROUP BY source
""",
)
def sample_stratified_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified deterministic sampling for dataset-mix rebalancing:
    per-stratum keep rates applied as key-hash nibble thresholds —
    single-digit sources (length 4, e.g. src0) keep 6/16, double-digit
    sources keep 5/16. Same auditable-hash idea as sample_hash_orders,
    with the rate a function of the stratum — the op that reshapes a
    corpus toward a target mix without RNG state."""
    d = load_table(spark, sf_dir, "documents")
    nibble = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    base_keep = nibble.isin("1", "2", "3", "4", "5")
    extra_keep = (F.length("source") == 4) & (nibble == "0")
    return (
        d.filter(base_keep | extra_keep)
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_sampled"))
    )


# --------------------------------------------------------------------------
# LISTAGG / string aggregation (ordered, deterministic)
# --------------------------------------------------------------------------
@workload(
    "agg_listagg_nations_per_region",
    oracle="""
SELECT r_name,
       string_agg(n_name, ',' ORDER BY n_name) AS nations,
       COUNT(*) AS n_nations
FROM nation JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
""",
)
def agg_listagg_nations_per_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LISTAGG shape: per-region comma-joined nation names in explicit
    alphabetical order (collect_list -> array_sort -> array_join; unordered
    LISTAGG is nondeterministic by definition, so the sort IS the
    semantics here)."""
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        n.join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name")
        .agg(
            F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias(
                "nations"
            ),
            F.count(F.lit(1)).alias("n_nations"),
        )
    )


# --------------------------------------------------------------------------
# Array higher-order functions over embeddings
# --------------------------------------------------------------------------
_HOF_ORACLE = """
WITH folded AS (
  SELECT vec_id,
         CAST(len(embedding) AS BIGINT) AS dim,
         CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_pos,
         list_reduce(
           list_prepend(CAST(0.0 AS DOUBLE),
             list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))),
           (acc, v) -> acc + v) AS l1_norm,
         list_reduce(
           list_prepend(CAST(0.0 AS DOUBLE),
             list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))),
           (acc, v) -> CASE WHEN v > acc THEN v ELSE acc END) AS max_abs,
         list_reduce(
           list_prepend(CAST(0.0 AS DOUBLE),
             list_transform(embedding,
               x -> LEAST(GREATEST(CAST(x AS DOUBLE), -0.25), 0.25))),
           (acc, v) -> acc + v) AS clipped_sum
  FROM embeddings
)
SELECT vec_id, dim, n_pos, l1_norm, max_abs, clipped_sum
FROM folded
"""


@workload("scalar_array_hof_funcs", oracle=_HOF_ORACLE)
def scalar_array_hof_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array higher-order-function surface over `array<float>` embeddings:
    transform / filter / aggregate with BOTH fold shapes — a running sum
    and a running max (custom combiner) — plus an element-wise clamp
    chain. Everything runs JVM-side inside codegen (no UDF); float
    determinism comes from the repo's left-fold contract (functions/
    vectors.py): float->double casts are exact, per-element ops are IEEE,
    and the fold order is fixed, so DuckDB's list_reduce mirror is
    bit-identical. Pure projection — zero shuffles at any scale."""
    e = load_table(spark, sf_dir, "embeddings")
    absd = "transform(embedding, x -> abs(CAST(x AS DOUBLE)))"
    return e.selectExpr(
        "vec_id",
        "CAST(size(embedding) AS BIGINT) AS dim",
        "CAST(size(filter(embedding, x -> x > 0)) AS BIGINT) AS n_pos",
        f"aggregate({absd}, CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
        " AS l1_norm",
        f"aggregate({absd}, CAST(0.0 AS DOUBLE),"
        " (acc, v) -> CASE WHEN v > acc THEN v ELSE acc END) AS max_abs",
        "aggregate(transform(embedding,"
        " x -> LEAST(GREATEST(CAST(x AS DOUBLE), -0.25), 0.25)),"
        " CAST(0.0 AS DOUBLE), (acc, v) -> acc + v) AS clipped_sum",
    )


# --------------------------------------------------------------------------
# Multiset (bag) set operations: EXCEPT ALL / INTERSECT ALL
# --------------------------------------------------------------------------
_SETOP_ALL_ORACLE = """
WITH ca AS (
  SELECT c_nationkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'
),
cb AS (
  SELECT c_nationkey AS k FROM customer WHERE c_mktsegment = 'MACHINERY'
),
ex AS (SELECT k FROM ca EXCEPT ALL SELECT k FROM cb),
ix AS (SELECT k FROM ca INTERSECT ALL SELECT k FROM cb)
SELECT 'except_all' AS op, CAST(k AS BIGINT) AS k,
       CAST(COUNT(*) AS BIGINT) AS multiplicity
FROM ex GROUP BY k
UNION ALL
SELECT 'intersect_all' AS op, CAST(k AS BIGINT) AS k,
       CAST(COUNT(*) AS BIGINT) AS multiplicity
FROM ix GROUP BY k
"""


@workload("setop_bag_except_intersect_all", oracle=_SETOP_ALL_ORACLE)
def setop_bag_except_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MULTISET set operations — EXCEPT ALL / INTERSECT ALL (bag
    semantics: per-row multiplicities, max(m1-m2,0) and min(m1,m2)) —
    the variants the DISTINCT-based setop workloads can't express.
    Output is the per-key multiplicity table of each result so the bag
    cardinalities themselves are value-hashed. Spark plans these as one
    hash aggregate over tagged counts — a single keyed shuffle."""
    c = load_table(spark, sf_dir, "customer")
    ca = c.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_nationkey").cast("long").alias("k")
    )
    cb = c.filter(F.col("c_mktsegment") == "MACHINERY").select(
        F.col("c_nationkey").cast("long").alias("k")
    )
    ex = (
        ca.exceptAll(cb)
        .groupBy("k")
        .agg(F.count(F.lit(1)).cast("long").alias("multiplicity"))
        .select(F.lit("except_all").alias("op"), "k", "multiplicity")
    )
    ix = (
        ca.intersectAll(cb)
        .groupBy("k")
        .agg(F.count(F.lit(1)).cast("long").alias("multiplicity"))
        .select(F.lit("intersect_all").alias("op"), "k", "multiplicity")
    )
    return ex.unionAll(ix)


# --------------------------------------------------------------------------
# Explicit null-ordering semantics (NULLS FIRST / NULLS LAST)
# --------------------------------------------------------------------------
_NULLS_ORACLE = """
WITH v AS (
  SELECT event_id,
         CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS val
  FROM events
),
nf AS (
  SELECT event_id, val FROM v
  ORDER BY val DESC NULLS FIRST, event_id ASC LIMIT 5
),
nl AS (
  SELECT event_id, val FROM v
  ORDER BY val ASC NULLS LAST, event_id ASC LIMIT 5
)
SELECT 'desc_nulls_first' AS op, event_id, val FROM nf
UNION ALL
SELECT 'asc_nulls_last' AS op, event_id, val FROM nl
"""


@workload("sort_null_ordering", oracle=_NULLS_ORACLE)
def sort_null_ordering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit NULL-ORDERING semantics: the engines DISAGREE by default
    (Spark sorts nulls first ascending, DuckDB last), so portable sorts
    must state NULLS FIRST/LAST — this workload pins both spellings
    (DESC NULLS FIRST and ASC NULLS LAST) through TakeOrdered top-5s
    with a unique tiebreak, value-hashed across engines. The kind of
    semantic edge a query engine has to get right, stated as a test."""
    e = load_table(spark, sf_dir, "events").select(
        "event_id",
        F.when(F.col("event_id") % 7 == 0, None)
        .otherwise(F.col("value"))
        .alias("val"),
    )
    nf = (
        e.orderBy(F.col("val").desc_nulls_first(), F.col("event_id").asc())
        .limit(5)
        .select(F.lit("desc_nulls_first").alias("op"), "event_id", "val")
    )
    nl = (
        e.orderBy(F.col("val").asc_nulls_last(), F.col("event_id").asc())
        .limit(5)
        .select(F.lit("asc_nulls_last").alias("op"), "event_id", "val")
    )
    return nf.unionAll(nl)


# --------------------------------------------------------------------------
# Null-safe equality join (<=> / IS NOT DISTINCT FROM)
# --------------------------------------------------------------------------
_NSJ_ORACLE = """
WITH a AS (
  SELECT NULLIF(o.o_orderpriority, '1-URGENT') AS prio, COUNT(*) AS n_a
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  WHERE c.c_mktsegment = 'BUILDING'
  GROUP BY 1
),
b AS (
  SELECT NULLIF(o.o_orderpriority, '1-URGENT') AS prio, COUNT(*) AS n_b
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  WHERE c.c_mktsegment = 'MACHINERY'
  GROUP BY 1
)
SELECT a.prio, CAST(a.n_a AS BIGINT) AS n_a, CAST(b.n_b AS BIGINT) AS n_b
FROM a JOIN b ON a.prio IS NOT DISTINCT FROM b.prio
"""


@workload("join_null_safe_eq", oracle=_NSJ_ORACLE)
def join_null_safe_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-SAFE equality join (Spark `<=>` == ANSI IS NOT DISTINCT FROM):
    the join key is deliberately made nullable via NULLIF, and the
    NULL-keyed groups on the two sides must MATCH EACH OTHER — the
    semantics a plain equi-join silently drops (NULL = NULL is NULL).
    Both sides aggregate before joining, so the null-safe comparison runs
    over key-domain-bounded tables; Spark plans `<=>` as a hash join on
    the key's null-safe representation, not a nested loop."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    joined = o.join(F.broadcast(c), "o_custkey").withColumn(
        "prio", F.nullif(F.col("o_orderpriority"), F.lit("1-URGENT"))
    )

    def side(seg: str, out: str) -> DataFrame:
        return (
            joined.filter(F.col("c_mktsegment") == seg)
            .groupBy("prio")
            .agg(F.count(F.lit(1)).alias(out))
        )

    a = side("BUILDING", "n_a").alias("a")
    b = side("MACHINERY", "n_b").alias("b")
    return a.join(b, F.col("a.prio").eqNullSafe(F.col("b.prio"))).select(
        F.col("a.prio").alias("prio"),
        F.col("n_a").cast("long"),
        F.col("n_b").cast("long"),
    )


# --------------------------------------------------------------------------
# Outer-explode semantics (posexplode_outer keeps empty-array parents)
# --------------------------------------------------------------------------
_XPL_N = 60

_XPL_ORACLE = f"""
WITH g AS (
  SELECT doc_id,
         GREATEST(len(string_split_regex(lower(trim(text)), '\\s+'))
                  - {_XPL_N - 1}, 0) AS n_grams
  FROM documents
)
SELECT CAST(n_grams > 0 AS BOOLEAN) AS has_ngrams,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN n_grams > 0 THEN n_grams ELSE 1 END) AS BIGINT)
         AS n_rows_after_explode
FROM g GROUP BY 1
"""


@workload("explode_outer_semantics", oracle=_XPL_ORACLE)
def explode_outer_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OUTER-EXPLODE semantics pinned: posexplode_outer over {n}-token
    n-gram arrays keeps documents whose array is EMPTY (shorter than {n}
    tokens) as a single NULL row — the lossless flatten a plain explode
    would silently drop (the classic row-loss bug in tokenize-then-join
    pipelines). Spark genuinely runs the Generate operator and aggregates
    its output; the oracle reproduces the row arithmetic from array
    lengths alone (empty array -> exactly one row), so a hash match pins
    the operator's multiplicity contract."""
    from sample_data_pipeline_project_spark.functions.text import (
        tokens,
        word_ngrams,
    )

    d = load_table(spark, sf_dir, "documents")
    exploded = (
        d.select("doc_id", tokens("text").alias("__t"))
        .select("doc_id", word_ngrams("__t", _XPL_N).alias("__g"))
        .select("doc_id", F.posexplode_outer("__g").alias("pos", "gram"))
    )
    return (
        exploded.groupBy(F.col("pos").isNotNull().alias("has_ngrams"))
        .agg(
            F.count_distinct("doc_id").cast("long").alias("n_docs"),
            F.count(F.lit(1)).cast("long").alias("n_rows_after_explode"),
        )
    )


# --------------------------------------------------------------------------
# MAP higher-order functions (map_from_entries / transform_values /
# map_filter / map_entries roundtrip)
# --------------------------------------------------------------------------
_MAP_HOF_MIN_SHARE = 0.25

_MAP_HOF_ORACLE = f"""
WITH cnt AS (
  SELECT user_id, event_type, COUNT(*) AS n_type
  FROM events GROUP BY user_id, event_type
),
tot AS (SELECT user_id, SUM(n_type) AS n_total FROM cnt GROUP BY user_id)
SELECT c.user_id, c.event_type,
       CAST(c.n_type AS BIGINT) AS n_type,
       CAST(c.n_type AS DOUBLE) / CAST(t.n_total AS DOUBLE) AS share
FROM cnt c JOIN tot t ON c.user_id = t.user_id
WHERE CAST(c.n_type AS DOUBLE) / CAST(t.n_total AS DOUBLE)
      >= {_MAP_HOF_MIN_SHARE}
"""


@workload("scalar_map_hof_funcs", oracle=_MAP_HOF_ORACLE)
def scalar_map_hof_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAP higher-order-function surface (the map twin of C59's array
    HOFs): per-user event-type counts become a map<type, n> via
    map_from_entries, shares are computed with transform_values, dominant
    types selected with map_filter, and map_entries + explode flattens
    back to rows — all JVM-side codegen, no Python crossing. The oracle
    restates the pipeline relationally (maps are an encoding, not a
    semantic), so a hash match certifies the map ops are lossless. Map
    keys are unique by construction (built FROM a grouped aggregate);
    output rows are order-insensitive so map iteration order is moot."""
    ev = load_table(spark, sf_dir, "events")
    cnt = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n_type")
    )
    m = cnt.groupBy("user_id").agg(
        F.map_from_entries(
            F.collect_list(F.struct("event_type", "n_type"))
        ).alias("type_counts")
    )
    with_share = m.select(
        "user_id",
        F.expr(
            "map_filter("
            "  transform_values(type_counts,"
            "    (k, v) -> struct(v AS n_type,"
            "      CAST(v AS DOUBLE) / CAST(aggregate(map_values(type_counts),"
            "        0L, (acc, x) -> acc + x) AS DOUBLE) AS share)),"
            f"  (k, v) -> v.share >= {_MAP_HOF_MIN_SHARE})"
        ).alias("dominant"),
    )
    return (
        with_share.select(
            "user_id", F.explode(F.map_entries("dominant")).alias("e")
        )
        .select(
            "user_id",
            F.col("e.key").alias("event_type"),
            F.col("e.value.n_type").cast("long").alias("n_type"),
            F.col("e.value.share").alias("share"),
        )
    )


# --------------------------------------------------------------------------
# Calendar scalar functions (add_months clamping, last_day, quarter)
# --------------------------------------------------------------------------
_CAL_ORACLE = """
SELECT o_orderkey,
       CAST(o_orderdate AS DATE) AS d,
       CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS plus_3mo,
       last_day(CAST(o_orderdate AS DATE)) AS month_end,
       CAST(quarter(CAST(o_orderdate AS DATE)) AS INTEGER) AS qtr,
       CAST(year(CAST(o_orderdate AS DATE)) * 100
            + month(CAST(o_orderdate AS DATE)) AS INTEGER) AS yyyymm,
       CAST(date_diff('day', CAST(o_orderdate AS DATE),
            last_day(CAST(o_orderdate AS DATE))) AS INTEGER)
         AS days_to_month_end
FROM orders
WHERE o_orderkey <= 2000
"""


@workload("scalar_calendar_funcs", oracle=_CAL_ORACLE)
def scalar_calendar_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CALENDAR scalar-function surface (the date half A18 implies):
    add_months with its end-of-month CLAMPING semantics (Jan 31 + 1mo =
    Feb 28 — both engines clamp, pinned here), last_day, quarter, and
    yyyymm bucketing — the expressions every fiscal rollup is built
    from, all JVM-side codegen, zero shuffles (pure projection)."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 2000)
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        d.alias("d"),
        F.add_months(d, 3).alias("plus_3mo"),
        F.last_day(d).alias("month_end"),
        F.quarter(d).cast("int").alias("qtr"),
        (F.year(d) * 100 + F.month(d)).cast("int").alias("yyyymm"),
        F.datediff(F.last_day(d), d).cast("int").alias("days_to_month_end"),
    )


# --------------------------------------------------------------------------
# Round 4: try_* error-safe arithmetic semantics
# --------------------------------------------------------------------------
_TRY_ORACLE = """
WITH t AS (
  SELECT l_returnflag AS flag,
         CAST(l_quantity AS BIGINT) AS a,
         CAST(l_linenumber AS BIGINT) - 1 AS b,
         CASE WHEN l_linenumber = 1 THEN '42'
              WHEN l_linenumber = 2 THEN '7x'
              ELSE l_linestatus END AS s
  FROM lineitem
),
x AS (
  SELECT flag,
         CASE WHEN b = 0 THEN NULL
              ELSE CAST(a AS DOUBLE) / CAST(b AS DOUBLE) END AS d,
         CASE WHEN regexp_matches(s, '^\\s*[+-]?[0-9]+\\s*$')
              THEN TRY_CAST(s AS INTEGER) END AS c
  FROM t
)
SELECT flag,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(*) - COUNT(d) AS BIGINT) AS n_div_null,
       CAST(SUM(CAST(ROUND(d * 1000000.0, 0) AS BIGINT)) AS BIGINT)
         AS sum_div_scaled,
       CAST(COUNT(c) AS BIGINT) AS n_cast_ok,
       CAST(SUM(CASE WHEN c IS NOT NULL THEN c ELSE 0 END) AS BIGINT)
         AS sum_cast
FROM x GROUP BY flag
"""


@workload("scalar_try_arithmetic", oracle=_TRY_ORACLE)
def scalar_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ERROR-SAFE arithmetic surface: `try_divide` (NULL on zero
    denominator instead of an error/Inf) and `try_cast` (NULL on
    malformed input) — the ANSI-mode escape hatches an ingest pipeline
    leans on when raw data is dirty. The oracle states the identical
    semantics declaratively (guarded CASE, TRY_CAST); per-row division
    results are pre-scaled to exact BIGINTs before summing so the float
    aggregation is order-independent. One projection + one keyed
    aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    t = li.select(
        F.col("l_returnflag").alias("flag"),
        F.col("l_quantity").cast("long").alias("a"),
        (F.col("l_linenumber").cast("long") - 1).alias("b"),
        F.when(F.col("l_linenumber") == 1, "42")
        .when(F.col("l_linenumber") == 2, "7x")
        .otherwise(F.col("l_linestatus"))
        .alias("s"),
    )
    # try_cast's failure path is exception-driven inside the JVM (~us per
    # failing row): on a column where MOST rows are malformed that cost
    # dominates the whole query (observed 3.6s of a 4s sf0.1 run). The
    # regex pre-guard short-circuits rows that cannot possibly parse —
    # try_cast still performs the real parse (overflow -> NULL preserved)
    # on the plausible ones, so NULL-on-malformed semantics are intact.
    # KNOWN DIVERGENCE from bare DuckDB TRY_CAST: on decimal strings
    # DuckDB's TRY_CAST('4.5' AS INTEGER) ROUNDS to 5, while this integer-
    # literal guard yields NULL. Safe for the current inputs ('42', '7x',
    # l_linestatus letters — no decimal strings reach the cast), and the
    # oracle below states the SAME integer-literal guard so both engines
    # pin identical semantics; revisit if the malformed-column recipe
    # ever includes decimal-looking strings.
    plausible_int = F.col("s").rlike(r"^\s*[+-]?[0-9]+\s*$")
    x = t.select(
        "flag",
        F.try_divide(F.col("a").cast("double"), F.col("b").cast("double")).alias("d"),
        F.when(plausible_int, F.expr("try_cast(trim(s) AS INT)")).alias("c"),
    )
    return x.groupBy("flag").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        (F.count(F.lit(1)) - F.count("d")).cast("long").alias("n_div_null"),
        F.sum(F.round(F.col("d") * 1000000.0, 0).cast("long"))
        .cast("long")
        .alias("sum_div_scaled"),
        F.count("c").cast("long").alias("n_cast_ok"),
        F.sum(F.coalesce(F.col("c"), F.lit(0))).cast("long").alias("sum_cast"),
    )


# --------------------------------------------------------------------------
# Round 4: the NOT IN + NULL trap vs NOT EXISTS
# --------------------------------------------------------------------------
_NOTIN_SQL = """
SELECT 'not_in' AS variant, CAST(COUNT(*) AS BIGINT) AS n_customers
FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
                        UNION ALL SELECT CAST(NULL AS BIGINT))
UNION ALL
SELECT 'not_exists' AS variant, CAST(COUNT(*) AS BIGINT) AS n_customers
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
"""


@workload("subquery_not_in_null_trap", oracle=_NOTIN_SQL)
def subquery_not_in_null_trap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The NOT IN + NULL TRAP, pinned per ANSI on both engines with the
    SAME SQL text: a NULL in the NOT IN subquery list makes every
    membership test UNKNOWN, so the 'not_in' branch returns ZERO rows —
    while the NOT EXISTS form (the null-safe anti-join every optimizer
    compiles to) returns the real customers-without-orders count. An
    engine that 'fixes' the NOT IN branch silently is wrong; the value
    hash certifies both engines implement the standard's three-valued
    logic. Physically: Catalyst plans NOT IN as a null-aware anti join
    and NOT EXISTS as a plain left-anti join."""
    register_views(spark, sf_dir)
    return spark.sql(_NOTIN_SQL)
