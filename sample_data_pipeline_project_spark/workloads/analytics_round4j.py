"""Round-4j workloads: streaming Python DataSource, ABC revenue
classification, and entity-resolution blocking quality.

Determinism notes:
  - The streaming source replays the same integer generator as C195; the
    workload polls the memory sink until every offset is drained, so the
    materialized table equals the batch oracle regardless of micro-batch
    boundaries (and HARD-FAILS if the stream did not finish in time).
  - ABC classes are integer-threshold comparisons (cum*100 <= total*80)
    over exact DECIMAL(18,4)-derived scaled-int revenue — no float ever
    decides a class boundary. Cumulative revenue uses the C113 bucketed
    cumsum (value-bucket offsets + bucket-partitioned windows).
  - Blocking-quality metrics are fixed divisions of exact pair counts;
    the truth set is the SAME lossless prefix-filtered Jaccard join the
    dedup tier uses, so recall is measured against exact ground truth.
"""

from __future__ import annotations

import time
import uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sample_data_pipeline_project_spark.sources.catalog import load_table
from sample_data_pipeline_project_spark.sources.pydatasource import (
    register_det_range_stream,
)
from sample_data_pipeline_project_spark.workloads import workload

# --------------------------------------------------------------------------
# C196 — streaming Python DataSource (SimpleDataSourceStreamReader)
# --------------------------------------------------------------------------

_DSS_N = 30_000
_DSS_CHUNK = 10_000

_DSS_ORACLE = f"""
WITH t AS (
  SELECT CAST(r.range AS BIGINT) AS id,
         CAST(r.range % 10 AS BIGINT) AS bucket,
         CAST((r.range * 2654435761) % 1000003 AS BIGINT) AS val
  FROM range({_DSS_N}) r
)
SELECT bucket,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(val) AS BIGINT) AS sum_val,
       CAST(MAX(val) AS BIGINT) AS max_val
FROM t GROUP BY bucket
"""


@workload("stream_python_datasource", oracle=_DSS_ORACLE)
def stream_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Spark 4 STREAMING Python DataSource contract
    (SimpleDataSourceStreamReader) exercised end to end: dict offsets,
    chunked incremental read() on the driver with prefetch, exact
    readBetweenOffsets replay for recovery — the no-JVM path for tailing
    an external queue/API as a structured stream. availableNow falls
    back to single-batch for Python stream readers, so the workload
    drives a processing-time trigger and polls the memory sink until the
    generator's {n} rows across {k} micro-batches have all landed
    (hard timeout -> loud failure, never a silent partial result). The
    drained table then equals the batch range({n}) oracle — micro-batch
    boundaries cannot affect the answer because the generator replays
    deterministically."""
    register_det_range_stream(spark)
    df = (
        spark.readStream.format("det_range_stream")
        .option("n", str(_DSS_N))
        .option("chunk", str(_DSS_CHUNK))
        .load()
    )
    name = f"pyds_stream_{uuid.uuid4().hex[:8]}"
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            if spark.table(name).count() >= _DSS_N:
                break
            time.sleep(0.3)
        else:
            raise AssertionError(
                f"streaming python datasource did not drain {_DSS_N} rows "
                f"within 120s (got {spark.table(name).count()})"
            )
    finally:
        q.stop()
        q.awaitTermination()
    return spark.table(name).groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum("val").cast("long").alias("sum_val"),
        F.max("val").cast("long").alias("max_val"),
    )


# --------------------------------------------------------------------------
# C197 — ABC (Pareto) revenue classification of parts
# --------------------------------------------------------------------------

_ABC_BUCKET = 1 << 24
_REV_DEC_SQL = (
    "CAST(CAST(l_extendedprice AS DECIMAL(18,2))"
    " * (1 - CAST(l_discount AS DECIMAL(4,2))) AS DECIMAL(18,4))"
)
_ABC_SHARE = "CAST(class_rev_m4 AS DOUBLE) / CAST(total_m4 AS DOUBLE)"

_ABC_ORACLE = f"""
WITH pr AS (
  SELECT l_partkey, CAST(SUM({_REV_DEC_SQL}) * 10000 AS BIGINT) AS m4
  FROM lineitem GROUP BY l_partkey
),
ranked AS (
  SELECT l_partkey, m4,
         CAST(SUM(m4) OVER (ORDER BY m4 DESC, l_partkey
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cum,
         CAST(SUM(m4) OVER () AS BIGINT) AS total
  FROM pr
),
cls AS (
  SELECT CASE WHEN cum * 100 <= total * 80 THEN 'A'
              WHEN cum * 100 <= total * 95 THEN 'B'
              ELSE 'C' END AS abc_class,
         m4, total
  FROM ranked
),
agg AS (
  SELECT abc_class,
         CAST(COUNT(*) AS BIGINT) AS n_parts,
         CAST(SUM(m4) AS BIGINT) AS class_rev_m4,
         CAST(MAX(total) AS BIGINT) AS total_m4
  FROM cls GROUP BY abc_class
)
SELECT abc_class, n_parts, class_rev_m4,
       {_ABC_SHARE} AS share_of_revenue
FROM agg
"""


@workload("stats_abc_classification", oracle=_ABC_ORACLE)
def stats_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC / Pareto inventory classification: rank parts by exact
    discounted revenue and split at 80% / 95% of CUMULATIVE revenue —
    class A is the short head funding most of the business, C the long
    tail. Class boundaries are INTEGER comparisons (cum*100 <= total*80)
    on DECIMAL-derived scaled-int revenue, so no float rounding can
    reassign a part. The descending cumulative sum uses the C113
    machinery: per-value-bucket totals collected (bounded), revenue
    above each bucket as an exclusive offset, within-bucket running
    sums over bucket-partitioned windows — no global sort at any part
    count."""
    li = load_table(spark, sf_dir, "lineitem")
    rev = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1) - F.col("l_discount").cast("decimal(4,2)"))
    ).cast("decimal(18,4)")
    pr = li.groupBy("l_partkey").agg(
        (F.sum(rev) * 10000).cast("long").alias("m4")
    )
    pr = pr.withColumn("bkt", F.expr(f"m4 div {_ABC_BUCKET}"))
    btot = sorted(
        pr.groupBy("bkt").agg(F.sum("m4").alias("s")).collect(),
        key=lambda r: -r["bkt"],
    )
    offs, acc = [], 0
    for r in btot:
        offs.append((r["bkt"], acc))
        acc += r["s"]
    total = acc
    off_df = F.broadcast(
        spark.createDataFrame(offs or [(0, 0)], "bkt long, above long")
    )
    w = (
        Window.partitionBy("bkt")
        .orderBy(F.col("m4").desc(), F.col("l_partkey").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = pr.join(off_df, "bkt").select(
        "m4",
        (F.col("above") + F.sum("m4").over(w)).cast("long").alias("cum"),
    )
    cls = cum.select(
        "m4",
        F.when(F.col("cum") * 100 <= total * 80, "A")
        .when(F.col("cum") * 100 <= total * 95, "B")
        .otherwise("C")
        .alias("abc_class"),
    )
    agg = cls.groupBy("abc_class").agg(
        F.count(F.lit(1)).cast("long").alias("n_parts"),
        F.sum("m4").cast("long").alias("class_rev_m4"),
    ).withColumn("total_m4", F.lit(int(total)).cast("long"))
    return agg.select(
        "abc_class",
        "n_parts",
        "class_rev_m4",
        F.expr(_ABC_SHARE).alias("share_of_revenue"),
    )


# --------------------------------------------------------------------------
# C198 — entity-resolution blocking quality (recall vs reduction ratio)
# --------------------------------------------------------------------------

_BLK_THRESHOLD = 0.9
_BLK_WIDTH = 32
_DUCK_TOKS = "list_distinct(string_split_regex(lower(trim(text)), '\\s+'))"
_BLK_EXPRS = {
    "reduction_ratio": (
        "1.0 - CAST(candidate_pairs AS DOUBLE) / CAST(total_pairs AS DOUBLE)"
    ),
    "pair_recall": "CAST(n_captured AS DOUBLE) / CAST(n_truth AS DOUBLE)",
}

_BLK_ORACLE = f"""
WITH blocks AS (
  SELECT doc_id, lang || '|' || CAST(n_chars // {_BLK_WIDTH} AS STRING) AS blk
  FROM documents
),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
cand AS (
  SELECT CAST(SUM(c * (c - 1) // 2) AS BIGINT) AS candidate_pairs
  FROM (SELECT blk, CAST(COUNT(*) AS BIGINT) AS c FROM blocks GROUP BY blk)
),
toks AS (
  SELECT doc_id, unnest({_DUCK_TOKS}) AS tok FROM documents
),
sizes AS (SELECT doc_id, COUNT(*) AS n_tok FROM toks GROUP BY doc_id),
shared AS (
  SELECT a.doc_id AS a, b.doc_id AS b, COUNT(*) AS shared
  FROM toks a JOIN toks b ON a.tok = b.tok AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
truth AS (
  SELECT s.a, s.b
  FROM shared s
  JOIN sizes sa ON s.a = sa.doc_id
  JOIN sizes sb ON s.b = sb.doc_id
  WHERE CAST(s.shared AS DOUBLE) / (sa.n_tok + sb.n_tok - s.shared)
        >= {_BLK_THRESHOLD}
),
cap AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_truth,
         CAST(SUM(CASE WHEN ba.blk = bb.blk THEN 1 ELSE 0 END) AS BIGINT)
           AS n_captured
  FROM truth t
  JOIN blocks ba ON t.a = ba.doc_id
  JOIN blocks bb ON t.b = bb.doc_id
),
wide AS (
  SELECT nn.n_docs,
         CAST(nn.n_docs * (nn.n_docs - 1) // 2 AS BIGINT) AS total_pairs,
         cand.candidate_pairs, cap.n_truth, cap.n_captured
  FROM nn CROSS JOIN cand CROSS JOIN cap
)
SELECT n_docs, total_pairs, candidate_pairs, n_truth, n_captured,
       {_BLK_EXPRS["reduction_ratio"]} AS reduction_ratio,
       {_BLK_EXPRS["pair_recall"]} AS pair_recall
FROM wide
"""


@workload("er_blocking_quality", oracle=_BLK_ORACLE)
def er_blocking_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocking-strategy evaluation for entity resolution: a cheap
    (language, length-band) blocking key scored on the two numbers every
    ER paper reports — REDUCTION RATIO (how much of the n^2 comparison
    space the blocks prune) and PAIR RECALL (what fraction of true
    matches share a block), with truth = the exact prefix-filtered
    Jaccard pairs the dedup tier computes (lossless, so recall is
    against real ground truth, not a sample). Candidate counts are
    per-block c*(c-1)/2 integer sums; the quadratic total is arithmetic
    on the document count. This is the report read BEFORE shipping a
    blocking key to a 10^9-row linkage job, where a recall miss is
    unrecoverable."""
    from sample_data_pipeline_project_spark.operators.dedup import (
        jaccard_pairs_prefix,
    )

    d = load_table(spark, sf_dir, "documents")
    blocks = d.select(
        "doc_id",
        F.concat_ws(
            "|", F.col("lang"), F.expr(f"n_chars div {_BLK_WIDTH}").cast("string")
        ).alias("blk"),
    )
    n_docs = d.count()
    cand = int(
        blocks.groupBy("blk")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .agg(F.sum(F.expr("c * (c - 1) div 2")).cast("long"))
        .first()[0]
    )
    truth = jaccard_pairs_prefix(d, _BLK_THRESHOLD).select("a", "b")
    ba = blocks.select(F.col("doc_id").alias("a"), F.col("blk").alias("blk_a"))
    bb = blocks.select(F.col("doc_id").alias("b"), F.col("blk").alias("blk_b"))
    cap = (
        truth.join(ba, "a")
        .join(bb, "b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_truth"),
            F.sum(F.when(F.col("blk_a") == F.col("blk_b"), 1).otherwise(0))
            .cast("long")
            .alias("n_captured"),
        )
    )
    wide = cap.select(
        F.lit(int(n_docs)).cast("long").alias("n_docs"),
        F.lit(int(n_docs * (n_docs - 1) // 2)).cast("long").alias("total_pairs"),
        F.lit(cand).cast("long").alias("candidate_pairs"),
        "n_truth",
        "n_captured",
    )
    return wide.select(
        "n_docs",
        "total_pairs",
        "candidate_pairs",
        "n_truth",
        "n_captured",
        F.expr(_BLK_EXPRS["reduction_ratio"]).alias("reduction_ratio"),
        F.expr(_BLK_EXPRS["pair_recall"]).alias("pair_recall"),
    )
