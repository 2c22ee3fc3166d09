"""Round-7 workloads: runtime-mitigation certifications.

C221 certifies that AQE's skew-join mitigation actually FIRES on a
deliberately skewed join key — the same hard-fail pattern as C187
(PartitionFilters) and C202 (dynamic partition pruning): a silent
planner/runtime regression must fail the gate, not pass as green.

Determinism notes:
  - The skewed key is a pure function of l_orderkey (modular
    arithmetic), so both engines derive the identical key set.
  - Money aggregates ride exact BIGINT cents (DECIMAL(18,2) * 100).
  - The AQE-tuning confs are set ONLY inside a save/restore window so
    no other workload in the same session sees them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sample_data_pipeline_project_spark.sources.catalog import load_table
from sample_data_pipeline_project_spark.workloads import workload

# ~half of lineitem lands on skew key 0; the rest spreads over 997 keys.
_SKEW_MOD = 997
_DIM_N = _SKEW_MOD + 1  # keys 0.._SKEW_MOD

_SKEW_ORACLE = f"""
WITH fact AS (
  SELECT CASE WHEN l_orderkey % 2 = 0 THEN 0
              ELSE l_orderkey % {_SKEW_MOD} + 1 END AS k,
         l_quantity,
         l_extendedprice
  FROM lineitem
),
dim AS (
  SELECT i AS k, i % 7 AS grp FROM generate_series(0, {_SKEW_MOD}) t(i)
)
SELECT dim.grp,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(fact.l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(SUM(CAST(CAST(fact.l_extendedprice AS DECIMAL(18,2)) * 100
                AS BIGINT)) AS BIGINT) AS rev_cents
FROM fact JOIN dim ON fact.k = dim.k
GROUP BY dim.grp
"""

# Confs that make the mitigation observable at test scale (sf0.001-0.1
# shuffle partitions are a few KB-MB; production defaults look for
# 256 MB partitions). Factor/threshold scale DOWN the detector, they do
# not change its logic; forceOptimizeSkewedJoin lifts the
# "no-extra-shuffle" guard that is irrelevant here (the downstream agg
# regroups on a different key, so an exchange exists either way).
_SKEW_CONFS = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "4KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "2KB",
    "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
}

# AQE splits a skewed reduce partition by MAPPER ranges. The sf-test
# parquet is ONE row group, so however many file splits the scan plans,
# exactly one map task emits all the shuffle data — and a single-mapper
# partition is unsplittable (probed empirically: per-mapper block sizes
# for the hot reducer were [0, 0, ..., 135735]). A 100 TB scan has
# thousands of mappers; the explicit repartition below recreates that
# many-mapper precondition at test scale — it feeds the detector real
# input, it does not change what the detector checks.
_SKEW_FACT_MAPPERS = 8


@workload("join_skew_aqe_certified", oracle=_SKEW_ORACLE)
def join_skew_aqe_certified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AQE SKEW-JOIN mitigation certified end to end (C221): half of
    lineitem is funneled onto ONE join key (the canonical hot-key shape
    — a null-like sentinel, a mega-customer, an empty-string bucket),
    the dimension side is kept off the broadcast path, and the workload
    HARD-FAILS unless the executed adaptive plan carries the
    `skew=true` marker on the sort-merge join — proof that AQE split
    the hot partition into advisory-sized subpartitions and replicated
    the matching dim rows, instead of sending ~50% of the table to one
    reducer. At 100 TB a single hot key IS the wall-clock; `dq_skew_report`
    (C36) measures the skew, this certifies the runtime mitigation.
    The value result (per-group rollup over the joined rows) is
    oracle-hashed like any other workload, so the mitigation is also
    certified to not change answers."""
    old = {k: spark.conf.get(k, None) for k in _SKEW_CONFS}
    try:
        for k, v in _SKEW_CONFS.items():
            spark.conf.set(k, v)
        # Load INSIDE the conf window: file-split planning happens at
        # execution, but keeping the whole lifecycle inside makes the
        # mapper-count precondition explicit.
        li = load_table(spark, sf_dir, "lineitem")
        fact = li.select(
            F.when(F.col("l_orderkey") % 2 == 0, F.lit(0))
            .otherwise(F.col("l_orderkey") % _SKEW_MOD + 1)
            .cast("long")
            .alias("k"),
            "l_quantity",
            "l_extendedprice",
        ).repartition(_SKEW_FACT_MAPPERS)  # see _SKEW_FACT_MAPPERS note
        dim = spark.range(0, _DIM_N).select(
            F.col("id").alias("k"), (F.col("id") % 7).alias("grp")
        )
        out = (
            fact.join(dim, "k")
            .groupBy("grp")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.sum(F.col("l_quantity").cast("long"))
                .cast("long")
                .alias("sum_qty"),
                F.sum(
                    (
                        F.col("l_extendedprice").cast("decimal(18,2)") * 100
                    ).cast("long")
                )
                .cast("long")
                .alias("rev_cents"),
            )
        )
        # AQE decisions are runtime decisions: the final adaptive plan
        # (and its skew markers) exists only after execution, so
        # materialize the (7-row) result, then inspect the SAME
        # QueryExecution's executed plan.
        out.collect()
        plan = out._jdf.queryExecution().executedPlan().toString()
        if "skew=true" not in plan:
            raise AssertionError(
                "expected AQE skew-join mitigation (skew=true on the "
                "sort-merge join) on the hot-key join; plan:\n" + plan
            )
        return out
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


# --------------------------------------------------------------------------
# C222 — mutual k-NN similarity-graph construction (the degree-bounded
# graph the round-7 scale fix built for Adamic-Adar, as its own surface)
# --------------------------------------------------------------------------
_KNN_D = 5
_KNN_THRESHOLD = 0.3


def _knn_oracle() -> str:
    from sample_data_pipeline_project_spark.functions.vectors import (
        duck_cosine,
    )

    cos = duck_cosine("a.embedding", "b.embedding")
    return f"""
WITH allp AS (
  SELECT a.vec_id AS src, b.vec_id AS dst, {cos} AS c
  FROM embeddings a
  JOIN embeddings b ON a.vec_id != b.vec_id
),
thr AS (SELECT src, dst, c FROM allp WHERE c >= {_KNN_THRESHOLD}),
knn AS (
  SELECT src, dst, c,
         ROW_NUMBER() OVER (PARTITION BY src ORDER BY c DESC, dst ASC) AS rn
  FROM thr
),
kept AS (SELECT src, dst, c FROM knn WHERE rn <= {_KNN_D})
SELECT CAST(k1.src AS BIGINT) AS a, CAST(k1.dst AS BIGINT) AS b,
       k1.c AS cosine_sim
FROM kept k1 JOIN kept k2 ON k1.src = k2.dst AND k1.dst = k2.src
WHERE k1.src < k1.dst
"""


@workload("graph_knn_mutual_edges", oracle=_knn_oracle())
def graph_knn_mutual_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MUTUAL k-NN similarity-graph construction (C222) — the
    degree-bounded graph operator the round-7 scale work built
    (operators/similarity.py:knn_mutual_edges), registered as its own
    oracled surface: undirected edges where EACH endpoint ranks the
    other in its exact-cosine top-{d}, deg(v) <= {d} HARD. This is the
    scale-correct input for every wedge-shaped downstream (Adamic-Adar
    C140, clustering coefficient C88, components): a fixed-threshold
    graph's edges grow Theta(density * N^2) (measured: 102x for 10x
    vectors, SCALING.md), a mutual-kNN graph's grow O(N * d). The
    blocked construction emits exact cumsum-fold scores from the BLAS
    preselection (no vector re-join), so the oracle value-hashes every
    edge's cosine, not just the pair ids."""
    from sample_data_pipeline_project_spark.operators.similarity import (
        knn_mutual_edges,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    return knn_mutual_edges(emb, _KNN_D, _KNN_THRESHOLD)


# --------------------------------------------------------------------------
# C223 — bucketed CO-LOCATED join certification (exchange-free fact-fact)
# --------------------------------------------------------------------------
_BKT_N = 8

_BKT_ORACLE = """
SELECT o.o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) * 100
                AS BIGINT)) AS BIGINT) AS rev_cents
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
GROUP BY o.o_orderpriority
"""

_BKT_CONFS = {
    # the cert is about the SHUFFLE join path: a broadcast would skip
    # the exchange question entirely
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    "spark.sql.sources.bucketing.enabled": "true",
}


@workload("join_bucketed_colocated", oracle=_BKT_ORACLE)
def join_bucketed_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BUCKETED co-located fact-fact join certified end to end (C223):
    orders and lineitem are written as bucketed tables (bucketBy {n} on
    the join key, sortBy for merge-ready runs), and the workload
    HARD-FAILS if the join plan contains ANY shuffle exchange — the
    write-time layout must satisfy the join's distribution requirement
    so neither fact table reshuffles at read time. At 100 TB this is
    THE fact-fact join strategy: the brief's 'bucketing for co-located
    joins' as a certified plan fact rather than advice (the same
    hard-fail pattern as C187 PartitionFilters / C202 DPP / C221 skew).
    Both tables use the SAME bucket count, so bucket i joins bucket i
    with zero movement; the rollup result is oracle-hashed against the
    plain (layout-free) join, certifying the layout changes the PLAN,
    never the answer. Tables are pid-scoped under the gitignored
    warehouse (the scratch_dir convention)."""
    import os

    from sample_data_pipeline_project_spark.plans.introspect import (
        exchange_count,
    )
    from sample_data_pipeline_project_spark.sources.scratch import (
        reap_dead_scratch,
    )

    # The returned DataFrame lazily reads the bucketed tables, so this
    # workload cannot drop them in `finally`; instead, reap at ENTRY any
    # bkt_* (and other per-pid scratch) left by processes that no longer
    # exist — otherwise every distinct gate/bench pid leaks two full
    # bucketed copies of orders+lineitem into the warehouse forever.
    reap_dead_scratch()
    pid = os.getpid()
    to, tl = f"bkt_orders_{pid}", f"bkt_lineitem_{pid}"
    old = {k: spark.conf.get(k, None) for k in _BKT_CONFS}
    try:
        for k, v in _BKT_CONFS.items():
            spark.conf.set(k, v)
        o = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_orderpriority"
        )
        li = load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_quantity", "l_extendedprice"
        )
        o.write.bucketBy(_BKT_N, "o_orderkey").sortBy("o_orderkey").mode(
            "overwrite"
        ).format("parquet").saveAsTable(to)
        li.write.bucketBy(_BKT_N, "l_orderkey").sortBy("l_orderkey").mode(
            "overwrite"
        ).format("parquet").saveAsTable(tl)
        bo, bl = spark.table(to), spark.table(tl)
        joined = bo.join(bl, bo["o_orderkey"] == bl["l_orderkey"])
        nx = exchange_count(joined)
        if nx != 0:
            raise AssertionError(
                f"bucketed co-located join planned {nx} shuffle "
                "exchange(s); the write-time bucket layout must satisfy "
                "the join distribution. Plan:\n"
                + joined._jdf.queryExecution().executedPlan().toString()
            )
        return joined.groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            F.sum(F.col("l_quantity").cast("long"))
            .cast("long")
            .alias("sum_qty"),
            F.sum(
                (F.col("l_extendedprice").cast("decimal(18,2)") * 100).cast(
                    "long"
                )
            )
            .cast("long")
            .alias("rev_cents"),
        )
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
