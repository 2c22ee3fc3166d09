"""Round-10 workloads (C232-C235).

C232 certifies the round-10 IVF balance lever (skewed-cell salting) at
GATE scale by forcing the split path with a data-relative pair budget
and proving the edge multiset identical to the unsplit plan — the
driver's oracle gate now exercises the 100 TB straggler fix every
round, not just a pytest. C233 adds late-interaction (multi-vector
MaxSim) retrieval, the missing member of the similarity family. C234
adds greedy k-center diversity coresets (farthest-point traversal) —
the standard diverse-subset-selection primitive for curation — as a
fully LAZY chained-plan query with an unrolled-CTE oracle. C235 adds
an online interarrival anomaly stream whose per-key state is four
int64 moments, bit-identical to its batch window twin at any
micro-batch boundary.

Reference scope note: the reference client (snowflake_query_client.py,
snowflake_tasks.py) has no ANN/streaming surface; these extend the B-
tier LLM-pipeline mandate along the round-8/9 axes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sample_data_pipeline_project_spark.functions.vectors import (
    dot,
    duck_cosine,
    duck_dot,
)
from sample_data_pipeline_project_spark.functions.vectors import (
    cosine as cosine_col,
)
from sample_data_pipeline_project_spark.sources.catalog import load_table
from sample_data_pipeline_project_spark.workloads import workload
from sample_data_pipeline_project_spark.workloads.analytics_round8 import (
    _KNN_D,
    _KNN_NPROBE,
    _KNN_THRESHOLD,
)

# ---------------------------------------------------------------------------
# C232 — balanced-path certification for the IVF mutual-kNN builder
# ---------------------------------------------------------------------------


@workload(
    "graph_knn_mutual_edges_ivf_balanced",
    oracle="""
SELECT TRUE AS split_engaged, TRUE AS matches_unsplit, TRUE AS nonempty
""",
)
def graph_knn_mutual_edges_ivf_balanced(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """C232 — GATE-SCALE certification of the round-10 skewed-cell
    salting (operators/similarity.py knn_mutual_edges_ivf pair_budget):
    at production scale the budget only trips on quantizer-skew
    stragglers (the sf100 215k-row cell), which no gate corpus reaches —
    so this workload FORCES the split path with a data-relative budget
    (~2x the mean cell's m^2, i.e. any mildly skewed cell splits) and
    certifies, against the default-budget single-task plan over the SAME
    deterministic quantizer:

      split_engaged   — the build-time census actually salted >= 1 cell
                        (measured via the operator's split_stats hook,
                        not assumed);
      matches_unsplit — the (src, dst, cosine_sim) edge multiset is
                        BIT-IDENTICAL both ways (exceptAll in both
                        directions is empty): salting replicates work,
                        never changes membership or scores;
      nonempty        — the graph is not trivially empty.

    A regression that makes the salted plan drop, duplicate, or rescore
    edges flips matches_unsplit and fails the oracle hash at sf0.01
    every round. Build-time census collects are K-bounded by the
    operator's documented contract (same as C226). Round 11: the forced
    budget is the operator's ``"max-cell"`` sentinel — derived from the
    census the operator already takes (budget = max(m)^2 - 1, so the
    largest cell is GUARANTEED to split on any corpus shape, closing
    the ADVICE risk that regenerated/uniform testdata flips
    split_engaged) — and the workload no longer runs `emb.count()` at
    plan construction."""
    from sample_data_pipeline_project_spark.operators.similarity import (
        knn_mutual_edges_ivf,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    stats: dict = {}
    balanced = knn_mutual_edges_ivf(
        emb, _KNN_D, _KNN_THRESHOLD, nprobe=_KNN_NPROBE,
        pair_budget="max-cell", split_stats=stats,
    )
    default = knn_mutual_edges_ivf(
        emb, _KNN_D, _KNN_THRESHOLD, nprobe=_KNN_NPROBE
    )
    cols = ["src", "dst", "cosine_sim"] if "src" in balanced.columns else list(
        balanced.columns
    )
    b = balanced.select(*cols)
    d = default.select(*cols)
    diff = b.exceptAll(d).unionAll(d.exceptAll(b))
    return (
        diff.agg((F.count(F.lit(1)) == 0).alias("matches_unsplit"))
        .crossJoin(b.agg((F.count(F.lit(1)) > 0).alias("nonempty")))
        .select(
            F.lit(stats.get("n_oversized", 0) > 0).alias("split_engaged"),
            "matches_unsplit",
            "nonempty",
        )
    )


# ---------------------------------------------------------------------------
# C233 — late-interaction (multi-vector MaxSim) retrieval
# ---------------------------------------------------------------------------

_LI_GROUP = 10  # vectors per pseudo-document
_LI_TOPK = 5

_LI_ORACLE = f"""
WITH q AS (
  SELECT vec_id AS qid, embedding AS q_emb
  FROM embeddings WHERE vec_id < {_LI_GROUP}
),
c AS (
  SELECT vec_id // {_LI_GROUP} AS li_doc, embedding
  FROM embeddings WHERE vec_id >= {_LI_GROUP}
),
perq AS (
  SELECT li_doc, qid,
         MAX({duck_cosine('c.embedding', 'q.q_emb')}) AS mx
  FROM c CROSS JOIN q
  GROUP BY li_doc, qid
),
perdoc AS (
  SELECT li_doc,
         list_reduce(
           list_prepend(CAST(0.0 AS DOUBLE), list(mx ORDER BY qid)),
           (acc, v) -> acc + v
         ) AS maxsim_score
  FROM perq GROUP BY li_doc
)
SELECT li_doc, maxsim_score FROM perdoc
ORDER BY maxsim_score DESC, li_doc ASC
LIMIT {_LI_TOPK}
"""


@workload("sim_late_interaction_maxsim", oracle=_LI_ORACLE)
def sim_late_interaction_maxsim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C233 — ColBERT-style late-interaction scoring: documents are
    multi-VECTOR (here: consecutive groups of {_LI_GROUP} embedding rows
    = one pseudo-doc; real corpora store one row per token vector), the
    query is doc 0's vector set, and score(q, d) = sum over query
    vectors of the MAX cosine against d's vectors. Top-{_LI_TOPK} docs.

    Spark-first shape: the query's vector set is a BROADCAST (tens of
    rows at any corpus size), candidates stream through one
    narrow-shuffle groupBy pyramid (max per (doc, qvec), then a
    SORTED-FOLD sum per doc — sort_array(collect_list) + aggregate, the
    repo's deterministic-sum idiom, so the double is bit-identical to
    the oracle's ORDER BY qid list_reduce). MAX is order-free. At
    100 TB the same plan runs behind an IVF/coarse preselect exactly
    like C226 — the per-candidate work here is already the late-
    interaction re-rank stage."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < _LI_GROUP).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("q_emb")
    )
    c = emb.filter(F.col("vec_id") >= _LI_GROUP).select(
        F.expr(f"vec_id DIV {_LI_GROUP}").alias("li_doc"), "embedding"
    )
    perq = (
        c.crossJoin(F.broadcast(q))
        .select(
            "li_doc",
            "qid",
            cosine_col("embedding", "q_emb").alias("sim"),
        )
        .groupBy("li_doc", "qid")
        .agg(F.max("sim").alias("mx"))
    )
    perdoc = perq.groupBy("li_doc").agg(
        F.expr(
            "aggregate(transform(sort_array(collect_list(struct(qid, mx))),"
            " x -> x.mx), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
        ).alias("maxsim_score")
    )
    return (
        perdoc.orderBy(F.desc("maxsim_score"), F.asc("li_doc"))
        .limit(_LI_TOPK)
        .select(F.col("li_doc").cast("long").alias("li_doc"), "maxsim_score")
    )


# ---------------------------------------------------------------------------
# C234 — greedy k-center diversity coreset (farthest-point traversal)
# ---------------------------------------------------------------------------

_KC_K = 5
_KC_SEED_ID = 0


def _kc_d2(v: str, c: str) -> F.Column:
    """Exact squared L2 between two vector columns via three left folds
    (bit-identical to the oracle's identical expression tree)."""
    return dot(v, v) - F.lit(2.0) * dot(v, c) + dot(c, c)


def _kc_duck_d2(v: str, c: str) -> str:
    return f"({duck_dot(v, v)} - 2.0 * {duck_dot(v, c)} + {duck_dot(c, c)})"


def _kc_oracle() -> str:
    """Unrolled greedy selection: center i+1 = the point maximizing the
    min squared-L2 distance to centers 1..i (ties -> lowest vec_id).
    k is small and fixed, so the iterations unroll into chained CTEs."""
    lines = [
        "WITH pts AS (SELECT vec_id, embedding FROM embeddings),",
        f"c1 AS (SELECT vec_id, embedding FROM pts WHERE vec_id = {_KC_SEED_ID})",
    ]
    for i in range(2, _KC_K + 1):
        prev = ", ".join(f"c{j}" for j in range(1, i))
        d2s = ", ".join(
            f"{_kc_duck_d2('p.embedding', f'c{j}.embedding')}"
            for j in range(1, i)
        )
        not_in = " AND ".join(
            f"p.vec_id != c{j}.vec_id" for j in range(1, i)
        )
        lines.append(
            f", c{i} AS (SELECT p.vec_id, p.embedding FROM pts p, {prev} "
            f"WHERE {not_in} "
            f"ORDER BY LEAST({d2s}) DESC, p.vec_id ASC LIMIT 1)"
        )
    sel = " UNION ALL ".join(
        f"SELECT CAST({i} AS BIGINT) AS sel_order, vec_id FROM c{i}"
        for i in range(1, _KC_K + 1)
    )
    return "\n".join(lines) + "\n" + sel


@workload("sample_kcenter_coreset", oracle=_kc_oracle())
def sample_kcenter_coreset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C234 — greedy k-center coreset (farthest-point traversal): pick a
    deterministic seed, then repeatedly take the point FARTHEST (max-min
    exact squared L2, ties to lowest id) from the chosen set — the
    classic 2-approximation for k-center and the standard
    diversity-subset primitive in data curation (cover the embedding
    space, don't oversample dense modes).

    Spark-first: each of the k-1 selection rounds is a 1-row
    TakeOrderedAndProject over a scan with all previously chosen centers
    attached via BROADCAST crossJoins of 1-row frames — the whole
    selection is ONE lazy Catalyst plan (building it launches no jobs),
    k linear passes, no quadratic stage, no driver loop over data. At
    100 TB each pass is a full scan, so k stays small (coresets use
    k-center on SAMPLES per shard, then recurse — the per-shard plan is
    exactly this one)."""
    emb = load_table(spark, sf_dir, "embeddings")
    pts = emb.select("vec_id", "embedding")
    centers = [
        pts.filter(F.col("vec_id") == _KC_SEED_ID).select(
            F.col("vec_id").alias("c1_id"), F.col("embedding").alias("c1_v")
        )
    ]
    for i in range(2, _KC_K + 1):
        cand = pts
        for c in centers:
            cand = cand.crossJoin(F.broadcast(c))
        chosen_ids = [F.col(f"c{j}_id") for j in range(1, i)]
        d2s = [_kc_d2("embedding", f"c{j}_v") for j in range(1, i)]
        min_d2 = d2s[0] if len(d2s) == 1 else F.least(*d2s)
        keep = cand
        for cid in chosen_ids:
            keep = keep.filter(F.col("vec_id") != cid)
        nxt = (
            keep.select("vec_id", "embedding", min_d2.alias("md"))
            .orderBy(F.desc("md"), F.asc("vec_id"))
            .limit(1)
            .select(
                F.col("vec_id").alias(f"c{i}_id"),
                F.col("embedding").alias(f"c{i}_v"),
            )
        )
        centers.append(nxt)
    out = None
    for i, c in enumerate(centers, start=1):
        row = c.select(
            F.lit(i).cast("long").alias("sel_order"),
            F.col(f"c{i}_id").alias("vec_id"),
        )
        out = row if out is None else out.unionAll(row)
    return out


# ---------------------------------------------------------------------------
# C235 — streaming interarrival anomaly (exact-integer online z-score)
# ---------------------------------------------------------------------------

_ANOM_ORACLE = """
WITH seq AS (
  SELECT event_id, user_id, ts,
         (epoch_us(ts) - LAG(epoch_us(ts)) OVER w) // 1000000 AS gap_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
mom AS (
  SELECT event_id, user_id, ts, gap_s,
         CAST(COALESCE(COUNT(gap_s) OVER p, 0) AS BIGINT) AS n_prior,
         CAST(COALESCE(SUM(gap_s) OVER p, 0) AS BIGINT) AS sm,
         CAST(COALESCE(SUM(gap_s * gap_s) OVER p, 0) AS BIGINT) AS sq
  FROM seq
  WINDOW p AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
)
SELECT event_id, user_id, ts, gap_s, n_prior,
       (gap_s IS NOT NULL AND n_prior >= 3
        AND (gap_s * n_prior - sm) * (gap_s * n_prior - sm)
            > 9 * (n_prior * sq - sm * sm)) AS is_anomaly
FROM mom
"""


@workload("stream_anomaly_interarrival", oracle=_ANOM_ORACLE)
def stream_anomaly_interarrival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C235 — per-user ONLINE interarrival anomaly stream
    (streaming/eventtime.py interarrival_anomaly_stateful): flag an
    event when its gap to the previous same-user event z-scores |z| > 3
    against all PRIOR gaps (>= 3 required). Per-key state is four
    int64s (last ts + exact count/sum/sumsq of gaps in whole seconds),
    and the z-test is pure int64 algebra — (gap*n - sum)^2 >
    9*(n*sumsq - sum^2) — so the stream is BIT-identical to the batch
    window twin at any micro-batch boundary and both hash against one
    DuckDB oracle. The O(1)-state shape is what per-entity rate anomaly
    detection needs at 100 TB ingest (contrast: a quantile-based
    detector would carry unbounded per-key history)."""
    from sample_data_pipeline_project_spark.streaming.eventtime import (
        interarrival_anomaly_stateful,
        run_stream_to_table,
        stream_events,
    )

    events = stream_events(spark, sf_dir)
    out = run_stream_to_table(
        interarrival_anomaly_stateful(events), output_mode="append"
    )
    # cast the sink's TIMESTAMP back to NTZ for oracle parity (the
    # stream source casts NTZ -> TIMESTAMP for watermark eligibility)
    return out.withColumn("ts", F.col("ts").cast("timestamp_ntz"))
