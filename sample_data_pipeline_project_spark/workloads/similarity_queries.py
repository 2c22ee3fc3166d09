"""Similarity-search workloads (B3) over `embeddings`.

Oracle parity relies on both engines computing the identical left-fold dot
product (functions/vectors.py) — cosine values are bit-identical, so even
ORDER BY score is deterministic across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sample_data_pipeline_project_spark.functions.vectors import duck_cosine
from sample_data_pipeline_project_spark.operators.similarity import (
    ivf_topk_cosine,
    neardup_cosine_pairs_blocked,
    topk_cosine,
)
from sample_data_pipeline_project_spark.sources.catalog import load_table
from sample_data_pipeline_project_spark.sources.scratch import scratch_dir
from sample_data_pipeline_project_spark.workloads import workload

_K = 10
_QUERY_ID = 0
_NEARDUP_THRESHOLD = 0.4
_N_CENTROIDS = 8
_NPROBE = 2


@workload(
    "sim_topk_bruteforce",
    oracle=f"""
WITH q AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = {_QUERY_ID})
SELECT e.vec_id,
       {duck_cosine('e.embedding', 'q.q_emb')} AS cosine_sim
FROM embeddings e CROSS JOIN q
WHERE e.vec_id != {_QUERY_ID}
ORDER BY cosine_sim DESC, e.vec_id ASC
LIMIT {_K}
""",
)
def sim_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B3 — exact cosine top-k: broadcast 1-row query x corpus scan."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == _QUERY_ID).select(
        F.col("embedding").alias("q_emb")
    )
    corpus = emb.filter(F.col("vec_id") != _QUERY_ID)
    return topk_cosine(corpus, q, _K)


@workload(
    "sim_neardup_pairs",
    oracle=f"""
SELECT a.vec_id AS a, b.vec_id AS b,
       {duck_cosine('a.embedding', 'b.embedding')} AS cosine_sim
FROM embeddings a
JOIN embeddings b ON a.vec_id < b.vec_id
WHERE {duck_cosine('a.embedding', 'b.embedding')} >= {_NEARDUP_THRESHOLD}
""",
)
def sim_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B3/B2 — embedding-cosine near-dup pairs: blocked-matmul candidate
    filter + exact JVM left-fold verification (bit-identical to the naive
    quadratic form, linear shuffle volume)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return neardup_cosine_pairs_blocked(emb, _NEARDUP_THRESHOLD)


_DUCK_IVF = f"""
WITH cents AS (
  SELECT vec_id AS centroid_id, embedding AS c_emb
  FROM embeddings WHERE vec_id < {_N_CENTROIDS}
),
q AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = {_QUERY_ID}),
corpus AS (SELECT * FROM embeddings WHERE vec_id != {_QUERY_ID}),
assigned AS (
  SELECT e.vec_id, c.centroid_id,
         ROW_NUMBER() OVER (
           PARTITION BY e.vec_id
           ORDER BY {duck_cosine('e.embedding', 'c.c_emb')} DESC, c.centroid_id ASC
         ) AS rn
  FROM corpus e CROSS JOIN cents c
),
a1 AS (SELECT vec_id, centroid_id FROM assigned WHERE rn = 1),
probe AS (
  SELECT centroid_id
  FROM cents CROSS JOIN q
  ORDER BY {duck_cosine('c_emb', 'q_emb')} DESC, centroid_id ASC
  LIMIT {_NPROBE}
),
bucket AS (
  SELECT e.* FROM corpus e
  JOIN a1 ON e.vec_id = a1.vec_id
  JOIN probe ON a1.centroid_id = probe.centroid_id
)
SELECT e.vec_id,
       {duck_cosine('e.embedding', 'q.q_emb')} AS cosine_sim
FROM bucket e CROSS JOIN q
ORDER BY cosine_sim DESC, e.vec_id ASC
LIMIT {_K}
"""


@workload("sim_ivf_topk", oracle=_DUCK_IVF)
def sim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B3 scale path — IVF: assign vectors to nearest of 8 deterministic
    centroids (first 8 ids), probe the 2 buckets nearest the query, exact
    top-k inside them."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == _QUERY_ID).select(
        F.col("embedding").alias("q_emb")
    )
    corpus = emb.filter(F.col("vec_id") != _QUERY_ID)
    cents = emb.filter(F.col("vec_id") < _N_CENTROIDS).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("c_emb")
    )
    return ivf_topk_cosine(corpus, q, cents, _K, _NPROBE)


def _exact_topk_ids(spark: SparkSession, sf_dir: str):
    """(corpus, query, exact brute-force top-k id set) shared by the ANN
    certification workloads."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == _QUERY_ID).select(
        F.col("embedding").alias("q_emb")
    )
    corpus = emb.filter(F.col("vec_id") != _QUERY_ID)
    exact = topk_cosine(corpus, q, _K).select("vec_id")
    return corpus, q, exact


def _topk_certification(approx: DataFrame, exact: DataFrame, min_recall: float):
    """Reduce an ANN top-k result to the columns a SQL oracle can state
    exactly: how many rows came back (= k whenever the probed buckets hold
    >= k candidates — true at every testdata scale) and a recall bound vs
    the exact top-k. The approximate ids themselves depend on hashing, so
    they stay out of the hashed projection; tests assert the full id sets.

    The hit threshold is rounded to an INTEGER before the comparison:
    `min_recall * _K` in binary floating point can land epsilon above the
    intended count (0.3 * 10 == 3.0000000000000004), which would fail a
    result that has exactly the intended number of hits."""
    min_hits = int(round(min_recall * _K))
    hits = approx.join(exact, "vec_id", "left_semi")
    return (
        approx.agg(F.count("*").alias("n_returned"))
        .crossJoin(hits.agg(F.count("*").alias("n_hits")))
        .select(
            "n_returned",
            (F.col("n_hits") >= F.lit(min_hits)).alias("recall_ok"),
        )
    )


# Per-scale recall floors for the trained/randomized ANN family — the
# C227 pattern extended (round 10) to IVF, PQ-ADC, IVFPQ and RP-LSH.
# A single flat bound decays silently across scales (round 8: a PQ 4x16
# codebook passed the sf0.01 gate at recall 0 at sf0.1; round 9: IVF
# nprobe=4 decayed 0.83 -> 0.66 over one decade). Floors are pinned one
# recall@10 step (0.1) under the values MEASURED by
# tools/measure_ann_recall.py and committed in RECALL_CERT.json, so a
# regression of more than one hit at ANY gate scale fails check_oracle.
# `default` keeps the historical conservative bound for non-gate dirs
# (scale probes on .scaledata, user-supplied corpora).
#
# sim_ivf_index_topk shares sim_kmeans_ivf_topk's floors by construction:
# its matches_inmemory cert pins the probed result bit-identical to the
# in-memory operator with the same quantizer parameters, so one
# measurement covers both.
_ANN_FLOORS: dict[str, dict[str, float]] = {
    # measured 0.7 / 0.5 / 0.3 (quantizer coverage falls as K stays 8
    # while N grows — the documented IVF decay shape; nprobe=2 of 8)
    "sim_kmeans_ivf_topk": {
        "sf0.001": 0.6, "sf0.01": 0.4, "sf0.1": 0.2, "default": 0.2,
    },
    "sim_ivf_index_topk": {
        "sf0.001": 0.6, "sf0.01": 0.4, "sf0.1": 0.2, "default": 0.2,
    },
    # measured 0.3 / 0.4 / 0.6 (band occupancy IMPROVES recall with N
    # here: more candidates per probed bucket reach exact re-rank)
    "sim_lsh_topk": {
        "sf0.001": 0.2, "sf0.01": 0.3, "sf0.1": 0.5, "default": 0.1,
    },
    # measured 1.0 / 0.9 / 0.9 (16x16 codebooks + exact refine)
    "sim_pq_adc_topk": {
        "sf0.001": 0.9, "sf0.01": 0.8, "sf0.1": 0.8, "default": 0.2,
    },
    # measured 0.6 / 0.5 / 0.3 (coarse-quantizer decay dominates, same
    # shape as kmeans IVF — the residual PQ stage is not the loss)
    "sim_ivfpq_topk": {
        "sf0.001": 0.5, "sf0.01": 0.4, "sf0.1": 0.2, "default": 0.2,
    },
    # PAIR recall (continuous, not recall@10): measured .58 / .41 / .55
    "sim_rplsh_neardup": {
        "sf0.001": 0.45, "sf0.01": 0.30, "sf0.1": 0.45, "default": 0.2,
    },
}


def _ann_floor(workload_name: str, sf_dir: str) -> float:
    """Per-scale recall floor — but ONLY for the canonical gate corpora
    under /root/testdata: the floors are pinned against those exact
    parquet files, so any other directory that merely happens to be
    named sf0.001/sf0.01/sf0.1 (scale probes, user data) gets the
    conservative 'default' bound instead of inheriting gate pins it was
    never measured against (round-11 ADVICE fix)."""
    import os

    floors = _ANN_FLOORS[workload_name]
    root = os.path.realpath(sf_dir.rstrip("/"))
    if os.path.dirname(root) == "/root/testdata":
        return floors.get(os.path.basename(root), floors["default"])
    return floors["default"]


@workload(
    "sim_kmeans_ivf_topk",
    oracle=f"SELECT CAST({_K} AS BIGINT) AS n_returned, TRUE AS recall_ok",
)
def sim_kmeans_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B3 scale path with a TRAINED quantizer: Lloyd k-means (3 iters,
    deterministic id-init) -> IVF probe of the 2 nearest clusters -> exact
    top-10 cosine inside them. The k-means centroids are iterative
    summation-order-dependent doubles, so the hashed projection certifies
    the result instead of listing it: exactly k rows return and recall@10
    vs the exact brute-force top-k clears a PER-SCALE floor (_ANN_FLOORS,
    pinned one hit under the measured 0.7/0.5/0.3 at
    sf0.001/sf0.01/sf0.1 — see RECALL_CERT.json; the cross-scale decay
    is the fixed-K IVF shape). A broken quantizer or probe flips
    recall_ok and fails the hash; tests cover the id-level sets."""
    from sample_data_pipeline_project_spark.operators.kmeans import kmeans_ivf_topk

    corpus, q, exact = _exact_topk_ids(spark, sf_dir)
    approx = kmeans_ivf_topk(corpus, q, k_clusters=8, top_k=_K, nprobe=2)
    return _topk_certification(
        approx, exact, min_recall=_ann_floor("sim_kmeans_ivf_topk", sf_dir)
    )


@workload(
    "sim_ivf_index_topk",
    oracle=f"""
SELECT TRUE AS matches_inmemory, CAST({_K} AS BIGINT) AS n_returned,
       TRUE AS recall_ok
""",
)
def sim_ivf_index_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B3 at 100 TB — the PERSISTED IVF index (operators/ann_index.py):
    train the coarse quantizer once, write centroids + the corpus
    hive-partitioned by cluster, then probe as a planning-time
    partition-pruned scan reading nprobe/k of the corpus bytes. The
    hashed projection certifies the build-once/probe-many contract:
    exactly k rows return, recall@10 vs exact brute force clears the
    per-scale _ANN_FLOORS bound (shared with sim_kmeans_ivf_topk — the
    bit-identity cert below makes one measurement cover both),
    and the probed result is BIT-IDENTICAL (same (vec_id, cosine)
    multiset) to the in-memory kmeans_ivf_topk operator with the same
    quantizer parameters — a drifted index layout or broken partition
    pruning flips matches_inmemory and fails the hash."""
    from sample_data_pipeline_project_spark.operators.ann_index import (
        build_ivf_index,
        ivf_index_topk,
    )
    from sample_data_pipeline_project_spark.operators.kmeans import kmeans_ivf_topk

    import os

    corpus, q, exact = _exact_topk_ids(spark, sf_dir)
    # under the repo's gitignored warehouse dir (absolute — the driver's
    # cwd is not guaranteed); rebuilt per invocation (the build IS part
    # of what this workload measures)
    path = scratch_dir("ivf_index_workload")
    build_ivf_index(corpus, path, k_clusters=8, max_iters=3)
    probed = ivf_index_topk(spark, path, q, _K, nprobe=2)
    inmem = kmeans_ivf_topk(
        corpus, q, k_clusters=8, top_k=_K, nprobe=2, max_iters=3
    )
    pv = probed.select("vec_id", "cosine_sim")
    iv = inmem.select("vec_id", "cosine_sim")
    diff = pv.exceptAll(iv).unionAll(iv.exceptAll(pv))
    return (
        diff.agg((F.count(F.lit(1)) == 0).alias("matches_inmemory"))
        .crossJoin(
            _topk_certification(
                probed, exact,
                min_recall=_ann_floor("sim_ivf_index_topk", sf_dir),
            )
        )
    )


@workload(
    "sim_lsh_topk",
    oracle=f"SELECT CAST({_K} AS BIGINT) AS n_returned, TRUE AS recall_ok",
)
def sim_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B3 scale path #2 — LSH-bucketed ANN top-k: the query probes only the
    buckets sharing a whole band of hyperplane sign bits with it, then
    exact cosine re-ranks the candidates. Bucket membership is
    hyperplane-dependent, so the hashed projection certifies instead of
    listing: k rows return (the 4 probed buckets always hold >= k
    candidates at ~n/16 expected occupancy each) and recall@10 clears a
    PER-SCALE floor (_ANN_FLOORS; measured 0.3/0.4/0.6 at
    sf0.001/sf0.01/sf0.1 — occupancy IMPROVES recall with N here — see
    RECALL_CERT.json). Tests measure the sharper recall."""
    from sample_data_pipeline_project_spark.operators.similarity import (
        rp_lsh_topk_cosine,
    )

    corpus, q, exact = _exact_topk_ids(spark, sf_dir)
    approx = rp_lsh_topk_cosine(corpus, q, _K)
    return _topk_certification(
        approx, exact, min_recall=_ann_floor("sim_lsh_topk", sf_dir)
    )


@workload(
    "sim_rplsh_neardup",
    oracle=f"""
WITH exact AS (
  SELECT a.vec_id AS a, b.vec_id AS b
  FROM embeddings a
  JOIN embeddings b ON a.vec_id < b.vec_id
  WHERE {duck_cosine('a.embedding', 'b.embedding')} >= {_NEARDUP_THRESHOLD}
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_exact_pairs,
       CAST(0 AS BIGINT) AS n_false_positives,
       TRUE AS recall_ok
FROM exact
""",
)
def sim_rplsh_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B3/B2 — LSH-bucketed near-dup (random hyperplanes, 16 planes x 4
    bands, exact verification). The pair set is hyperplane-dependent, so
    the hashed projection certifies it against the exact blocked-matmul
    pair set the oracle recomputes: zero false positives (guaranteed — the
    LSH path exact-verifies every candidate with the same arithmetic) and
    pair recall clears a PER-SCALE floor (_ANN_FLOORS, pinned ~0.1 under
    the measured 0.58/0.41/0.55 at sf0.001/sf0.01/sf0.1 — see
    RECALL_CERT.json)."""
    from sample_data_pipeline_project_spark.operators.similarity import (
        neardup_cosine_pairs_blocked,
        rp_lsh_neardup_pairs,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    floor = _ann_floor("sim_rplsh_neardup", sf_dir)
    found = rp_lsh_neardup_pairs(emb, _NEARDUP_THRESHOLD).select("a", "b")
    exact = neardup_cosine_pairs_blocked(emb, _NEARDUP_THRESHOLD).select("a", "b")
    false_pos = found.join(exact, ["a", "b"], "left_anti")
    return (
        exact.agg(F.count("*").alias("n_exact_pairs"))
        .crossJoin(found.agg(F.count("*").alias("n_found")))
        .crossJoin(false_pos.agg(F.count("*").alias("n_false_positives")))
        .select(
            "n_exact_pairs",
            "n_false_positives",
            (F.col("n_found") >= floor * F.col("n_exact_pairs")).alias("recall_ok"),
        )
    )


from sample_data_pipeline_project_spark.functions.vectors import (  # noqa: E402
    duck_quantize_int8,
    duck_quantized_cosine,
    quantize_int8,
    quantized_cosine,
)

_DUCK_QUANT_TOPK = f"""
WITH qv AS (
  SELECT vec_id, {duck_quantize_int8('embedding')} AS q
  FROM embeddings
),
query AS (SELECT q AS qq FROM qv WHERE vec_id = {_QUERY_ID})
SELECT v.vec_id,
       {duck_quantized_cosine('v.q', 'query.qq')} AS q_cosine
FROM qv v CROSS JOIN query
WHERE v.vec_id != {_QUERY_ID}
ORDER BY q_cosine DESC, v.vec_id ASC
LIMIT {_K}
"""


@workload("sim_quantized_int8_topk", oracle=_DUCK_QUANT_TOPK)
def sim_quantized_int8_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B3 scale path — int8 scalar quantization: per-vector symmetric
    quantize (scale = 127/max|x|), then top-k by EXACT-INTEGER dot products
    (only the final sqrt/divide touch floats). 4x less memory/shuffle than
    float32 brute force and integer SIMD on the hot path; quantized scores
    are engine-deterministic, so unlike the LSH/k-means ANN variants this
    approximate path still gets a full value-hash oracle."""
    emb = load_table(spark, sf_dir, "embeddings").withColumn(
        "q", quantize_int8("embedding")
    )
    q = emb.filter(F.col("vec_id") == _QUERY_ID).select(F.col("q").alias("qq"))
    corpus = emb.filter(F.col("vec_id") != _QUERY_ID)
    return (
        corpus.crossJoin(F.broadcast(q))
        .select("vec_id", quantized_cosine("q", "qq").alias("q_cosine"))
        .orderBy(F.col("q_cosine").desc(), F.col("vec_id").asc())
        .limit(_K)
    )


from sample_data_pipeline_project_spark.functions.vectors import (  # noqa: E402
    duck_int_dot,
    int_dot,
)

_DUCK_CENTROID_CLASSIFY = f"""
WITH qv AS (
  SELECT vec_id, label, {duck_quantize_int8('embedding')} AS q
  FROM embeddings
),
pos AS (
  SELECT vec_id, label, t.i, q[t.i] AS val
  FROM qv, range(1, 65) AS t(i)
),
cent AS (SELECT label, i, SUM(val) AS s FROM pos GROUP BY label, i),
cents AS (SELECT label, list(s ORDER BY i) AS c FROM cent GROUP BY label),
scored AS (
  SELECT v.vec_id, v.label AS true_label, c.label AS cand,
         {duck_int_dot('v.q', 'c.c')} /
         NULLIF(SQRT({duck_int_dot('v.q', 'v.q')})
                * SQRT({duck_int_dot('c.c', 'c.c')}), 0) AS cos_sim
  FROM qv v CROSS JOIN cents c
),
ranked AS (
  SELECT vec_id, true_label, cand,
         ROW_NUMBER() OVER (PARTITION BY vec_id
                            ORDER BY cos_sim DESC, cand ASC) AS rn
  FROM scored
)
SELECT vec_id, true_label, cand AS predicted_label
FROM ranked WHERE rn = 1
"""


@workload("sim_label_centroid_classify", oracle=_DUCK_CENTROID_CLASSIFY)
def sim_label_centroid_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B3 — nearest-class-centroid classification over labeled embeddings
    (the embedding-eval shape): per-label centroids as element-wise SUMS of
    int8-quantized vectors — posexplode + (label, position) re-aggregation,
    THE distributed way to aggregate vectors element-wise — then each
    vector scores against the 10 broadcast centroids by exact-integer dot
    cosine and takes the argmax. All-integer until the final sqrt/divide,
    so even this 'ML' workload is value-hash deterministic."""
    emb = load_table(spark, sf_dir, "embeddings").withColumn(
        "q", quantize_int8("embedding")
    )
    pos = emb.select("label", F.posexplode("q").alias("pos", "val"))
    cents = (
        pos.groupBy("label", "pos")
        .agg(F.sum("val").alias("s"))
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "s"))),
                lambda x: x["s"],
            ).alias("c")
        )
        .select(F.col("label").alias("cand"), "c")
    )
    scored = emb.crossJoin(F.broadcast(cents)).select(
        "vec_id",
        F.col("label").alias("true_label"),
        "cand",
        (
            int_dot("q", "c")
            / F.nullif(
                F.sqrt(int_dot("q", "q")) * F.sqrt(int_dot("c", "c")),
                F.lit(0.0),
            )
        ).alias("cos_sim"),
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("vec_id").orderBy(
        F.col("cos_sim").desc(), F.col("cand").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "true_label", F.col("cand").alias("predicted_label"))
    )


# --------------------------------------------------------------------------
# Batched multi-query top-k: Q queries amortize ONE corpus scan.
# --------------------------------------------------------------------------
_BATCH_QUERY_MOD = 40


@workload(
    "sim_batch_topk",
    oracle=f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS q_emb
  FROM embeddings WHERE vec_id % {_BATCH_QUERY_MOD} = 0
),
s AS (
  SELECT q.query_id, e.vec_id,
         {duck_cosine('e.embedding', 'q.q_emb')} AS cosine_sim
  FROM embeddings e CROSS JOIN q
  WHERE e.vec_id != q.query_id
),
r AS (
  SELECT query_id, vec_id, cosine_sim,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cosine_sim DESC, vec_id ASC) AS rank
  FROM s WHERE cosine_sim IS NOT NULL
)
SELECT query_id, vec_id, cosine_sim, CAST(rank AS BIGINT) AS rank
FROM r WHERE rank <= {_K}
""",
)
def sim_batch_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BATCHED exact top-k: every corpus vector is scored against the whole
    query batch (vec_id % {mod} == 0) in one scan; each Arrow batch emits
    only its local per-query top-k (selection by the bit-exact cumsum
    scores, so two-stage top-k is exact, not approximately recalled), and
    the final merge is a per-query window over O(batches * k) survivors.
    The oracle ranks the full quadratic score matrix."""
    from sample_data_pipeline_project_spark.operators.similarity import (
        batch_topk_cosine,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % _BATCH_QUERY_MOD == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding")
    )
    return batch_topk_cosine(emb, queries, _K)


_PQ_M = 16
_PQ_K_CODES = 16
_PQ_DIM = 64
_PQ_REFINE = 10 * _K


@workload(
    "sim_pq_adc_topk",
    oracle=f"SELECT CAST({_K} AS BIGINT) AS n_returned, TRUE AS recall_ok",
)
def sim_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B3 scale path — PRODUCT QUANTIZATION with ADC (operators/pq.py):
    16 subspaces x 16 codes compress each 64-dim float32 vector to 8
    bytes (32x), the query scores the whole corpus with m table lookups
    per vector, and the top-{refine} ADC candidates get an exact-cosine
    re-rank. Codebooks come from iterative Lloyd training
    (summation-order-dependent doubles), so like the other trained-ANN
    workloads the hashed projection certifies instead of listing: exactly
    k rows return and recall@10 vs exact brute force clears the
    per-scale _ANN_FLOORS bound (measured 1.0/0.9/0.9 at
    sf0.001/sf0.01/sf0.1, floors 0.9/0.8/0.8 — one hit of slack absorbs
    testdata regeneration). The budget is CALIBRATED, not
    assumed: the round-8 sf0.1 gate caught the previous 4x16 (2-byte,
    128x) configuration at recall 0 — on this corpus the query's exact
    top-10 sits at cosine 0.31-0.41, noise-level differences a 2-byte
    code cannot rank (quantization error per subspace exceeds the
    neighbor gaps); 4-dim subspaces quantize finely enough to order
    them. Codebooks train on the deterministic 1-in-4 hash-sample — the
    100 TB practice (codebooks are distribution statistics) and what
    keeps the Lloyd jobs corpus-size-independent. Tests assert the
    id-level behavior."""
    from sample_data_pipeline_project_spark.operators.pq import pq_adc_topk

    corpus, q, exact = _exact_topk_ids(spark, sf_dir)
    approx = pq_adc_topk(
        corpus,
        q,
        m=_PQ_M,
        k_codes=_PQ_K_CODES,
        dim=_PQ_DIM,
        top_k=_K,
        refine=_PQ_REFINE,
        train_sample_mod=4,
    )
    return _topk_certification(
        approx, exact, min_recall=_ann_floor("sim_pq_adc_topk", sf_dir)
    )


@workload(
    "sim_ivfpq_topk",
    oracle=f"SELECT CAST({_K} AS BIGINT) AS n_returned, TRUE AS recall_ok",
)
def sim_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B3 at billion scale — IVF-PQ with RESIDUAL quantization
    (operators/pq.py:ivfpq_topk, the FAISS IVFPQ composite): the coarse
    quantizer prunes WHICH inverted lists are scanned (nprobe=2 of 8),
    PQ compresses WHAT each list stores (16 x 16-code books over the
    residual x - centroid, whose variance is far below the raw vectors',
    so the same code budget quantizes finer), ADC scores the probed
    lists via a broadcast nprobe x m x k lookup table, and the refine
    set gets an exact-cosine re-rank. Trained quantizers mean the hashed
    projection certifies (exactly-k, recall@10 above the per-scale
    _ANN_FLOORS bound: measured 0.6/0.5/0.3 at sf0.001/sf0.01/sf0.1,
    floors 0.5/0.4/0.2 — the cross-scale decay is the fixed-K coarse-
    quantizer shape, not a PQ loss); the no-pruning configuration is
    pinned bit-identical to brute force in tests/test_pq.py."""
    from sample_data_pipeline_project_spark.operators.pq import ivfpq_topk

    corpus, q, exact = _exact_topk_ids(spark, sf_dir)
    approx = ivfpq_topk(
        corpus,
        q,
        k_coarse=8,
        nprobe=2,
        m=_PQ_M,
        k_codes=_PQ_K_CODES,
        dim=_PQ_DIM,
        top_k=_K,
        refine=_PQ_REFINE,
        # 2 Lloyd iterations per quantizer: recall is re-rank-dominated
        # (certified bound unchanged), and the workload carries TWO
        # trained quantizers — iteration count is its bench cost driver
        max_iters=2,
        train_sample_mod=4,
    )
    return _topk_certification(
        approx, exact, min_recall=_ann_floor("sim_ivfpq_topk", sf_dir)
    )
