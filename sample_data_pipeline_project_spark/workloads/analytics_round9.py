"""Round-9 workloads: binary-quantized ANN, RAG chunking, chunk-level
dedup, and temperature-scaled corpus mixing — the remaining staples of a
100 TB training-data pipeline.

C228 `sim_hamming_rerank_topk` — sign-bit (binary) quantization is the
cheapest vector shortlist there is: 1 bit/dim (32x less than float32)
and the scan is XOR + POPCOUNT. Unlike the IVF/PQ families it needs NO
training, so the full two-stage pipeline (Hamming shortlist -> exact
cosine rerank) is deterministic and VALUE-HASHED against the DuckDB
oracle — the strongest oracle shape an ANN operator can carry.

C229 `text_chunk_overlap` / C230 `dedup_chunk_exact` — fixed-size token
chunking with overlap is how long documents become retrieval/training
units (RAG windows, packing inputs); chunk-hash dedup then catches
documents that share exact windows (boilerplate, mirrored passages)
which document-level exact dedup misses. Stride-aligned hashes make the
cross-document collision set deterministic.

C231 `train_temperature_mix` — temperature-scaled source weighting
(w_s ~ tokens_s^alpha, here alpha = 1/2 so the power is IEEE-exact
sqrt on both engines) is the standard anti-head-domination mix rule for
multi-source corpora; emits per-source weights and effective epochs at
a fixed token budget.

Reference parity: the reference client (snowflake_query_client.py,
snowflake_tasks.py) has no ANN/chunking surface — these are Tier B/C
extensions mandated by the brief, built Spark-first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sample_data_pipeline_project_spark.functions.text import tokens
from sample_data_pipeline_project_spark.functions.vectors import duck_cosine
from sample_data_pipeline_project_spark.operators.similarity import (
    duck_sign_pack,
    hamming_rerank_topk,
)
from sample_data_pipeline_project_spark.sources.catalog import load_table
from sample_data_pipeline_project_spark.workloads import workload

# DuckDB twin of functions.text.tokens()
_DUCK_TOKENS = "string_split_regex(lower(trim(text)), '\\s+')"

_DIM = 64
_HAM_K = 10
_HAM_SHORTLIST = 50
_HAM_QUERY_IDS = [0, 1, 2, 3]


def _hamming_oracle() -> str:
    packed_cols = ",\n       ".join(duck_sign_pack(_DIM, "embedding"))
    n_words = -(-_DIM // 32)
    qsel = ", ".join(f"w{w} AS qw{w}" for w in range(n_words))
    ham = " + ".join(f"bit_count(xor(p.w{w}, q.qw{w}))" for w in range(n_words))
    ids = ", ".join(str(i) for i in _HAM_QUERY_IDS)
    return f"""
WITH packed AS (
  SELECT vec_id,
       {packed_cols}
  FROM embeddings
),
q AS (SELECT vec_id AS query_id, {qsel} FROM packed WHERE vec_id IN ({ids})),
scored AS (
  SELECT q.query_id, p.vec_id,
         CAST({ham} AS INTEGER) AS hamming_dist
  FROM packed p CROSS JOIN q
  WHERE p.vec_id != q.query_id
),
short AS (
  SELECT *, ROW_NUMBER() OVER (
           PARTITION BY query_id ORDER BY hamming_dist ASC, vec_id ASC
         ) AS srn
  FROM scored
),
rer AS (
  SELECT s.query_id, s.vec_id, s.hamming_dist,
         {duck_cosine('e.embedding', 'qe.embedding')} AS cosine_sim
  FROM short s
  JOIN embeddings e ON e.vec_id = s.vec_id
  JOIN embeddings qe ON qe.vec_id = s.query_id
  WHERE s.srn <= {_HAM_SHORTLIST}
)
SELECT query_id, vec_id, hamming_dist, cosine_sim,
       CAST(ROW_NUMBER() OVER (
         PARTITION BY query_id ORDER BY cosine_sim DESC, vec_id ASC
       ) AS INTEGER) AS rank
FROM rer
QUALIFY rank <= {_HAM_K}
"""


@workload("sim_hamming_rerank_topk", oracle=_hamming_oracle())
def sim_hamming_rerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B3 scale path (C228) — binary sign quantization + Hamming
    shortlist + exact cosine rerank (operators/similarity.py
    hamming_rerank_topk). Stage 1 scans only the packed int64 words
    (1 bit/dim); stage 2 touches float vectors for |queries| x shortlist
    rows only. Training-free, hence fully value-hashed."""
    emb = load_table(spark, sf_dir, "embeddings")
    return hamming_rerank_topk(
        emb, _DIM, _HAM_K, _HAM_SHORTLIST, _HAM_QUERY_IDS
    )


_CHUNK = 50
_STRIDE = 40

_CHUNK_CTE = f"""
toks AS (
  SELECT doc_id, COALESCE({_DUCK_TOKENS}, []) AS t FROM documents
),
starts AS (
  SELECT doc_id, t,
         unnest(range(0, GREATEST(len(t), 1), {_STRIDE})) AS start
  FROM toks
),
chunks AS (
  SELECT doc_id,
         CAST(start // {_STRIDE} AS BIGINT) AS chunk_index,
         CAST(start AS BIGINT) AS start_token,
         CAST(len(list_slice(t, start + 1, start + {_CHUNK})) AS BIGINT) AS n_tokens,
         md5(array_to_string(list_slice(t, start + 1, start + {_CHUNK}), ' ')) AS chunk_hash
  FROM starts
)
"""


@workload(
    "text_chunk_overlap",
    oracle=f"""
WITH {_CHUNK_CTE}
SELECT doc_id, chunk_index, start_token, n_tokens, chunk_hash FROM chunks
""",
)
def text_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C229 — RAG/window chunking: fixed 50-token chunks on a 40-token
    stride (tail chunks shorter; every doc yields >= 1 chunk). JVM-side
    sequence + slice + posexplode — one narrow projection, no shuffle,
    trivially shard-parallel at 100 TB. Token arrays are coalesced to
    empty on BOTH sides: without it a NULL `text` diverges between the
    engines (Spark size(slice(NULL,..)) = -1 vs DuckDB
    len(list_slice(NULL,..)) = NULL), a silent dependence on the
    generator never emitting NULL text."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id",
        F.coalesce(
            tokens("text"), F.expr("CAST(array() AS array<string>)")
        ).alias("t"),
    )
    return (
        t.select(
            "doc_id",
            "t",
            F.posexplode(
                F.expr(f"sequence(0, greatest(size(t) - 1, 0), {_STRIDE})")
            ).alias("chunk_index", "start"),
        )
        .select(
            "doc_id",
            F.col("chunk_index").cast("long").alias("chunk_index"),
            F.col("start").cast("long").alias("start_token"),
            F.expr(f"size(slice(t, start + 1, {_CHUNK}))")
            .cast("long")
            .alias("n_tokens"),
            F.expr(
                f"md5(array_join(slice(t, start + 1, {_CHUNK}), ' '))"
            ).alias("chunk_hash"),
        )
    )


@workload(
    "dedup_chunk_exact",
    oracle=f"""
WITH {_CHUNK_CTE}
SELECT chunk_hash,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_occurrences,
       MIN(doc_id) AS keep_doc_id
FROM chunks
GROUP BY chunk_hash
HAVING COUNT(DISTINCT doc_id) > 1
""",
)
def dedup_chunk_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C230 — chunk-level exact dedup: stride-aligned chunk hashes shared
    by >1 document (boilerplate / mirrored passages document-level dedup
    misses). One hash-partitioned groupBy over the chunk set; the keep
    rule (lowest doc_id) matches the exact-dedup family."""
    chunks = text_chunk_overlap(spark, sf_dir)
    return (
        chunks.groupBy("chunk_hash")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
            F.min("doc_id").alias("keep_doc_id"),
        )
        .filter(F.col("n_docs") > 1)
    )


_MIX_BUDGET = 10_000_000


@workload(
    "train_temperature_mix",
    oracle=f"""
WITH per_source AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(len({_DUCK_TOKENS})) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source
),
w AS (
  SELECT *, SQRT(CAST(n_tokens AS DOUBLE)) AS raw_w FROM per_source
)
SELECT source, n_docs, n_tokens,
       ROUND(raw_w / SUM(raw_w) OVER (), 6) AS mix_weight,
       ROUND({_MIX_BUDGET} * (raw_w / SUM(raw_w) OVER ()) / n_tokens, 6)
         AS effective_epochs
FROM w
""",
)
def train_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C231 — temperature-scaled source mixing (alpha = 1/2, i.e. T = 2):
    per-source sampling weight ~ sqrt(token count), normalized; effective
    epochs = budget * weight / tokens shows which tails get up-sampled
    past 1 epoch. sqrt is IEEE-correctly-rounded in both engines, so the
    weights value-hash (the whole-corpus normalizer is a |sources|-value
    double sum; rounding at 1e-6 absorbs association order). One grouped
    aggregate; the normalizer re-enters as a crossJoin of the 1-row
    total (the rollup_share_of_parent pattern) — fully LAZY, unlike the
    round-9 version whose construction-time .first() made merely
    building the query run a Spark job — so no global window exists."""
    docs = load_table(spark, sf_dir, "documents")
    per_source = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(tokens("text"))).alias("n_tokens"),
    )
    w = per_source.withColumn(
        "raw_w", F.sqrt(F.col("n_tokens").cast("double"))
    )
    total = w.agg(F.sum("raw_w").alias("__denom"))
    return w.crossJoin(F.broadcast(total)).select(
        "source",
        "n_docs",
        "n_tokens",
        F.round(F.col("raw_w") / F.col("__denom"), 6).alias("mix_weight"),
        F.round(
            F.lit(_MIX_BUDGET)
            * (F.col("raw_w") / F.col("__denom"))
            / F.col("n_tokens"),
            6,
        ).alias("effective_epochs"),
    )
