"""Deduplication workloads (B1/B2) over `documents`, each with a DuckDB
oracle computing the identical md5-based hashing so values match exactly."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sample_data_pipeline_project_spark.functions.text import md5_fingerprint
from sample_data_pipeline_project_spark.operators.dedup import (
    dedup_groups,
    jaccard_pairs_prefix,
    minhash_lsh_candidates,
)
from sample_data_pipeline_project_spark.sources.catalog import load_table
from sample_data_pipeline_project_spark.workloads import workload

_DUCK_TOKS = "list_distinct(string_split_regex(lower(trim(text)), '\\s+'))"

_JACCARD_THRESHOLD = 0.9


@workload(
    "dedup_exact",
    oracle="""
SELECT md5(lower(trim(text))) AS text_key,
       MIN(doc_id) AS canonical_id,
       COUNT(*) AS n_copies
FROM documents
GROUP BY md5(lower(trim(text)))
""",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B1 — exact dedup keyed on the md5 text fingerprint: shuffles 16-byte
    keys, not documents; canonical id = min doc_id per group."""
    d = load_table(spark, sf_dir, "documents").withColumn(
        "text_key", md5_fingerprint("text")
    )
    return dedup_groups(d, ["text_key"], "doc_id")


@workload(
    "dedup_jaccard_pairs",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, unnest({_DUCK_TOKS}) AS tok FROM documents
),
sizes AS (SELECT doc_id, COUNT(*) AS n_tok FROM toks GROUP BY doc_id),
shared AS (
  SELECT a.doc_id AS a, b.doc_id AS b, COUNT(*) AS shared
  FROM toks a JOIN toks b ON a.tok = b.tok AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT s.a, s.b, s.shared, sa.n_tok AS n_a, sb.n_tok AS n_b,
       CAST(s.shared AS DOUBLE) / (sa.n_tok + sb.n_tok - s.shared) AS jaccard
FROM shared s
JOIN sizes sa ON s.a = sa.doc_id
JOIN sizes sb ON s.b = sb.doc_id
WHERE CAST(s.shared AS DOUBLE) / (sa.n_tok + sb.n_tok - s.shared)
      >= {_JACCARD_THRESHOLD}
""",
)
def dedup_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B2 — token-set Jaccard near-dup pairs, prefix-filtered (exact:
    AllPairs/PPJoin prefix index + array_intersect verification)."""
    d = load_table(spark, sf_dir, "documents")
    return jaccard_pairs_prefix(d, _JACCARD_THRESHOLD)


_NUM_HASHES = 12
_BANDS = 4
_R = _NUM_HASHES // _BANDS


def _duck_minhash_oracle() -> str:
    mins = ",\n         ".join(
        f"MIN(md5('{i}|' || tok)) AS mh_{i}" for i in range(_NUM_HASHES)
    )
    band_selects = "\n  UNION ALL\n".join(
        "  SELECT doc_id, {bi} AS band_idx, md5({h}) AS band_hash FROM sig".format(
            bi=bi,
            h=" || ',' || ".join(f"mh_{bi * _R + j}" for j in range(_R)),
        )
        for bi in range(_BANDS)
    )
    return f"""
WITH toks AS (
  SELECT doc_id, unnest({_DUCK_TOKS}) AS tok FROM documents
),
sig AS (
  SELECT doc_id,
         {mins}
  FROM toks GROUP BY doc_id
),
banded AS (
{band_selects}
)
SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
FROM banded a
JOIN banded b
  ON a.band_idx = b.band_idx
 AND a.band_hash = b.band_hash
 AND a.doc_id < b.doc_id
"""


@workload("dedup_minhash_lsh", oracle=_duck_minhash_oracle())
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B2 — MinHash(k=12) + LSH banding (4 bands x 3 rows): candidate
    near-dup pairs from band-hash collisions; md5-hex minwise hashing is
    engine-portable so the oracle reproduces signatures exactly."""
    d = load_table(spark, sf_dir, "documents")
    return minhash_lsh_candidates(d, _NUM_HASHES, _BANDS)
