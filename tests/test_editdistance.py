"""edit_distance_pairs: the q-gram prefiltered plan must equal the
quadratic reference exactly — including distance-1/2 substitutions,
insertions and deletions (position-shifting edits are where a naive
positional filter would lose pairs)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sample_data_pipeline_project_spark.operators.dedup import edit_distance_pairs

_BASE = "the quick brown fox jumps over the lazy and sleepy dog tonight"


def _docs(spark):
    variants = [
        _BASE,  # 0: identical prefix to 1
        _BASE,  # 1: exact dup of 0 -> d=0
        _BASE[:17] + "X" + _BASE[18:],  # 2: one substitution -> d=1
        _BASE[:9] + _BASE[10:],  # 3: one deletion (shifts everything) -> d=1
        # 4: insert at 10 + delete at 30 (length-preserving, shifts all
        # interior positions) -> d=2 vs 0. NB a front insertion would NOT
        # be d=2 here: prefix TRUNCATION desynchronizes the tail, which is
        # inherent to prefix fingerprinting, not a filter property.
        _BASE[:10] + "z" + _BASE[10:30] + _BASE[31:],
        _BASE[:5] + "QQQ" + _BASE[8:],  # 5: three substitutions -> d=3 (out)
        "completely different text that shares nothing with the base at all",
        _BASE[::-1],  # reversed -> far
    ]
    rows = [(i, t, "en") for i, t in enumerate(variants)]
    # a second language block with its own dup pair, to check blocking
    rows += [(100, _BASE, "de"), (101, _BASE, "de"), (102, _BASE, "en")]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def _quadratic(spark, docs, prefix_len, threshold):
    d = docs.select(
        "doc_id", "lang", F.substring("text", 1, prefix_len).alias("p")
    )
    a, b = d.alias("a"), d.alias("b")
    return (
        a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.levenshtein("a.p", "b.p").alias("d"),
        )
        .filter(F.col("d") <= threshold)
    )


def _pairs(df):
    return sorted(tuple(r) for r in df.collect())


def test_prefilter_equals_quadratic_with_shifting_edits(spark):
    docs = _docs(spark)
    got = _pairs(edit_distance_pairs(docs, prefix_len=40, threshold=2, q=12))
    expected = _pairs(_quadratic(spark, docs, 40, 2))
    assert got == expected
    # sanity on the engineered cases: d=0, substitution, deletion,
    # double-insertion are all in; the d=3 variant is out
    found = {(a, b) for a, b, _ in got}
    assert (0, 1) in found and (0, 2) in found
    assert (0, 3) in found and (0, 4) in found
    assert not any(5 in p for p in found)
    # language blocking: the de-block pair is found, no cross-lang pairs
    # (de block = {100, 101}; 102 is an en copy of the base)
    assert (100, 101) in found
    de = {100, 101}
    assert not any((a in de) != (b in de) for a, b in found)


def test_distances_reported_exactly(spark):
    docs = _docs(spark)
    got = {
        (r["doc_a"], r["doc_b"]): r["prefix_edit_distance"]
        for r in edit_distance_pairs(docs, prefix_len=40, threshold=2, q=12).collect()
    }
    assert got[(0, 1)] == 0
    assert got[(0, 2)] == 1
    # the deletion variant scores 2 on the PREFIX: 1 for the deletion plus
    # 1 for the shifted-in trailing char (truncation desync, see above)
    assert got[(0, 3)] == 2
    assert got[(0, 4)] == 2


def test_pigeonhole_geometry_guard(spark):
    # (prefix_len - q + 1) - t*q must be > 0 for losslessness; the
    # default geometry satisfies it with margin
    prefix_len, q, t = 40, 12, 2
    assert (prefix_len - q + 1) - t * q > 0


def test_matches_quadratic_on_testdata(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    got = _pairs(edit_distance_pairs(docs, prefix_len=40, threshold=2, q=12))
    expected = _pairs(_quadratic(spark, docs, 40, 2))
    assert got == expected
