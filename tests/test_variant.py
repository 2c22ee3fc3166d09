"""VARIANT semi-structured semantics (Spark 4 parse_json/variant_get).

Pins the null/missing/type-mismatch behavior the events_variant_agg
workload depends on, against the from_json equivalent — protects the
VARIANT path from Spark 4.x behavior drift (it otherwise rides only the
driver's oracle gate).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T


@pytest.fixture(scope="module")
def js(spark):
    rows = [
        (1, '{"k": 5, "s": "x"}'),        # present int
        (2, '{"k": null}'),               # explicit JSON null
        (3, '{"other": 1}'),              # key missing
        (4, '{"k": "12"}'),               # numeric string
        (5, '{"k": 3.7}'),                # non-integer number
        (7, None),                        # NULL input text
    ]
    return spark.createDataFrame(rows, "id long, props string")


def _kmap(df):
    return {r["id"]: r["k"] for r in df.collect()}


def test_variant_get_null_and_missing_both_null(js):
    got = _kmap(
        js.select(
            "id",
            F.variant_get(F.parse_json("props"), "$.k", "bigint").alias("k"),
        )
    )
    # JSON null, missing key, and NULL input all surface as SQL NULL —
    # exactly what COUNT(k)/SUM(k) aggregation semantics require.
    assert got[2] is None and got[3] is None and got[7] is None
    assert got[1] == 5


def test_variant_get_casts_match_from_json(js):
    """For the workload's field shape (integer-valued k), variant_get and
    from_json agree row-for-row, so the from_json-based oracle checks the
    VARIANT path."""
    schema = T.StructType([T.StructField("k", T.LongType())])
    v = _kmap(
        js.select(
            "id",
            F.variant_get(F.parse_json("props"), "$.k", "bigint").alias("k"),
        )
    )
    j = _kmap(js.select("id", F.from_json("props", schema)["k"].alias("k")))
    for i in (1, 2, 3, 7):
        assert v[i] == j[i], i


def test_variant_get_numeric_coercions(js):
    got = _kmap(
        js.select(
            "id",
            F.variant_get(F.parse_json("props"), "$.k", "bigint").alias("k"),
        )
    )
    # "12" (string) coerces to 12; 3.7 rounds under the bigint cast.
    assert got[4] == 12
    assert got[5] in (3, 4)  # pin: numeric result, not null/error


def test_variant_get_invalid_cast_errors_try_variant_get_nulls(spark):
    """variant_get is STRICT: a value that cannot cast (object -> bigint)
    raises INVALID_VARIANT_CAST; try_variant_get is the lenient twin that
    yields NULL. The workload's strictness matches its DuckDB oracle
    (CAST errors there too)."""
    obj = spark.createDataFrame(
        [(6, '{"k": {"nested": 1}}')], "id long, props string"
    )
    with pytest.raises(Exception, match="INVALID_VARIANT_CAST"):
        obj.select(
            F.variant_get(F.parse_json("props"), "$.k", "bigint").alias("k")
        ).collect()
    got = obj.select(
        F.try_variant_get(F.parse_json("props"), "$.k", "bigint").alias("k")
    ).first()
    assert got["k"] is None


def test_parse_json_single_parse_multi_field(js):
    """The point of VARIANT: one parse, many typed gets."""
    out = js.filter(F.col("id") == 1).select(
        F.variant_get(F.parse_json("props"), "$.k", "bigint").alias("k"),
        F.variant_get(F.parse_json("props"), "$.s", "string").alias("s"),
    ).first()
    assert (out["k"], out["s"]) == (5, "x")


def test_parse_json_rejects_malformed(spark):
    bad = spark.createDataFrame([(1, "{not json")], "id long, props string")
    with pytest.raises(Exception):
        bad.select(F.parse_json("props")).collect()
    # try_parse_json is the lenient twin: malformed -> NULL, not error.
    got = bad.select(
        F.variant_get(F.try_parse_json("props"), "$.k", "bigint").alias("k")
    ).first()
    assert got["k"] is None
