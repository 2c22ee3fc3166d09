"""Vector (embedding) column expressions — B3 similarity primitives.

Embeddings are `array<float>` columns. All math happens JVM-side through
higher-order functions (`zip_with` + `aggregate`) — no UDF, no Python
round-trip, codegen-friendly.

Determinism: elements are cast float->double (exact), multiplied per index
(IEEE, deterministic), then summed by a LEFT FOLD — a fixed evaluation
order, so results are bit-identical run-to-run and engine-to-engine (the
DuckDB oracle mirrors the same fold via list_reduce). That matters because
floating-point addition is not associative; a tree-reduction would produce
a different (equally "correct") value and break value-hash comparisons.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

# Left-fold dot product over two array<float> columns -> double.
DOT_SQL = (
    "aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
    "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
)


def dot(a: str, b: str) -> Column:
    return F.expr(DOT_SQL.format(a=a, b=b))


def norm(a: str) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: str, b: str) -> Column:
    """Cosine similarity = dot / (|a| * |b|); NULL (not an ANSI
    divide-by-zero error) when either vector has zero norm — zero vectors
    have no direction, and NULL drops them from >= threshold filters and
    sorts them last, which is the behavior similarity search wants."""
    return dot(a, b) / F.nullif(norm(a) * norm(b), F.lit(0.0))


def cosine_arrow(a: str, b: str) -> Column:
    """Arrow-batched cosine, bit-identical to `cosine`: numpy's cumsum is a
    strict left-to-right prefix sum, so taking its last element reproduces
    the JVM aggregate() left fold exactly (float->double casts are exact,
    per-index IEEE multiply, then the same fixed-order additions — and
    acc=0.0 + v0 == v0 in IEEE). Same NULL-on-zero-norm contract.

    Use this instead of `cosine` on WIDE rowsets (e.g. an LSH verify stage
    scoring 10^5..10^9 candidate pairs): Catalyst interprets higher-order
    functions per element with boxing, while this path moves Arrow batches
    and does ~3 vectorized passes per batch — measured ~3x end-to-end on a
    470k-pair verify at 64 dims, growing with candidate count. For a few
    hundred rows the JVM expression avoids the Python worker round-trip;
    keep `cosine` there."""
    from pyspark.sql.types import DoubleType

    @F.pandas_udf(DoubleType())
    def _cos(va: pd.Series, vb: pd.Series) -> pd.Series:
        valid = (va.notna() & vb.notna()).to_numpy()
        res = np.full(len(va), np.nan)
        if valid.any():
            A = np.stack(va[valid].to_numpy()).astype("float64")
            B = np.stack(vb[valid].to_numpy()).astype("float64")
            dot_ = np.cumsum(A * B, axis=1)[:, -1]
            den = (
                np.sqrt(np.cumsum(A * A, axis=1)[:, -1])
                * np.sqrt(np.cumsum(B * B, axis=1)[:, -1])
            )
            res[valid] = np.divide(
                dot_, den, out=np.full_like(dot_, np.nan), where=den != 0.0
            )
        # nullable Float64: NaN slots (null input / zero norm) become SQL NULL
        return pd.Series(pd.array(res, dtype="Float64"))

    return _cos(F.col(a), F.col(b))


# DuckDB twins (oracle SQL fragments) — the SAME left fold, so values match
# bit-for-bit. list_zip yields unnamed structs; fields accessed by index.
DUCK_DOT_SQL = (
    "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
    "list_transform(list_zip({a}, {b}), "
    "p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))),"
    "(acc, v) -> acc + v)"
)


def duck_dot(a: str, b: str) -> str:
    return DUCK_DOT_SQL.format(a=a, b=b)


def duck_cosine(a: str, b: str) -> str:
    return (
        f"({duck_dot(a, b)} / "
        f"NULLIF(SQRT({duck_dot(a, a)}) * SQRT({duck_dot(b, b)}), 0))"
    )


# --- int8 scalar quantization (B3 scale path) -----------------------------
# Per-vector symmetric quantization: scale = 127 / max|x_i|, q_i =
# round(x_i * scale) — 4x memory vs float32 and an EXACT-INTEGER dot
# product, so the quantized score is deterministic across engines with no
# float-summation-order caveats (only the final sqrt/divide are IEEE ops
# on exactly-equal integers). round() ties go away-from-zero in both
# Spark (HALF_UP) and DuckDB.

Q_SCALE_SQL = (
    "(CAST(127.0 AS DOUBLE) / "
    "nullif(greatest(abs(array_min({a})), abs(array_max({a}))), CAST(0.0 AS DOUBLE)))"
)

QUANT_SQL = "transform({a}, x -> CAST(round(CAST(x AS DOUBLE) * {s}) AS BIGINT))"

INT_DOT_SQL = (
    "aggregate(zip_with({a}, {b}, (x, y) -> x * y), "
    "CAST(0 AS BIGINT), (acc, v) -> acc + v)"
)


def quantize_int8(a: str) -> Column:
    return F.expr(QUANT_SQL.format(a=a, s=Q_SCALE_SQL.format(a=a)))


def int_dot(a: str, b: str) -> Column:
    return F.expr(INT_DOT_SQL.format(a=a, b=b))


def quantized_cosine(a: str, b: str) -> Column:
    """Cosine in the quantized domain: all three dots are exact integers."""
    return int_dot(a, b) / F.nullif(
        F.sqrt(int_dot(a, a)) * F.sqrt(int_dot(b, b)), F.lit(0.0)
    )


DUCK_Q_SCALE_SQL = (
    "(CAST(127.0 AS DOUBLE) / "
    "NULLIF(GREATEST(ABS(list_min({a})), ABS(list_max({a}))), CAST(0.0 AS DOUBLE)))"
)

DUCK_QUANT_SQL = (
    "list_transform({a}, x -> CAST(round(CAST(x AS DOUBLE) * {s}) AS BIGINT))"
)

DUCK_INT_DOT_SQL = (
    "list_reduce(list_prepend(CAST(0 AS BIGINT), "
    "list_transform(list_zip({a}, {b}), p -> p[1] * p[2])), "
    "(acc, v) -> acc + v)"
)


def duck_quantize_int8(a: str) -> str:
    return DUCK_QUANT_SQL.format(a=a, s=DUCK_Q_SCALE_SQL.format(a=a))


def duck_int_dot(a: str, b: str) -> str:
    return DUCK_INT_DOT_SQL.format(a=a, b=b)


def duck_quantized_cosine(a: str, b: str) -> str:
    return (
        f"({duck_int_dot(a, b)} / "
        f"NULLIF(SQRT({duck_int_dot(a, a)}) * SQRT({duck_int_dot(b, b)}), 0))"
    )
