"""gram_moments (operators/gram.py): exact-int Gram partials."""

import numpy as np
from pyspark.sql import functions as F

from sample_data_pipeline_project_spark.operators.gram import (
    QUANT_SCALE,
    gram_moments,
)


def _agg(df):
    return (
        gram_moments(df, "v")
        .groupBy("i", "j")
        .agg(
            F.sum("sxy").alias("sxy"),
            F.sum("sx").alias("sx"),
            F.sum("cnt").alias("cnt"),
        )
    )


def _expected(vectors):
    q = np.floor(np.array(vectors, dtype=np.float64) * QUANT_SCALE).astype(
        np.int64
    )
    g = q.T @ q
    s = q.sum(axis=0)
    d = q.shape[1]
    out = {}
    for i in range(d):
        for j in range(i, d):
            out[(i, j)] = (
                int(g[i, j]),
                int(s[i]) if i == j else 0,
                len(vectors) if i == j else 0,
            )
    return out


def test_gram_exact_vs_numpy(spark):
    vecs = [
        [0.5, -0.25, 1.0 / 3.0],
        [-1.0, 0.125, 0.75],
        [0.0, -0.6, 0.2],
    ]
    df = spark.createDataFrame([(v,) for v in vecs], "v array<double>")
    got = {
        (r["i"], r["j"]): (r["sxy"], r["sx"], r["cnt"])
        for r in _agg(df).collect()
    }
    assert got == _expected(vecs)


def test_gram_partials_merge(spark):
    # partition-independent: 1-partition and 4-partition runs agree
    rng = np.random.default_rng(7)
    vecs = rng.normal(0, 0.3, size=(40, 5)).tolist()
    df1 = spark.createDataFrame([(v,) for v in vecs], "v array<double>").coalesce(1)
    df4 = spark.createDataFrame([(v,) for v in vecs], "v array<double>").repartition(4)
    rows1 = {tuple(r) for r in _agg(df1).collect()}
    rows4 = {tuple(r) for r in _agg(df4).collect()}
    assert rows1 == rows4 == {
        (i, j, *v) for (i, j), v in _expected(vecs).items()
    }
