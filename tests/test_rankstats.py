"""Tie-corrected Spearman workload machinery vs a brute-force reference."""

from __future__ import annotations

from pyspark.sql import functions as F


def _brute_spearman(pairs):
    """Average-rank Spearman over (x, y) pairs, Python floats."""
    import math

    def avg_ranks(vals):
        order = sorted(range(len(vals)), key=lambda i: vals[i])
        ranks = [0.0] * len(vals)
        i = 0
        while i < len(order):
            j = i
            while j + 1 < len(order) and vals[order[j + 1]] == vals[order[i]]:
                j += 1
            r = (i + j) / 2.0 + 1.0
            for k in range(i, j + 1):
                ranks[order[k]] = r
            i = j + 1
        return ranks

    xs = [p[0] for p in pairs]
    ys = [p[1] for p in pairs]
    rx, ry = avg_ranks(xs), avg_ranks(ys)
    n = len(pairs)
    mx = sum(rx) / n
    my = sum(ry) / n
    cov = sum((a - mx) * (b - my) for a, b in zip(rx, ry))
    vx = sum((a - mx) ** 2 for a in rx)
    vy = sum((b - my) ** 2 for b in ry)
    if vx == 0 or vy == 0:
        return None
    return cov / math.sqrt(vx) / math.sqrt(vy)


def _spark_spearman(spark, pairs):
    """The workload's rank2 formulation over a single group."""
    from pyspark.sql.window import Window

    li = spark.createDataFrame(
        [(1, x, y) for x, y in pairs], "supp long, x long, y long"
    )

    def rank2(col, out):
        cnt = li.groupBy("supp", col).agg(F.count(F.lit(1)).alias("m"))
        w = (
            Window.partitionBy("supp")
            .orderBy(col)
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        return cnt.select(
            "supp", col,
            (2 * F.coalesce(F.sum("m").over(w), F.lit(0)) + F.col("m") + 1)
            .alias(out),
        )

    cells = li.groupBy("supp", "x", "y").agg(F.count(F.lit(1)).alias("w"))
    joined = cells.join(rank2("x", "rx"), ["supp", "x"]).join(
        rank2("y", "ry"), ["supp", "y"]
    )
    s = joined.groupBy("supp").agg(
        F.sum("w").alias("n"),
        F.sum(F.col("w") * F.col("rx")).alias("sa"),
        F.sum(F.col("w") * F.col("ry")).alias("sb"),
        F.sum(F.col("w") * F.col("rx") * F.col("rx")).alias("saa"),
        F.sum(F.col("w") * F.col("ry") * F.col("ry")).alias("sbb"),
        F.sum(F.col("w") * F.col("rx") * F.col("ry")).alias("sab"),
    ).collect()[0]
    n, sa, sb, saa, sbb, sab = (
        s["n"], s["sa"], s["sb"], s["saa"], s["sbb"], s["sab"]
    )
    import math

    den = math.sqrt(n * saa - sa * sa) * math.sqrt(n * sbb - sb * sb)
    if den == 0:
        return None
    return (n * sab - sa * sb) / den


def test_spearman_matches_bruteforce_with_ties(spark):
    import random

    rnd = random.Random(11)
    for trial in range(4):
        pairs = [
            (rnd.randrange(5), rnd.randrange(4)) for _ in range(40)
        ]  # heavy ties
        got = _spark_spearman(spark, pairs)
        want = _brute_spearman(pairs)
        assert got is not None and want is not None
        assert abs(got - want) < 1e-9, (trial, got, want)


def test_spearman_perfect_monotone(spark):
    pairs = [(i, i * 2) for i in range(10)]
    assert abs(_spark_spearman(spark, pairs) - 1.0) < 1e-12


def test_spearman_perfect_inverse(spark):
    pairs = [(i, -3 * i) for i in range(10)]
    assert abs(_spark_spearman(spark, pairs) + 1.0) < 1e-12


def test_spearman_zero_variance_is_null(spark):
    pairs = [(1, y) for y in range(5)]
    assert _spark_spearman(spark, pairs) is None
