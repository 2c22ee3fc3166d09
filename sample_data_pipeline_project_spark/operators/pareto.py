"""2-D Pareto frontier (skyline query) per group, two-phase distributed.

A row is on the frontier iff no other row in its group is >= on the
maximize axis and <= on the minimize axis with at least one strict
inequality. Exact-duplicate points do not dominate each other — both
survive (matching the SQL NOT EXISTS formulation).

Scale shape (100 TB): the classic two-phase skyline —
  phase 1: local frontier per (group, shard) — dominated rows die
           map-side inside an Arrow batch; survivors are frontier-sized
           per shard, not data-sized;
  phase 2: frontier-of-candidates per group over the union of local
           survivors.
Correctness of the phases: global frontier points are locally
undominated (domination is shard-independent), so they all reach phase
2; every dominated point that sneaks through phase 1 meets a global
frontier dominator there (domination chains terminate at the frontier).
The per-group phase-2 input is |shards| x frontier-size, never raw-data
sized. The kernel is the O(n log n) sort + strict-prefix-cummax scan,
vectorized in numpy — exact integer comparisons only.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _pareto_mask(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Boolean mask of non-dominated points, maximizing BOTH x and y.
    Duplicates of a frontier point all survive."""
    n = len(x)
    if n == 0:
        return np.zeros(0, dtype=bool)
    dfm = pd.DataFrame({"x": x, "y": y})
    # max y within each exact x value
    permax = dfm.groupby("x")["y"].transform("max").to_numpy()
    # strict-prefix cummax: best y among points with STRICTLY greater x
    xs = np.sort(np.unique(x))[::-1]  # unique x descending
    ymax_per_x = dfm.groupby("x")["y"].max().reindex(xs).to_numpy()
    strict_best = np.concatenate(
        ([np.iinfo(np.int64).min], np.maximum.accumulate(ymax_per_x)[:-1])
    )
    strict_of = dict(zip(xs, strict_best))
    sb = np.array([strict_of[v] for v in x], dtype=np.int64)
    return (y == permax) & (y > sb)


def pareto_frontier_2d(
    df: DataFrame,
    group_cols: list[str],
    maximize_col: str,
    minimize_col: str,
    id_cols: list[str],
    n_shards: int = 32,
) -> DataFrame:
    """Frontier rows (all input columns of the projected set) per group,
    maximizing `maximize_col` and minimizing `minimize_col` (both must
    be integer-typed for exact comparisons)."""
    cols = [*group_cols, *id_cols, maximize_col, minimize_col]
    proj = df.select(*cols)
    schema = proj.schema

    def local(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf[maximize_col].to_numpy(dtype=np.int64)
        y = -pdf[minimize_col].to_numpy(dtype=np.int64)  # minimize -> max
        return pdf[_pareto_mask(x, y)]

    shard = F.pmod(F.hash(*[F.col(c) for c in id_cols]), F.lit(n_shards))
    candidates = (
        proj.withColumn("_shard", shard)
        .groupBy(*group_cols, "_shard")
        .applyInPandas(lambda pdf: local(pdf[cols]), schema=schema)
    )
    return candidates.groupBy(*group_cols).applyInPandas(local, schema=schema)
