"""Cogrouped Arrow operator (`cogroup(...).applyInPandas`) — the fourth
pandas execution surface next to mapInPandas (multimodal/ops.py), grouped
applyInPandas (operators/similarity.py), and applyInPandasWithState
(streaming/eventtime.py).

Cogroup shuffles BOTH inputs on the group key and hands each key's two
pandas frames to one Python worker call: the right shape for per-key
algorithms that need simultaneous random access to two tables (alignment,
interleaving, per-key backtesting) and that a join would express only as
an explosive intermediate. State per task is one key's rows, so the
operator scales horizontally with key cardinality; skewed keys are the
caveat, same as any groupBy.

The demo semantics here — for every click, how many of the same user's
views happened strictly before it — has an exact SQL equivalent
(correlated COUNT), which is what makes it oracle-checkable: the pandas
path must reproduce the relational answer bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_OUT_SCHEMA = (
    "user_id long, click_id long, click_ts timestamp_ntz, prior_views long"
)


def clicks_with_prior_view_counts(
    events: DataFrame, n_buckets: int | None = None
) -> DataFrame:
    """Per user: each click event annotated with the count of that user's
    view events strictly before it. One shuffle of each side on the
    cogroup key; per-key work is sort + binary search (O(V log V +
    C log V)), not the C×V blowup of the join formulation.

    `n_buckets=None` cogroups on user_id directly — one Python call per
    user, the simplest form. At scale that per-group invocation overhead
    dominates (millions of tiny frames), so `n_buckets=k` cogroups on
    `user_id % k` instead: a BOUNDED number of Arrow batches, each
    handling its users with one vectorized lexsort + cumulative-sum pass.
    Identical output; this is the shape a 100 TB run uses (k ~ a few x
    cluster cores)."""
    import numpy as np
    import pandas as pd

    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("click_ts")
    )
    views = events.filter(F.col("event_type") == "view").select("user_id", "ts")

    def _empty_out():
        return pd.DataFrame(
            {
                "user_id": pd.Series(dtype="int64"),
                "click_id": pd.Series(dtype="int64"),
                "click_ts": pd.Series(dtype="datetime64[ns]"),
                "prior_views": pd.Series(dtype="int64"),
            }
        )

    def _pruned_out(left):
        # Catalyst pruned some UDF input columns (a terminal count()
        # prunes everything the plan doesn't consume — observed as both
        # full zero-column prunes AND partial ones, e.g. the bucketed
        # path keeps the bucket key). Emit the right NUMBER of rows
        # (always len(left) — one output row per click regardless of the
        # views side), PASS THROUGH every left column Catalyst kept
        # (whatever the plan could still read is real, never fabricated),
        # and fabricate only the pruned ones — pruned columns are by
        # construction unread downstream. prior_views needs both sides'
        # columns, so under any prune it is fabricated too.
        n = len(left)
        cols = {}
        for name in ("user_id", "click_id"):
            cols[name] = (
                left[name].to_numpy()
                if name in left.columns
                else np.zeros(n, dtype="int64")
            )
        cols["click_ts"] = (
            left["click_ts"].to_numpy(dtype="datetime64[ns]")
            if "click_ts" in left.columns
            else np.full(n, np.datetime64("1970-01-01", "ns"))
        )
        cols["prior_views"] = np.zeros(n, dtype="int64")
        return pd.DataFrame(cols)

    def _inputs_pruned(left, right):
        return not (
            {"user_id", "click_id", "click_ts"} <= set(left.columns)
            and {"user_id", "ts"} <= set(right.columns)
        )

    if n_buckets is None:

        def count_prior(left, right):
            if len(left) == 0:
                return _empty_out()
            if _inputs_pruned(left, right):
                return _pruned_out(left)
            view_ts = np.sort(right["ts"].to_numpy()) if not right.empty else np.array(
                [], dtype="datetime64[ns]"
            )
            out = left.copy()
            out["prior_views"] = np.searchsorted(
                view_ts, left["click_ts"].to_numpy(), side="left"
            ).astype("int64")
            return out

        return (
            clicks.groupBy("user_id")
            .cogroup(views.groupBy("user_id"))
            .applyInPandas(count_prior, _OUT_SCHEMA)
        )

    def count_prior_bucket(left, right):
        if len(left) == 0:
            return _empty_out()
        if _inputs_pruned(left, right):
            return _pruned_out(left)
        n_c, n_v = len(left), len(right)
        # An empty cogroup side arrives as a pandas frame WITHOUT columns
        # (not just without rows) — never index it.
        uid = np.concatenate(
            [
                left["user_id"].to_numpy(),
                right["user_id"].to_numpy()
                if n_v
                else np.array([], dtype=np.int64),
            ]
        )
        ts = np.concatenate(
            [
                left["click_ts"].to_numpy(dtype="datetime64[ns]"),
                right["ts"].to_numpy(dtype="datetime64[ns]")
                if n_v
                else np.array([], dtype="datetime64[ns]"),
            ]
        )
        # kind 0=click, 1=view; at equal (user, ts) clicks sort FIRST so a
        # view at the same instant is NOT "strictly before" the click.
        kind = np.concatenate(
            [np.zeros(n_c, dtype=np.int8), np.ones(n_v, dtype=np.int8)]
        )
        order = np.lexsort((kind, ts, uid))
        uid_s, kind_s = uid[order], kind[order]
        # exclusive running count of views: views at positions < i
        cum = np.concatenate(([0], np.cumsum(kind_s == 1)))[:-1]
        # subtract the count at each user's first row -> per-user prior views
        new_user = np.concatenate(([True], uid_s[1:] != uid_s[:-1]))
        block_start = np.maximum.accumulate(
            np.where(new_user, np.arange(uid_s.size), 0)
        )
        prior = cum - cum[block_start]
        # scatter back to the click rows' original order
        click_pos = np.empty(n_c, dtype=np.int64)
        src_idx = order[kind_s == 0]  # original concat index of each click row
        click_pos[src_idx] = prior[kind_s == 0]
        out = left.drop(columns=["__b"], errors="ignore").copy()
        out["prior_views"] = click_pos
        return out

    b = F.pmod(F.col("user_id"), F.lit(n_buckets)).alias("__b")
    return (
        clicks.select("*", b)
        .groupBy("__b")
        .cogroup(views.select("*", b).groupBy("__b"))
        .applyInPandas(count_prior_bucket, _OUT_SCHEMA)
    )
