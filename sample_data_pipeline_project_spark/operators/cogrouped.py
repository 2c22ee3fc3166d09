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


def clicks_with_prior_view_counts(events: DataFrame) -> DataFrame:
    """Per user (cogroup key): each click event annotated with the count
    of that user's view events strictly before it. One shuffle of each
    side on user_id; per-key work is a sort + binary search
    (O(V log V + C log V)), not the C×V blowup of the join formulation."""
    import numpy as np

    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("click_ts")
    )
    views = events.filter(F.col("event_type") == "view").select("user_id", "ts")

    def count_prior(left, right):
        if left.empty:
            return left.assign(prior_views=np.int64(0)).head(0)
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
