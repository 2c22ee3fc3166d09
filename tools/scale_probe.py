"""Scale-sensitivity probe: time representative workloads across the
three testdata scale factors and report how runtimes grow vs data size.

The brief's question is "would this plan survive a 100x scale-up" — the
closest measurable proxy at local[32] is the growth EXPONENT between
sf0.001 -> sf0.01 -> sf0.1 (100x data end to end): a scan/agg/join plan
in good shape grows sublinearly at these sizes (fixed per-query overhead
dominates), and anything super-linear is a red flag worth a plan audit.

Usage: python tools/scale_probe.py [runs_per_point]
Prints one markdown table + one JSON line.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]

PROBE = [
    "tpch_q1_pricing_summary",     # scan + wide aggregate
    "tpch_q5_local_supplier_volume",  # multi-join + agg
    "dedup_minhash_lsh",           # shingle -> minhash -> banded join
    "dedup_jaccard_pairs",         # prefix-filtered set-similarity join
    "sim_topk_bruteforce",         # vector scan + TakeOrdered
    "events_hourly_tumbling",      # event-time windowed agg
    "text_tfidf_top_terms",        # tokenize + idf join + rank
    "asof_latest_view_before_click",  # union-merge as-of join
    "window_rolling_median",       # partitioned window frame
    "ledger_overlap_pairs",        # theta self-join as equi+residual
    # round-4 additions
    "ml_logistic_regression_gd",   # iterative scaled-int gradient aggregate
    "text_pmi_collocations",       # bigram counts + TakeOrdered top-k
    "sketch_bitmap_distinct",      # mergeable bitmap-block distinct
    "timeseries_holt_linear",      # keyed agg + per-group array fold
    "embedding_silhouette_labels", # broadcast centroid stats, |labels| fan-out
    "dedup_minhash_jaccard_estimate",  # banded candidates + truth joins
]


def main() -> int:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 2

    from sample_data_pipeline_project_spark.engine import get_spark
    from sample_data_pipeline_project_spark.workloads import load_all

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    wl = load_all()

    # table + python-worker warmup at the smallest scale
    for name in PROBE[:2]:
        try:
            wl[name].fn(spark, SFS[0]).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception as e:  # pragma: no cover - best-effort warmup
            print(f"warmup {name}: {e}", file=sys.stderr)

    results: dict[str, list[float]] = {}
    for name in PROBE:
        per_sf = []
        for sf in SFS:
            ts = []
            for _ in range(runs):
                spark.catalog.clearCache()
                t0 = time.time()
                wl[name].fn(spark, sf).write.format("noop").mode(
                    "overwrite"
                ).save()
                ts.append(time.time() - t0)
            per_sf.append(sorted(ts)[len(ts) // 2])
        results[name] = per_sf

    print("| workload | sf0.001 (s) | sf0.01 (s) | sf0.1 (s) | t(100x)/t(1x) |")
    print("|---|---|---|---|---|")
    for name, (a, b, c) in results.items():
        print(f"| {name} | {a:.2f} | {b:.2f} | {c:.2f} | {c / a:.1f}x |")
    print(
        json.dumps(
            {
                "metric": "scale_probe",
                "sfs": [0.001, 0.01, 0.1],
                "runs": runs,
                "medians": {k: [round(x, 3) for x in v] for k, v in results.items()},
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
