"""Measure t(sf1)/t(sf0.1) growth slopes for the heaviest operator
families — the one decade of scale ABOVE the per-round bench point.

Prerequisite: `python tools/make_scaled_data.py` (builds the 10x
.scaledata/sf1 tables; see that tool's docstring for how the replication
preserves each family's structural ratios).

Interpretation: 10x the data through a plan that scales linearly costs
<=10x the time; at local[32] with fixed per-query overhead (session,
planning, state-store bootstrap) healthy slopes land well UNDER 10x.
A slope meaningfully ABOVE 10x means super-linear work (quadratic
candidate growth, per-round lineage blowup) and fails the probe.

Usage: python tools/scale_slopes.py [runs_per_point] [workload ...]
(workload names optional — default is the PROBE list below. The two
scale points default to sf0.1 -> sf1 and can be overridden with
SPARK_GRAFT_SLOPE_A / SPARK_GRAFT_SLOPE_B, e.g. the second-decade
sf1 -> sf10 probe of the LSH families.)
Prints one markdown table + one JSON line (consumed into SCALING.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

SF01 = os.environ.get("SPARK_GRAFT_SLOPE_A", "/root/testdata/sf0.1")
SF1 = os.environ.get("SPARK_GRAFT_SLOPE_B", "/root/repo/.scaledata/sf1")

# The 12 heaviest families by bench cost and 100 TB risk profile.
PROBE = [
    # banded / filtered set-similarity joins (candidate growth is THE risk)
    "dedup_minhash_lsh",
    "dedup_jaccard_pairs",
    "dedup_containment_pairs",
    "dedup_minhash_jaccard_estimate",
    # iterative lineage-heavy graph ops
    "dedup_connected_components",
    "graph_pagerank_neardup",
    # ANN build + probe
    "sim_topk_bruteforce",
    "sim_ivf_index_topk",
    "sim_ivfpq_topk",
    # streaming state twins (state-store scaling in key count)
    "stream_minhash_dedup",
    "stream_exact_dedup",
    "stream_hourly_tumbling",
    # scan/agg + fact-fact join reference slopes
    "tpch_q1_pricing_summary",
    "join_bigbig_orders_lineitem",
]


def main() -> int:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    probe = sys.argv[2:] or PROBE

    from sample_data_pipeline_project_spark.engine import get_spark
    from sample_data_pipeline_project_spark.workloads import load_all

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    wl = load_all()

    # warm the JVM/python workers once per scale dir; fall back to the
    # first probed workload on table-subset dirs (e.g. the sf10
    # documents-only decade has no lineitem for tpch_q1)
    for sf in (SF01, SF1):
        for warm_name in ("tpch_q1_pricing_summary", probe[0]):
            try:
                wl[warm_name].fn(spark, sf).write.format("noop").mode(
                    "overwrite"
                ).save()
                break
            except Exception as exc:  # noqa: BLE001
                print(f"warmup {warm_name} @ {sf} skipped: {exc}",
                      file=sys.stderr)
        spark.catalog.clearCache()

    results: dict[str, list[float]] = {}
    for name in probe:
        per_sf = []
        for sf in (SF01, SF1):
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
        print(
            f"probe {name}: sf0.1 {per_sf[0]:.2f}s sf1 {per_sf[1]:.2f}s "
            f"slope {per_sf[1] / per_sf[0]:.1f}x",
            flush=True,
        )

    print("\n| workload | sf0.1 (s) | sf1 (s) | slope (10x data) |")
    print("|---|---|---|---|")
    for name, (a, b) in results.items():
        print(f"| {name} | {a:.2f} | {b:.2f} | {b / a:.1f}x |")
    print(
        json.dumps(
            {
                "metric": "scale_slopes",
                "sfs": [0.1, 1.0],
                "runs": runs,
                "medians": {k: [round(x, 3) for x in v] for k, v in results.items()},
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
