"""Time a SUBSET of registered workloads — the A/B adjudication tool.

bench.py times all 350 workloads (~5-6 min at sf0.1); adjudicating a
handful of movers against their committed spreads doesn't need that.
This runs the same protocol as bench.py (table warm-up, noop sink,
cache clear between runs, 1 warm-up + median of N timed runs) on just
the named queries and prints one JSON object with per-query
[min, median, max] spreads — directly comparable to the `spread` map
in BENCH_DETAIL.json.

Usage:
  python tools/bench_subset.py q1 q2 ...        # sf via SPARK_GRAFT_SF_DIR
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_BENCH_RUNS (default 3), SPARK_GRAFT_BENCH_WARMUP (1),
     SPARK_GRAFT_EXTRA_CONF ("k=v;k=v" session conf overrides — the
     config-A/B knob, so flag comparisons run from identical code).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    names = sys.argv[1:]
    if not names:
        print("usage: bench_subset.py <workload> [...]", file=sys.stderr)
        return 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from sample_data_pipeline_project_spark.engine import get_spark
    from sample_data_pipeline_project_spark.sources.catalog import load_table
    from sample_data_pipeline_project_spark.workloads import load_all

    extra = {}
    for kv in os.environ.get("SPARK_GRAFT_EXTRA_CONF", "").split(";"):
        if "=" in kv:
            k, _, v = kv.partition("=")
            extra[k.strip()] = v.strip()
    spark = get_spark(app_name="bench_subset", extra_conf=extra or None)
    spark.sparkContext.setLogLevel("ERROR")
    workloads = load_all()
    missing = [n for n in names if n not in workloads]
    if missing:
        print(f"unknown workloads: {missing}", file=sys.stderr)
        return 2

    for table in (
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ):
        try:
            load_table(spark, sf_dir, table).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception:
            pass

    n_warmup = int(os.environ.get("SPARK_GRAFT_BENCH_WARMUP", "1"))
    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))

    def run_once(w) -> float:
        t0 = time.perf_counter()
        w.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        elapsed = time.perf_counter() - t0
        spark.catalog.clearCache()
        return elapsed

    spreads: dict[str, list[float]] = {}
    for name in names:
        w = workloads[name]
        for _ in range(n_warmup):
            run_once(w)
        samples = [run_once(w) for _ in range(n_runs)]
        med = round(statistics.median(samples), 3)
        spreads[name] = [round(min(samples), 3), med, round(max(samples), 3)]
        print(f"bench_subset: {name} {med}s "
              f"[{spreads[name][0]}..{spreads[name][2]}]", file=sys.stderr)

    print(json.dumps({"sf_dir": sf_dir, "runs": n_runs, "spread": spreads}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
