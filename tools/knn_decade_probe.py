"""Single-shot decade probe for graph_knn_mutual_edges_ivf.

Why not tools/scale_slopes.py: its warmup protocol executes the probed
workload once per scale before timing it — two full sf100 executions in
ONE JVM. Spark frees shuffle files only when the ContextCleaner GC's
their references, so the warmup's ~40 GB of candidate-pair spill is
still on disk while the timed run writes its own ~40 GB: the round-9
probe found the node's disk (not memory, not compute) is the binding
constraint at 2M vectors. Protocol here: ONE execution per process
(cold JVM), spill dirs under a cleaned scratch root — the slope is
cold/cold so fixed session overhead appears at BOTH points.

Usage: python tools/knn_decade_probe.py <sf_dir>
Prints one JSON line {"sf_dir": ..., "seconds": ..., "n_rows": ...}.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> int:
    sf_dir = sys.argv[1]

    from sample_data_pipeline_project_spark.engine import get_spark
    from sample_data_pipeline_project_spark.workloads import load_all

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    wl = load_all()["graph_knn_mutual_edges_ivf"]
    t0 = time.time()
    df = wl.fn(spark, sf_dir)
    rows = df.count()
    dt = time.time() - t0
    print(json.dumps({"sf_dir": sf_dir, "seconds": round(dt, 2), "n_rows": rows}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
