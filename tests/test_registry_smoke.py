"""Registry-wide smoke: every workload must EXECUTE at sf0.001 under a
terminal count() — the harshest Catalyst column-pruning context (a
count() over an applyInPandas output prunes the UDF inputs to zero
columns, which is exactly how the cogroup pruning bug escaped the
collect()-based oracle gate)."""

from __future__ import annotations

from sample_data_pipeline_project_spark.workloads import load_all

_SF = "/root/testdata/sf0.001"


def test_every_workload_runs_under_terminal_count(spark):
    failures = []
    for name, w in sorted(load_all().items()):
        try:
            n = w.fn(spark, _SF).count()
            if n < 0:
                failures.append(f"{name}: negative count")
        except Exception as exc:  # noqa: BLE001 - collect all failures
            failures.append(f"{name}: {type(exc).__name__}: {exc}")
    assert not failures, failures[:3]
