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

def test_no_workload_emits_complex_typed_output(spark):
    """Driver-canon contract: the per-round correctness gate canonicalizes
    results with pandas sort_values/factorize, which throws
    `TypeError: unhashable type: 'list'` on any Array/Map/Struct cell
    (empirically: the r04 driver gate's one red row,
    features_hashing_trick, emitted array<bigint>). Every registered
    workload's FINAL schema must therefore be scalar-only — nested types
    are fine internally, but must be serialized (array_join / per-element
    columns) before return. Structural twin of the global-window and
    BNLJ-allowlist plan guards in test_plans.py."""
    from pyspark.sql import types as T

    offenders = []
    for name, w in sorted(load_all().items()):
        schema = w.fn(spark, _SF).schema
        for field in schema.fields:
            if isinstance(
                field.dataType, (T.ArrayType, T.MapType, T.StructType)
            ):
                offenders.append(f"{name}.{field.name}: {field.dataType}")
    assert not offenders, offenders
