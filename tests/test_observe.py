"""Pipeline telemetry via df.observe: named metrics collected during the
SAME execution that produces results (no second scan) — the Spark-native
form of the reference's per-query logging envelope (LogBlock row counts,
log_utils.py), and the standard way a 100 TB job reports data-quality
counters without an extra pass."""

from __future__ import annotations

from pyspark.sql import Observation
from pyspark.sql import functions as F

from sample_data_pipeline_project_spark.sources.catalog import load_table


def test_observe_quality_metrics_single_pass(spark):
    obs = Observation("quality")
    d = load_table(spark, "/root/testdata/sf0.01", "documents").observe(
        obs,
        F.count(F.lit(1)).alias("rows_seen"),
        F.sum(F.when(F.length("text") < 10, 1).otherwise(0)).alias("too_short"),
        F.sum(F.when(F.col("lang").isNull(), 1).otherwise(0)).alias("null_lang"),
    )
    out = d.filter(F.col("lang") == "en").count()
    m = obs.get
    assert m["rows_seen"] == 500
    assert m["null_lang"] == 0
    assert 0 <= m["too_short"] < 500
    assert out <= m["rows_seen"]
