"""Explicit schemas.

The reference never declares a schema — the ledger table's shape is implied
by the column names its SQL touches (SURVEY.md §1, evidence:
overlap_checks.py:52-60, snowflake_tasks.py:95,173-178,386-405,530-549).
Here the schema is declared once, explicitly, and used for schema-on-read
over Parquet so malformed inputs fail at the boundary instead of deep in a
query.
"""

from __future__ import annotations

from pyspark.sql import types as T

# Ledger statuses (reference: snowflake_tasks.py:95,158 docstring domain).
PIPELINE_STATUSES = ("pending", "in_progress", "completed", "failed")

# The pipeline-run ledger (SURVEY.md §1). `run_id` is ours: a deterministic
# tiebreak the reference lacks (its ORDER BY ts LIMIT 1 is nondeterministic
# on ties — SURVEY.md §7 hard parts).
PIPELINE_RUNS_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.LongType(), False),
        T.StructField("pipeline_name", T.StringType(), False),
        T.StructField("index_name", T.StringType(), False),
        T.StructField("pipeline_status", T.StringType(), False),
        T.StructField("query_window_start_ts", T.TimestampNTZType(), False),
        T.StructField("query_window_end_ts", T.TimestampNTZType(), False),
        T.StructField("query_window_start_day", T.DateType(), False),
        T.StructField("query_window_end_day", T.DateType(), False),
    ]
)

# Driver testdata tables (TESTDATA.md / FIXTURES.md §2). Timestamps are
# parquet-NTZ; `events.ts` is TIMESTAMP(NANOS) and is normalized to
# TIMESTAMP_NTZ by the catalog loader (functions/timeops.py).
TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
