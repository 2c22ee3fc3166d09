"""SparkSession lifecycle + engine configuration.

Replaces the reference's connection handling
(`snowflake_utils/snowflake_query_client.py:83-116`: lazy connect +
reuse-if-open) with the Spark-native equivalent: a process-wide
`SparkSession` built through `getOrCreate()`. Namespace switching
(`USE DATABASE` / `USE SCHEMA`, snowflake_query_client.py:151-152) maps to
`spark.catalog.setCurrentDatabase` / multipart names; here we expose a
helper for it.

Configuration is chosen for scale-out semantics even though tests run on
local[N]:
  - AQE on (runtime re-plan: shuffle coalescing, skew-join splitting,
    dynamic broadcast conversion),
  - UTC session timezone (stable timestamp semantics vs. any oracle),
  - Arrow for any toPandas/pandas-UDF edge,
  - shuffle partitions sized to the local core count rather than the
    200 default (at cluster scale this is overridden per-deploy).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEFAULTS = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    # Start every AQE shuffle WIDE and let coalescing shrink it: with a
    # flat 32, one decade of data growth put 22M-row sort/agg tasks on a
    # shared 8g heap and OOM'd (er_blocking_quality at sf10, round 7 —
    # 96M truth pairs through 32 fat tasks). At 256 initial partitions
    # the same workload completes in 196s: per-task memory is bounded by
    # partition width, and AQE's coalescer still collapses small stages
    # to ~32 tasks, so short queries pay nothing. This is the canonical
    # "size shuffle partitions to fit executor memory" knob, decided at
    # runtime per-stage instead of statically per-session.
    "spark.sql.adaptive.coalescePartitions.initialPartitionNum": "256",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # canChangeCachedPlanOutputPartitioning stays at its DEFAULT (false)
    # — round 12 reverted the round-11 "true". The round-11 rationale
    # (cache-population shuffles run 256 near-empty tasks) mistook
    # task-launch noise (milliseconds) for the cost; what the flag
    # actually did was let AQE coalesce the cached signature/pair/token
    # tables down to 1-3 partitions (they are KB-to-MB-sized inputs),
    # and every downstream stage that fans OUT of those caches — band
    # self-joins, prefix candidate joins, token-intersection joins,
    # whose outputs are millions of rows from tiny inputs — inherited
    # that near-serial layout. Same-session conf-only A/B at sf0.1
    # (BENCH-NOTES round 12, non-overlapping spreads): the 10-workload
    # cached-dedup family went 150.1 s (true) -> 36.2 s (false), with
    # dedup_minhash_jaccard_estimate alone 83.5 s -> 7.5 s (11.2x).
    # This also resolves the driver-measured r11 regression on
    # dedup_minhash_lsh (3.67 -> 1.69 s in the same A/B).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Keep planner stats honest on raw parquet dirs.
    "spark.sql.parquet.filterPushdown": "true",
    # local[N] runs single-JVM; cap UI/noise.
    "spark.ui.enabled": "false",
    "spark.sql.shuffle.partitions": str(os.cpu_count() or 8),
    # In local mode the driver JVM IS the executor. Spark's 1g default
    # heap GC-thrashes a multi-query session (cached signature tables,
    # broadcasts, Arrow batches) — but BIGGER IS NOT BETTER: measured on
    # the full 64-workload bench at sf0.1, a 32g heap produced 30-90s
    # random stalls (full-GC pauses over a mostly-garbage heap) for a
    # 682s total, while 8g ran the same bench in 116s. Applied only at
    # JVM launch — getOrCreate on a live session ignores it, so set from
    # the first session of the process.
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
}

# Streaming state-store backend. The default (HDFS-backed) provider keeps
# every key's state as JVM objects on-heap — at 1M+ distinct keys
# (stream_debounce at sf10) the store itself becomes the dominant cost
# and competes with shuffles for the unified heap. RocksDB
# (rocksdbjni ships with Spark) keeps state off-heap with an on-disk
# spill path, which is the documented deployment answer for
# high-key-cardinality stateful queries. Opt-in knob, measured in
# SCALING.md before being made a default anywhere:
#   SPARK_GRAFT_STATESTORE=rocksdb
_ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider"
)


def _cpus() -> int:
    env = os.environ.get("SPARK_GRAFT_CPUS")
    if env:
        try:
            return max(1, int(env))
        except ValueError:
            pass
    return os.cpu_count() or 8


def get_spark(
    app_name: str = "sample_data_pipeline_project_spark",
    master: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Get-or-create the engine session (reference A28: connection reuse)."""
    builder = SparkSession.builder.appName(app_name)
    builder = builder.master(master or f"local[{_cpus()}]")
    conf = dict(_DEFAULTS)
    if extra_conf:
        conf.update(extra_conf)
    if os.environ.get("SPARK_GRAFT_STATESTORE", "").lower() == "rocksdb":
        conf["spark.sql.streaming.stateStore.providerClass"] = (
            _ROCKSDB_PROVIDER
        )
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    if os.environ.get("SPARK_GRAFT_STATESTORE", "").lower() == "rocksdb":
        # getOrCreate ignores builder conf on a live session; the provider
        # is a runtime SQL conf read at stream START, so re-apply it here
        # to cover the shared-session (pytest) path too.
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass", _ROCKSDB_PROVIDER
        )
    # Hygiene: reap warehouse scratch left by DEAD processes (per-pid
    # scratch dirs and pid-scoped bucketed tables — see
    # sources/scratch.py:reap_dead_scratch). Safe on a live session:
    # only entries whose pid no longer exists are touched.
    try:
        from sample_data_pipeline_project_spark.sources.scratch import (
            reap_dead_scratch,
        )

        reap_dead_scratch()
    except Exception:
        pass
    return spark


def stop_spark() -> None:
    """Tear down the active session (tests / process exit)."""
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()


def use_namespace(spark: SparkSession, database: str, schema: str | None = None) -> None:
    """Spark-native `USE DATABASE`/`USE SCHEMA`
    (reference: snowflake_query_client.py:151-152, A27).

    Spark's catalog has a single namespace level per catalog; we map the
    reference's (database, schema) pair onto `database_schema` when both
    are given.
    """
    ns = f"{database}_{schema}" if schema else database
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {ns}")
    spark.catalog.setCurrentDatabase(ns)
