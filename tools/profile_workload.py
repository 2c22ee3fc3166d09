"""Per-stage profile of one or more registered workloads (guide §1).

Runs each named workload through the bench protocol (table warmup, noop
sink, cache clear, one untimed warmup + one timed run) with the Spark
event log on, then attributes the timed run's wall to stages: per stage
its duration, task count, summed task time, max task, shuffle read/write
bytes, and the callsite line (the `Stage Name` the DAGScheduler records),
so "where does the time go" is answered by operator/source line instead
of guesswork.

Usage:
  python tools/profile_workload.py <workload> [...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1).

Prints one JSON object per workload:
  {"workload", "warm_sec", "timed_sec", "stages": [...top 12 by task_sec_sum]}
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _stage_table(event_dir: str, t_start_ms: float, t_end_ms: float) -> list[dict]:
    """Stage rows overlapping [t_start_ms, t_end_ms] from the event log."""
    stages: dict[tuple[int, int], dict] = {}
    for path in glob.glob(os.path.join(event_dir, "**", "*"), recursive=True):
        if os.path.isdir(path):
            continue
        with open(path, errors="replace") as fh:
            for line in fh:
                if '"SparkListenerStageCompleted"' in line:
                    try:
                        info = json.loads(line)["Stage Info"]
                    except (json.JSONDecodeError, KeyError):
                        continue
                    sub = info.get("Submission Time")
                    done = info.get("Completion Time")
                    if sub is None or done is None or done < t_start_ms or sub > t_end_ms:
                        continue
                    key = (info["Stage ID"], info.get("Stage Attempt ID", 0))
                    st = stages.setdefault(key, {
                        "stage": info["Stage ID"],
                        "name": info.get("Stage Name", "")[:120],
                        "wall_sec": 0.0, "n_tasks": 0,
                        "task_sec_sum": 0.0, "max_task_sec": 0.0,
                        "shuffle_read_mb": 0.0, "shuffle_write_mb": 0.0,
                        "input_mb": 0.0,
                    })
                    st["wall_sec"] = round((done - sub) / 1000.0, 2)
                elif '"SparkListenerTaskEnd"' in line:
                    try:
                        ev = json.loads(line)
                    except json.JSONDecodeError:
                        continue
                    tinfo = ev.get("Task Info", {})
                    lt = tinfo.get("Launch Time", 0)
                    if lt < t_start_ms or lt > t_end_ms:
                        continue
                    key = (ev.get("Stage ID"), ev.get("Stage Attempt ID", 0))
                    st = stages.setdefault(key, {
                        "stage": ev.get("Stage ID"), "name": "",
                        "wall_sec": 0.0, "n_tasks": 0,
                        "task_sec_sum": 0.0, "max_task_sec": 0.0,
                        "shuffle_read_mb": 0.0, "shuffle_write_mb": 0.0,
                        "input_mb": 0.0,
                    })
                    dur = (tinfo.get("Finish Time", 0) - lt) / 1000.0
                    st["n_tasks"] += 1
                    st["task_sec_sum"] += dur
                    st["max_task_sec"] = max(st["max_task_sec"], dur)
                    m = ev.get("Task Metrics") or {}
                    srm = m.get("Shuffle Read Metrics") or {}
                    swm = m.get("Shuffle Write Metrics") or {}
                    im = m.get("Input Metrics") or {}
                    st["shuffle_read_mb"] += (
                        srm.get("Remote Bytes Read", 0) + srm.get("Local Bytes Read", 0)
                    ) / 1e6
                    st["shuffle_write_mb"] += swm.get("Shuffle Bytes Written", 0) / 1e6
                    st["input_mb"] += im.get("Bytes Read", 0) / 1e6
    rows = sorted(stages.values(), key=lambda s: -s["task_sec_sum"])
    for s in rows:
        for k in ("task_sec_sum", "max_task_sec", "shuffle_read_mb",
                  "shuffle_write_mb", "input_mb"):
            s[k] = round(s[k], 2)
    return rows


def main() -> int:
    names = sys.argv[1:]
    if not names:
        print("usage: profile_workload.py <workload> [...]", file=sys.stderr)
        return 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from sample_data_pipeline_project_spark.engine import get_spark
    from sample_data_pipeline_project_spark.sources.catalog import load_table
    from sample_data_pipeline_project_spark.workloads import load_all

    event_dir = tempfile.mkdtemp(prefix="profile_events_")
    spark = get_spark(
        app_name="profile_workload",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": event_dir,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    workloads = load_all()
    missing = [n for n in names if n not in workloads]
    if missing:
        print(f"unknown workloads: {missing}", file=sys.stderr)
        return 2

    for table in ("region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem", "events", "documents", "embeddings"):
        try:
            load_table(spark, sf_dir, table).write.format("noop").mode(
                "overwrite").save()
        except Exception:
            pass

    results = []
    for name in names:
        w = workloads[name]
        t0 = time.time()
        w.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        warm = time.time() - t0
        spark.catalog.clearCache()
        t_start = time.time()
        w.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        t_end = time.time()
        spark.catalog.clearCache()
        results.append({
            "workload": name,
            "warm_sec": round(warm, 2),
            "timed_sec": round(t_end - t_start, 2),
            "window": (t_start * 1000.0, t_end * 1000.0),
        })
    spark.stop()  # flush the event log before parsing

    for r in results:
        t0ms, t1ms = r.pop("window")
        r["stages"] = _stage_table(event_dir, t0ms, t1ms)[:12]
        print(json.dumps(r))
    shutil.rmtree(event_dir, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
