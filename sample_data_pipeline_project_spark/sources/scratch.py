"""Per-process scratch directories for workloads that materialize
intermediate tables (format roundtrips, COW/CDC state, persisted
indexes, streaming checkpoints).

Two defects this module fixes (both found in round 3):
  - the inline `os.path.dirname(...)` x4 derivation in workload files
    resolved one level ABOVE the repo (workloads -> package -> repo ->
    parent), so scratch tables landed outside the repository tree;
  - a single shared directory per workload races across PROCESSES: the
    correctness gate, the test suite, and the bench may run concurrently,
    and one process's copy-on-write rewrite deletes parquet parts another
    process is mid-read on (FAILED_READ_FILE.FILE_NOT_EXIST).

`scratch_dir(name)` returns <repo>/spark-warehouse/<name>-<pid>: the
per-PID suffix makes concurrent gate processes disjoint by construction,
and the directory is recreated empty on every call so a workload always
starts from a clean slate. On a real cluster the analogous location is a
job-scoped path under the job's own warehouse/temp prefix.
"""

from __future__ import annotations

import os
import shutil
from pathlib import Path


def scratch_dir(name: str) -> str:
    """A clean, per-process scratch directory under the repo's
    spark-warehouse; removed and recreated on every call."""
    repo_root = Path(__file__).resolve().parents[2]
    p = repo_root / "spark-warehouse" / f"{name}-{os.getpid()}"
    shutil.rmtree(p, ignore_errors=True)
    p.parent.mkdir(parents=True, exist_ok=True)
    return str(p)
