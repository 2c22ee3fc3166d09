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


def _pid_alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:
        return True
    return True


def reap_dead_scratch() -> list[str]:
    """Delete warehouse entries left behind by DEAD processes.

    Every per-process artifact this package writes under spark-warehouse
    carries a trailing ``-<pid>`` (scratch_dir) or is a ``bkt_*_<pid>``
    saveAsTable name (C223). A process cannot always clean up after
    itself — C223's returned DataFrame lazily reads its bucketed tables,
    so dropping them in a `finally` would break the caller — so instead
    each new session (and C223 itself at entry) reaps entries whose pid
    no longer exists. The liveness check keeps a CONCURRENT
    gate/bench/test process's tables intact; a recycled pid merely
    defers that entry to a later reap.

    The match is restricted to exactly those two conventions: a broad
    ``[-_](\\d+)$`` would also capture PERSISTENT shared tables whose
    name ends in digits (e.g. ``orders_bucketed_sf0_25`` parses as
    pid 25), and would delete them out from under a concurrent reader
    whenever that number happens not to be a live pid.
    """
    import re

    repo_root = Path(__file__).resolve().parents[2]
    wh = repo_root / "spark-warehouse"
    reaped: list[str] = []
    if not wh.is_dir():
        return reaped
    for child in wh.iterdir():
        m = re.search(r"-(\d+)$", child.name) or re.match(
            r"^bkt_.*_(\d+)$", child.name
        )
        if not m:
            continue
        pid = int(m.group(1))
        if pid == os.getpid() or _pid_alive(pid):
            continue
        shutil.rmtree(child, ignore_errors=True)
        reaped.append(child.name)
    return reaped
