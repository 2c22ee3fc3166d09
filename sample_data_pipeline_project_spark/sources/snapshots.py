"""Manifest-based snapshot versioning over plain parquet (time travel).

A minimal lakehouse commit protocol, self-contained on any filesystem:
every write lands data files under an immutable `data/` pool and commits
by writing `manifest/v{N}.json` naming exactly the files that version
consists of. Readers resolve a manifest and load ONLY its files, so

  - old versions stay readable after any rewrite (time travel),
  - a reader never sees a half-written version (the manifest is the
    atomic commit point, written after the data),
  - storage is shared between versions: an append's manifest lists the
    previous files plus the new ones — nothing is copied.

This is the snapshot-isolation story the copy-on-write DML in
`sources/cow.py` lacks (it overwrites in place); at 100 TB the same
layout holds — manifests stay KB-sized lists of file paths while the
data pool grows, and cleaning obsolete versions is manifest diffing.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession


def _manifest_dir(path: str) -> str:
    return os.path.join(path, "manifest")


def _versions(path: str) -> list[int]:
    mdir = _manifest_dir(path)
    if not os.path.isdir(mdir):
        return []
    out = []
    for f in os.listdir(mdir):
        if f.startswith("v") and f.endswith(".json"):
            try:
                out.append(int(f[1:-5]))
            except ValueError:
                pass
    return sorted(out)


def latest_version(path: str) -> int | None:
    vs = _versions(path)
    return vs[-1] if vs else None


def _read_manifest(path: str, version: int) -> list[str]:
    with open(os.path.join(_manifest_dir(path), f"v{version}.json")) as fh:
        return json.load(fh)["files"]


def snapshot_write(
    df: DataFrame,
    path: str,
    mode: str = "append",
    extra: dict | None = None,
) -> int:
    """Commit `df` as a new version. mode='append' keeps the previous
    version's files and adds the new ones; mode='overwrite' starts the new
    version from only the new files (old versions remain readable either
    way — data files are never deleted here). `extra` metadata (e.g. a
    streaming batch id) is written INSIDE the committed manifest, so the
    manifest creation is the single atomic commit point — no second
    rewrite that a crash could separate from the commit.

    Concurrent writers are safe: the manifest is created via hard-link
    (exclusive — fails with FileExistsError instead of clobbering), and a
    loser of the race recomputes its version/file-list against the
    winner's manifest and retries. VACUUM (`expire_versions`) is
    single-writer: run it from one maintenance process, not concurrently
    with appends."""
    if mode not in ("append", "overwrite"):
        raise ValueError(f"unsupported mode {mode!r}")
    staging = os.path.join(path, "data", uuid.uuid4().hex[:12])
    df.write.mode("error").parquet(staging)
    new_files = sorted(
        os.path.join(staging, f)
        for f in os.listdir(staging)
        if f.endswith(".parquet")
    )
    os.makedirs(_manifest_dir(path), exist_ok=True)
    while True:
        prev = latest_version(path)
        files = list(new_files)
        if mode == "append" and prev is not None:
            files = _read_manifest(path, prev) + files
        version = 1 if prev is None else prev + 1
        manifest = {"version": version, "files": files}
        if extra:
            manifest.update(extra)
        tmp = os.path.join(
            _manifest_dir(path), f".v{version}.{uuid.uuid4().hex[:8]}.tmp"
        )
        with open(tmp, "w") as fh:
            json.dump(manifest, fh)
        final = os.path.join(_manifest_dir(path), f"v{version}.json")
        try:
            os.link(tmp, final)  # atomic exclusive create: no clobber
        except FileExistsError:
            os.unlink(tmp)
            continue  # lost the race — rebase on the winner's manifest
        os.unlink(tmp)
        return version


def snapshot_read(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Read a committed version (default: latest). Loads exactly the
    manifest's files — concurrent/later writes are invisible."""
    v = latest_version(path) if version is None else version
    if v is None or v not in _versions(path):
        raise ValueError(f"no version {version!r} at {path}")
    return spark.read.parquet(*_read_manifest(path, v))


def expire_versions(path: str, keep_last: int = 1) -> dict:
    """Retention / VACUUM: drop all but the newest `keep_last` version
    manifests, then delete every data file no surviving manifest
    references. Deleting manifests first makes the pass crash-safe: a
    data file is only ever removed AFTER nothing points at it, so an
    interrupted vacuum leaves a readable table (re-run to finish).
    Returns {versions_dropped, files_deleted, bytes_deleted}."""
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    vs = _versions(path)
    drop, keep = vs[:-keep_last], vs[-keep_last:]
    live: set[str] = set()
    for v in keep:
        live.update(_read_manifest(path, v))
    dead: set[str] = set()
    for v in drop:
        dead.update(f for f in _read_manifest(path, v) if f not in live)
    for v in drop:
        os.remove(os.path.join(_manifest_dir(path), f"v{v}.json"))
    n_bytes = 0
    for f in sorted(dead):
        if os.path.exists(f):
            n_bytes += os.path.getsize(f)
            os.remove(f)
    return {
        "versions_dropped": len(drop),
        "files_deleted": len(dead),
        "bytes_deleted": n_bytes,
    }
