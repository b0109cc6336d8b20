"""Versioned snapshot tables with time travel.

A minimal snapshot-log table format (the Iceberg/Delta idea reduced to
its core): every write is a NEW immutable snapshot directory
``path/v=N``; readers pin a version (time travel) or take the latest.
Written data is never mutated, so concurrent readers of version N are
unaffected by later writes — the property that makes reproducible
training runs possible ("the corpus as of snapshot 3").

Scale shape: a snapshot is a plain parquet directory — all partition/
pushdown behavior of the engine's parquet path applies unchanged; the
only metadata is the version directory name, listed once at read
planning time (no manifest server, no driver state).  Writes go
through a staging directory and a FINAL atomic rename, so a crashed
writer never publishes a half-written version and ``versions()`` never
lists one.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession


def _vdir(path: str, version: int) -> str:
    return os.path.join(path, f"v={version:06d}")


def versions(path: str) -> list[int]:
    """Published (fully committed) snapshot versions, ascending."""
    if not os.path.isdir(path):
        return []
    out = []
    for name in os.listdir(path):
        if name.startswith("v=") and ".staging" not in name:
            try:
                out.append(int(name[2:]))
            except ValueError:
                continue
    return sorted(out)


def write_snapshot(df: DataFrame, path: str) -> int:
    """Append a new immutable snapshot; returns its version number.

    The parquet write lands in ``v=N.staging`` and is published with
    one atomic rename — a reader can never observe a partial snapshot.

    Concurrent WRITERS race on the version claim (list-then-rename is
    not atomic): when two writers compute the same next version, the
    loser's rename finds the target already published and retries the
    publish under the next free number — both snapshots land, with
    distinct versions.  The staging directory is UNIQUE PER WRITER
    (pid + random suffix), so racing writers can never overwrite each
    other's in-flight parquet job; the retry renames this writer's own
    fully-written staging directory, so the parquet job runs once per
    writer and a published version is always one writer's complete
    output.  (A KILLED writer can leave its staging directory behind;
    ``versions()`` never lists staging paths, so readers are
    unaffected — reclaim the space with ``vacuum_staging``.  A writer
    that FAILS in-process removes its own staging before re-raising.)
    On filesystems whose rename does not fail on an existing non-empty
    target, prefer a single writer per table path.
    """
    os.makedirs(path, exist_ok=True)
    ver = (versions(path)[-1] + 1) if versions(path) else 1
    final = _vdir(path, ver)
    staging = f"{final}.staging.{os.getpid()}-{uuid.uuid4().hex}"
    published = False
    try:
        df.write.mode("overwrite").parquet(staging)
        while True:
            try:
                os.rename(staging, final)
                published = True
                return ver
            except OSError:
                if not os.path.exists(final):  # not a lost race — re-raise
                    raise
                ver += 1
                final = _vdir(path, ver)
    finally:
        # a failed write/publish must not leak a snapshot-sized staging
        # directory (only SIGKILL-class crashes can — see vacuum_staging)
        if not published and os.path.isdir(staging):
            import shutil

            shutil.rmtree(staging, ignore_errors=True)


def vacuum_staging(path: str, min_age_sec: float = 24 * 3600.0) -> list[str]:
    """Remove orphaned staging directories left by KILLED writers.

    Every crashed-writer staging dir is a full snapshot's worth of
    parquet; nothing else ever deletes them (``write_snapshot`` cleans
    up in-process failures, but a SIGKILL/OOM leaves the directory).
    Only directories older than ``min_age_sec`` (by mtime, default 24 h)
    are removed so an in-flight writer's staging is never pulled out
    from under it.  Returns the removed paths.
    """
    import shutil
    import time

    if not os.path.isdir(path):
        return []
    removed = []
    now = time.time()
    for name in os.listdir(path):
        if not (name.startswith("v=") and ".staging" in name):
            continue
        full = os.path.join(path, name)
        try:
            if now - os.path.getmtime(full) < min_age_sec:
                continue
            shutil.rmtree(full)
            removed.append(full)
        except OSError:
            continue
    return removed


def read_snapshot(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Read one snapshot: ``version=None`` pins the latest published
    one at PLANNING time (the frame stays stable even if later
    snapshots land while it executes)."""
    vs = versions(path)
    if not vs:
        raise FileNotFoundError(f"no snapshots at {path}")
    if version is None:
        version = vs[-1]
    if version not in vs:
        raise FileNotFoundError(f"version {version} not in {vs} at {path}")
    return spark.read.parquet(_vdir(path, version))
