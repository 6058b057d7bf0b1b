"""Versioned snapshot table — a minimal, metastore-free slice of the
lakehouse contract (Delta/Iceberg's time-travel surface) built on the
same atomic-swap discipline the streaming sink proved:

* every commit writes a NEW immutable snapshot directory
  (``v{n:08d}/``) and then publishes it by atomically renaming a
  one-line pointer file into ``_latest`` — readers never see a
  half-written snapshot, writers never mutate a published one;
* reads resolve ``_latest`` (or an explicit ``version=``) to a
  snapshot dir — time travel is just reading an older pointer target,
  and the data files themselves are plain parquet any engine can scan;
* ``rollback`` republishes an older version as a NEW commit (history
  is append-only — the bad version stays inspectable, exactly like
  ``RESTORE TABLE`` in Delta);
* ``vacuum`` deletes snapshot dirs older than a retention count,
  never touching the published chain's tail.

Scale notes: commits are O(written data) + one rename; reads are
pointer-resolution + a plain parquet scan (partition pruning and
pushdown intact, since each snapshot is an ordinary parquet dir).
What this deliberately does NOT implement: file-level deltas (each
commit is a full snapshot — the right trade for harness-sized
reference tables and periodic full republishes; incremental row-level
commits belong to the foreachBatch upsert sink, whose target can be a
committed snapshot), concurrent multi-writer arbitration (single
pipeline-owner assumption; Delta needs a log store for this), and
schema enforcement beyond parquet's own.

Reference parity note: the reference workload republishes its cleaned
dataset wholesale each run (``flights_unificado_limpio.csv``); this
module gives that publish step versioned, atomically-switched,
rollback-able semantics.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession

LATEST = "_latest"


def _version_dir(table: str, version: int) -> str:
    return os.path.join(table, f"v{version:08d}")


def _read_pointer(table: str) -> int | None:
    p = os.path.join(table, LATEST)
    if not os.path.exists(p):
        return None
    with open(p) as fh:
        return int(fh.read().strip())


def _publish_pointer(table: str, version: int) -> None:
    """Atomically repoint ``_latest``: write a temp file in the same
    directory, then ``os.rename`` over the pointer — POSIX renames
    within a filesystem are atomic, so a concurrent reader sees the
    old version or the new one, never a torn pointer."""
    fd, tmp = tempfile.mkstemp(dir=table, prefix="._latest_")
    try:
        with os.fdopen(fd, "w") as fh:
            fh.write(str(version))
            # fsync before rename: on delayed-allocation filesystems
            # the rename metadata can reach disk before the data
            # blocks, and a crash then publishes a ZERO-LENGTH
            # pointer — the torn state this module promises away.
            fh.flush()
            os.fsync(fh.fileno())
        os.rename(tmp, os.path.join(table, LATEST))
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
    # Every publish mutates the table tree: drop the fingerprint TTL
    # memo for any corpus containing it, so a memoized artifact can
    # never be served across this write (r10 ADVICE — the TTL window
    # must not span a rewrite).
    from prueba_tecnica_analista_etl_spark.artifacts import (
        invalidate_corpus,
    )

    invalidate_corpus(table)


def list_versions(table: str) -> list[int]:
    """All snapshot versions on disk, ascending (including any not yet
    or no longer published — history is inspectable)."""
    if not os.path.isdir(table):
        return []
    out = []
    for n in os.listdir(table):
        if n.startswith("v") and n[1:].isdigit():
            out.append(int(n[1:]))
    return sorted(out)


def current_version(table: str) -> int | None:
    """The published version, or None for an empty/uninitialized
    table."""
    return _read_pointer(table)


def commit_snapshot(df: DataFrame, table: str) -> int:
    """Write ``df`` as the next snapshot version and publish it.
    Returns the committed version number.

    Crash safety: the snapshot writes under a ``._tmp`` name and
    renames into its ``v{n}`` slot before the pointer moves, so every
    failure mode leaves either the old published version (pointer
    untouched) or a stray unpublished dir (cleaned by the next commit
    attempt) — never a published half-snapshot.
    """
    os.makedirs(table, exist_ok=True)
    cur = _read_pointer(table)
    version = (
        max([cur if cur is not None else -1] + list_versions(table)) + 1
    )
    final = _version_dir(table, version)
    tmp = final + "._tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(final, ignore_errors=True)  # stray unpublished dir
    df.write.parquet(tmp)
    os.rename(tmp, final)
    _publish_pointer(table, version)
    return version


def read_snapshot(
    spark: SparkSession, table: str, version: int | None = None
) -> DataFrame:
    """Read the published snapshot (default) or time-travel to an
    explicit ``version``. Raises ``FileNotFoundError`` for an empty
    table or a vacuumed/never-written version."""
    v = _read_pointer(table) if version is None else version
    if v is None:
        raise FileNotFoundError(f"{table}: no published version")
    d = _version_dir(table, v)
    if not os.path.isdir(d):
        raise FileNotFoundError(f"{table}: version {v} not on disk")
    return spark.read.parquet(d)


def rollback(table: str, version: int) -> int:
    """Republish ``version``'s DATA as a NEW commit (append-only
    history, like Delta RESTORE): the bad head stays on disk for
    inspection, and readers atomically switch to the restored data.
    Implemented as a directory hard-copy into the next version slot —
    snapshot dirs are immutable once published, so sharing would also
    be sound, but a copy keeps ``vacuum`` trivially correct. Returns
    the new version number."""
    src = _version_dir(table, version)
    if not os.path.isdir(src):
        raise FileNotFoundError(f"{table}: version {version} not on disk")
    new_version = max(list_versions(table)) + 1
    final = _version_dir(table, new_version)
    tmp = final + "._tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.copytree(src, tmp)
    os.rename(tmp, final)
    _publish_pointer(table, new_version)
    return new_version


def vacuum(table: str, keep: int = 2) -> list[int]:
    """Delete snapshot dirs beyond the newest ``keep`` versions,
    never the published one. Returns the versions removed. ``keep``
    bounds time-travel depth the way Delta's retention window does —
    the storage/recovery trade is the caller's to pick."""
    if keep < 1:
        raise ValueError("keep must be >= 1")
    versions = list_versions(table)
    published = _read_pointer(table)
    removable = [v for v in versions[:-keep] if v != published]
    removed = []
    for v in removable:
        d = _version_dir(table, v)
        shutil.rmtree(d, ignore_errors=True)
        # report a version removed only if its dir is actually GONE:
        # a partially-failed rmtree (EACCES mid-tree, NFS
        # silly-rename) must not claim success while a torn,
        # silently-readable snapshot survives on disk.
        if not os.path.isdir(d):
            removed.append(v)
    if removed:
        from prueba_tecnica_analista_etl_spark.artifacts import (
            invalidate_corpus,
        )

        invalidate_corpus(table)
    return removed
