"""Snapshot backup / restore: a portable, self-verifying table copy.

A snapshot manifest is self-describing (schema, base/delta/offsets file
lists, summary), so a backup is simply *the manifest plus exactly the
files it references*, laid out as a valid table directory:

- :func:`export_snapshot` — copy one pinned version's files (relative
  paths preserved) plus its manifest and a ``VERSION`` pointer into
  ``dest``.  The export is version-pinned the same way reads are: a
  writer landing epochs mid-export cannot tear it, because the manifest
  never mutates and its files are immutable until snapshot expiry.
  Missing referenced files fail loud at export time (bitrot found at
  backup, not at restore).
- :func:`restore_snapshot` — materialize a live table from a backup.
  The exactly-once bookkeeping (offsets log → epoch/lsn watermark)
  rides along, so ingest RESUMES from the backup point: replaying the
  original log converges the restored table with the primary, applied
  epochs skipped idempotently.
- A backup needs no import step to be read: it IS a table directory —
  ``ParquetTranscriptTable.load(spark, dest)`` opens it in place
  (read-only verification is one ``state_digest`` away, and
  :mod:`~aqueduct_core_spark.operators.antientropy` can diff it
  against the live primary).

File movement is driver-side ``shutil`` here (filesystem catalog); on
an object store the same manifest-driven file list feeds a bulk-copy
job — the contract (copy exactly the referenced objects, then the
manifest, then the pointer) is storage-agnostic.  History is
intentionally not exported: the backup has a single version (time
travel to pre-backup versions raises, like any expired snapshot).
"""

from __future__ import annotations

import json
import os
import shutil

from aqueduct_core_spark.catalog.table import ParquetTranscriptTable


def _fsync_path(path: str) -> None:
    """fsync a file or directory by path (directory fsync persists the
    entries — required before the pointer publish can claim them)."""
    fd = os.open(path, os.O_RDONLY)
    try:
        os.fsync(fd)
    finally:
        os.close(fd)


def _referenced_files(snap: dict) -> list[str]:
    rels: list[str] = []
    for fl in snap.get("files", {}).values():
        rels.extend(fl)
    for fl in snap.get("delta_files", {}).values():
        rels.extend(fl)
    rels.extend(snap.get("offsets_files", []))
    return rels


def export_snapshot(
    table: ParquetTranscriptTable, dest: str, version: int | None = None
) -> dict:
    """Copy the pinned snapshot into ``dest`` as a standalone table
    directory.  Returns ``{version, files, bytes}``."""
    cat = table.catalog
    v = cat.current_version() if version is None else int(version)
    snap = cat.load(v)
    if os.path.exists(os.path.join(dest, "VERSION")):
        raise ValueError(f"{dest} already holds a table/backup")
    rels = _referenced_files(snap)
    missing = [r for r in rels if not os.path.exists(os.path.join(table.root, r))]
    if missing:
        raise FileNotFoundError(
            f"backup aborted: {len(missing)} referenced file(s) missing from "
            f"the source table, e.g. {missing[:3]} — source is corrupt or "
            f"snapshot v{v} was expired mid-export"
        )
    total = 0
    dirs_made: set[str] = set()
    for r in rels:
        src = os.path.join(table.root, r)
        dst = os.path.join(dest, r)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        dirs_made.add(os.path.dirname(dst))
        shutil.copy2(src, dst)
        _fsync_path(dst)  # data durable BEFORE the pointer can exist
        total += os.path.getsize(src)
    # manifest last, pointer very last — a torn export is unreadable
    # (no VERSION), never wrong.  Every stage is fsynced in order
    # (data → manifest → pointer): without it the kernel may persist
    # the small VERSION file before the data pages under power loss,
    # and restore's only check (VERSION exists) would pass on a torn
    # backup.
    snap_dir = os.path.join(dest, "snapshots")
    os.makedirs(snap_dir, exist_ok=True)
    manifest = os.path.join(snap_dir, f"v{v}.json")
    with open(manifest, "w") as f:
        json.dump(snap, f)
        f.flush()
        os.fsync(f.fileno())
    for d in (*dirs_made, snap_dir):  # dir entries durable too
        _fsync_path(d)
    tmp = os.path.join(dest, "VERSION.tmp")
    with open(tmp, "w") as f:
        f.write(str(v))
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, os.path.join(dest, "VERSION"))
    _fsync_path(dest)
    return {"version": v, "files": len(rels), "bytes": total}


def restore_snapshot(spark, backup: str, root: str) -> ParquetTranscriptTable:
    """Materialize a live table at ``root`` from a backup directory.
    The restored table carries the backup's epoch/lsn watermark, so
    replaying the source log resumes (and skips) exactly-once."""
    if not os.path.exists(os.path.join(backup, "VERSION")):
        raise FileNotFoundError(f"{backup} is not a completed backup (no VERSION)")
    if os.path.exists(os.path.join(root, "VERSION")):
        raise ValueError(f"{root} already holds a table")
    shutil.copytree(backup, root, dirs_exist_ok=True)
    return ParquetTranscriptTable.load(spark, root)
