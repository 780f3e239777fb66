"""Key erasure: remove every trace of a conversation from the engine.

The compliance operation the reference cannot express: its deletion
tombstones (``data IS NULL`` — pipe-storage-sqlite/.../SQLiteQueries.java:54-55)
*mark* a key dead but deliberately keep the marker (and every replica's
compacted copy) so late consumers converge; GDPR/CCPA erasure demands
the opposite — the key's payload bytes must stop existing on every
storage surface, including the log the engine would otherwise replay it
back from.  This module provides erasure for each surface the engine
owns:

- :func:`erase_conversations` — the transcript TABLE: a bucket-pruned
  rewrite of exactly the buckets that can hold the keys (driver-side
  ``bucket_of`` mirror of the layout hash), dropping the keys' rows
  from the resolved slice and clearing those buckets' MOR deltas in
  the SAME atomic snapshot commit (the ``fold_deltas`` shape with an
  anti-join added — a delta file may carry the key's text, so folding
  the bucket is what physically evicts it from the live file set).
  The exactly-once epoch/lsn watermark is intentionally untouched:
  erasure rewrites history, it does not ban the future — a *new* event
  for the key (lsn above the watermark) ingests normally.
- :func:`erase_from_log` — the change LOG: without this, any bootstrap
  or replay resurrects the key.  One scan locates the files that hold
  the key (erasure requests are rare; at 10^10 events you pay one
  pruned scan, and a demuxed/bucket-routed log bounds the blast radius
  to its route), ONE job rewrites all affected files (grouped by source
  file, dynamic-partition write — never a job per file), then each
  rewritten file atomically replaces its original (``os.replace``).
  Per-file lsn ranges are preserved, so footer-statistics trigger
  planning (``plan_triggers_from_files``) is undisturbed.  A file left
  empty is removed.  Crash mid-swap is safe: rerunning converges
  (the rewrite is idempotent) and every intermediate state is a valid
  log — a file is either the original or its filtered replacement.
- :meth:`~aqueduct_core_spark.operators.scd2.Scd2History.erase` — the
  SCD2 HISTORY sink keeps superseded text by design, so erasure must
  reach it too (see :mod:`aqueduct_core_spark.operators.scd2`).

What erasure does NOT silently do (documented sharp edges):

- **Old snapshots still reference the old files.**  The erase commit
  removes the key from the *current* file set; time travel to an older
  version still reads it.  Physical deletion completes when
  ``expire_snapshots`` + ``cleanup_orphans`` run — pass ``purge=True``
  to do both inline (retaining only the erase snapshot), at the cost of
  time travel and of any lagging feed consumer (same retention trade
  every lakehouse makes; Iceberg erasure runbooks are identical).
- **The table-level change feed cannot span the erase commit** — a
  base-file replace is not delta-expressible, so ``changes_between``
  across it fails loud and a ``FeedCursor`` resyncs, exactly as for
  ``fold_deltas``.  (Correct for compliance, too: the feed must not
  re-publish the erased text.)
- **Derived tables are the caller's list to walk**: SCD2 histories
  (``history.erase``), materialized views (a ``ConvView.refresh`` after
  the erase commit full-recomputes and drops the key), dedup indexes
  (``DedupIndex.remove``), backups (re-export or delete).

Keys are driver-resident by contract (an erasure request arrives as an
explicit key list); they travel to executors as a broadcast anti-join
side, never as a literal IN tree, so a million-key request plans the
same as a ten-key one.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F

from aqueduct_core_spark.catalog.table import (
    BUCKET_COLUMN,
    ParquetTranscriptTable,
    bucket_expr,
    bucket_of,
)
from aqueduct_core_spark.operators.compact import expire_snapshots


def _keys_df(spark: SparkSession, conv_ids: list[str]) -> DataFrame:
    if not conv_ids:
        raise ValueError("erase: empty key list")
    return spark.createDataFrame([(c,) for c in conv_ids], "conv_id string")


def erase_conversations(
    table: ParquetTranscriptTable, conv_ids: list[str], purge: bool = False
) -> dict:
    """Erase whole conversations from the transcript table in one
    atomic, bucket-pruned commit.  Returns a report; see module
    docstring for the retention/feed consequences and ``purge``."""
    spark = table.spark
    keys = _keys_df(spark, conv_ids)
    snap = table.catalog.current()
    buckets = sorted({bucket_of(c, table.num_buckets) for c in conv_ids})
    kept = (
        table.read_internal(buckets)
        .join(F.broadcast(keys), "conv_id", "left_anti")
        .withColumn(BUCKET_COLUMN, bucket_expr(table.num_buckets))
    )
    new_files = table.write_bucket_data(kept, label="erase")
    # a bucket left empty must still drop its old files
    replaced = {str(b): new_files.get(str(b), []) for b in buckets}
    out = table.catalog.commit(
        snap,
        replaced_buckets=replaced,
        clear_delta_buckets=[str(b) for b in buckets],
        summary_updates={"aqueduct.last-erase-keys": len(conv_ids)},
    )
    report = {
        "snapshot_id": out["snapshot_id"],
        "keys": len(conv_ids),
        "buckets": len(buckets),
        "purged_files": 0,
    }
    if purge:
        report["purged_files"] = expire_snapshots(table, keep_last=1)
    return report


def erase_from_log(
    spark: SparkSession, log_dir: str, conv_ids: list[str]
) -> dict:
    """Erase the keys' rows from an on-disk parquet change log by
    rewriting ONLY the files that contain them (one locate scan + one
    rewrite job + per-file atomic swap).  Quiesce replays of this log
    while it runs — same operational contract as
    ``remove_orphan_files`` (a reader that already planned its epochs
    may hold the old file bytes; the next replay sees the clean log).
    """
    keys = _keys_df(spark, conv_ids)
    log = spark.read.parquet(log_dir)
    affected = [
        r[0]
        for r in (
            log.join(F.broadcast(keys), "conv_id", "left_semi")
            .select(F.input_file_name().alias("f"))
            .distinct()
            .collect()
        )
    ]
    if not affected:
        return {"files_rewritten": 0, "files_removed": 0, "rows_erased": 0}
    paths = [f.removeprefix("file:") for f in affected]
    rows_before = spark.read.parquet(*paths).count()

    # one job for ALL affected files: tag each row with its source file
    # index, anti-join the keys away, dynamic-partition write by tag —
    # the per-source-file output preserves each file's lsn range so
    # footer-stat trigger planning still sees the same epoch boundaries.
    idx = {f: i for i, f in enumerate(affected)}
    mapping = F.create_map(
        *[x for f, i in idx.items() for x in (F.lit(f), F.lit(i))]
    )
    stage = os.path.join(log_dir, f".erase-{uuid.uuid4().hex[:8]}")
    (
        spark.read.parquet(*paths)
        .withColumn("_src", mapping[F.input_file_name()])
        .join(F.broadcast(keys), "conv_id", "left_anti")
        # the join hoists the key column; restore the log's column order
        # so replacement files are schema-identical to their originals
        .select("_src", *log.columns)
        .repartition(len(affected), F.col("_src"))
        .sortWithinPartitions("_src", "lsn")
        .write.partitionBy("_src")
        .parquet(stage)
    )
    rewritten = removed = 0
    rows_after = 0

    def _drop_crc(path: str) -> None:
        # Hadoop LocalFileSystem keeps a `.name.crc` checksum sidecar;
        # after swapping the data bytes it is stale and poisons reads
        crc = os.path.join(os.path.dirname(path), f".{os.path.basename(path)}.crc")
        try:
            os.remove(crc)
        except FileNotFoundError:
            pass

    try:
        for f, i in idx.items():
            target = f.removeprefix("file:")
            part_dir = os.path.join(stage, f"_src={i}")
            parts = (
                [p for p in os.listdir(part_dir) if p.endswith(".parquet")]
                if os.path.isdir(part_dir)
                else []
            )
            if not parts:
                # every row of this file belonged to erased keys
                os.remove(target)
                _drop_crc(target)
                removed += 1
                continue
            assert len(parts) == 1, f"expected one part for {f}, got {parts}"
            os.replace(os.path.join(part_dir, parts[0]), target)
            _drop_crc(target)
            rewritten += 1
        survivors = [p for p in paths if os.path.exists(p)]
        if survivors:
            rows_after = spark.read.parquet(*survivors).count()
    finally:
        shutil.rmtree(stage, ignore_errors=True)
    return {
        "files_rewritten": rewritten,
        "files_removed": removed,
        "rows_erased": rows_before - rows_after,
    }
