"""Batch apply: LWW-resolve a micro-batch and MERGE it into the
transcripts table — the engine's core operator.

This is the Spark re-expression of the reference's store-node apply
path (``SQLiteStorage.write(PipeEntity)`` — one transaction writing
messages + offsets + pipe state, rollback on failure,
``/root/reference/pipe-storage-sqlite/.../SQLiteStorage.java:199-241``):

1. additive schema evolution (align batch ↔ table schema);
2. LWW resolution (salted argmax + tombstones + conversation-level
   deletes) → exactly one row per key (Iceberg MERGE cardinality rule);
3. key-partitioned MERGE: only the hash buckets present in the batch
   are read and rewritten (partition pruning analog of cluster routing,
   ``PostgresqlStorage.java:469-473``);
4. exactly-once: the epoch/max-lsn stamp and the ``_offsets`` metrics
   row ride in the same atomic snapshot commit as the data; a replayed
   epoch (``epoch <= last committed``) is skipped idempotently
   (reference: duplicate offset apply fails the PK and rolls back —
   ``SQLiteQueries.java:22``; here it's a clean no-op skip).
"""

from __future__ import annotations

import datetime as _dt
import json

from pyspark.sql import DataFrame, functions as F

from aqueduct_core_spark.catalog.table import (
    BUCKET_COLUMN,
    ParquetTranscriptTable,
    bucket_expr,
)
from aqueduct_core_spark.config import EngineConfig
from aqueduct_core_spark.operators import evolve, lww
from aqueduct_core_spark.schema import (
    KEY_COLUMNS,
    LSN_COLUMN,
    OP_DELETE,
    PIPE_UP_TO_DATE,
)


def merge_state(
    existing: DataFrame,
    winners: DataFrame,
    conv_del: DataFrame,
    payload_cols: list[str],
) -> DataFrame:
    """Pure-DataFrame MERGE semantics (the plan Iceberg's MERGE INTO
    would produce, expressed directly):

    - matched & src newer & src op!='D'  → src row (UPDATE)
    - matched & src newer & src op=='D'  → drop (DELETE)
    - matched & src older                → existing row (idempotent replay)
    - not matched & src op!='D'          → src row (INSERT)
    - existing-only                      → keep, unless killed by a
      conversation-level delete watermark (lsn ≤ conv_del_lsn).
    """
    t = existing.alias("t")
    s = winners.alias("s")
    joined = t.join(s, on=KEY_COLUMNS, how="full_outer")

    s_lsn, t_lsn = F.col(f"s.{LSN_COLUMN}"), F.col(f"t.{LSN_COLUMN}")
    take_src = s_lsn.isNotNull() & (t_lsn.isNull() | (s_lsn >= t_lsn))

    cols = [F.col(c) for c in KEY_COLUMNS]
    for c in payload_cols:
        cols.append(F.when(take_src, F.col(f"s.{c}")).otherwise(F.col(f"t.{c}")).alias(c))
    cols.append(F.when(take_src, s_lsn).otherwise(t_lsn).alias(LSN_COLUMN))
    cols.append(F.when(take_src, F.col("s.op")).otherwise(F.lit(None)).alias("_op"))

    merged = joined.select(*cols).where(
        F.col("_op").isNull() | (F.col("_op") != OP_DELETE)
    ).drop("_op")

    # conversation-level deletes against surviving state
    merged = (
        merged.join(F.broadcast(conv_del), on="conv_id", how="left")
        .where(
            F.col("conv_del_lsn").isNull() | (F.col(LSN_COLUMN) > F.col("conv_del_lsn"))
        )
        .drop("conv_del_lsn")
    )
    return merged


def apply_batch(
    table: ParquetTranscriptTable,
    batch: DataFrame,
    epoch: int,
    cfg: EngineConfig | None = None,
) -> dict:
    """Apply one micro-batch; returns the metrics/offsets row."""
    cfg = cfg or EngineConfig()
    spark = table.spark

    # ---- exactly-once guard (T5): replayed epoch is a no-op ----------
    last_epoch = table.last_committed_epoch()
    if epoch <= last_epoch:
        return {
            "epoch": epoch,
            "last_lsn": table.last_committed_lsn(),
            "applied": 0,
            "skipped": -1,  # unknown without scanning; marker for "whole batch"
            "partition_lineage": None,
            "committed_at": _dt.datetime.now(_dt.timezone.utc).replace(tzinfo=None),
            "state": "SKIPPED_DUPLICATE_EPOCH",
        }

    # ---- schema evolution (additive, metadata-only) ------------------
    table_fields = table.schema().fields
    new_fields, added_cols = evolve.evolve_table_fields(table_fields, batch)
    batch = evolve.align_batch(batch, new_fields)
    payload_cols = [
        f.name
        for f in new_fields
        if f.name not in (*KEY_COLUMNS, LSN_COLUMN)
    ]

    # ---- single-pass resolution → staging buffer ---------------------
    # The unified argmax (turn + conversation keys in one aggregation)
    # is the ONLY scan of the incoming batch.  Its small result is
    # staged to parquet (analog of the reference EVENTS_BUFFER table,
    # PostgresqlStorageIntegrationSpec.groovy:76-86) so winners,
    # watermarks, lineage and the MERGE all read the collapsed keys —
    # never the raw 10^10-event log again.
    staged_path = table.stage_path(f"epoch-{epoch}")
    (
        lww.unified_argmax(batch, payload_cols, cfg.salt_buckets)
        .withColumn(BUCKET_COLUMN, bucket_expr(table.num_buckets))
        .withColumn("_isturn", (F.col("_tkey") >= 0).cast("int"))
        .write.partitionBy(BUCKET_COLUMN, "_isturn")
        .parquet(staged_path)
    )
    try:
        # ---- lineage + watermark + max-lsn bookkeeping: ZERO jobs -----
        # derived from the staged files' parquet footer statistics,
        # driver-side (the Iceberg-manifest trick) — the only Spark jobs
        # per epoch are the stage write and the MERGE write.
        summary = table.stage_summary(staged_path)
        affected = sorted(
            b for b, s in summary.items() if s["turn_keys"] > 0 or s["has_conv_del"]
        )
        lineage = {
            str(b): {
                "min_lsn": int(s["min_lsn"]),
                "max_lsn": int(s["max_lsn"]),
                "keys": int(s["turn_keys"]),
            }
            for b, s in summary.items()
            if s["turn_keys"] > 0
        }
        applied = sum(v["keys"] for v in lineage.values())
        batch_max_lsn = max(
            [int(s["any_max_lsn"]) for s in summary.values() if s["any_max_lsn"] is not None]
            + [table.last_committed_lsn()]
        )

        if not affected:
            # empty batch (e.g. a streaming trigger with no rows):
            # nothing to merge, nothing to commit beyond bookkeeping
            return {
                "epoch": int(epoch),
                "last_lsn": int(batch_max_lsn),
                "applied": 0,
                "skipped": 0,
                "partition_lineage": "{}",
                "committed_at": _dt.datetime.now(_dt.timezone.utc).replace(tzinfo=None),
                "state": PIPE_UP_TO_DATE,
                "added_columns": added_cols,
            }

        staged = spark.read.parquet(staged_path)
        winners = lww.staged_winners(staged, payload_cols)
        conv_del = lww.staged_conv_del(staged)

        # ---- MERGE: read only affected buckets, rewrite only them ----
        import pyspark.sql.types as T

        existing = table.read_internal(
            affected, schema=T.StructType(new_fields)
        )
        merged = merge_state(
            existing.drop(BUCKET_COLUMN) if BUCKET_COLUMN in existing.columns else existing,
            winners,
            conv_del,
            payload_cols,
        ).withColumn(BUCKET_COLUMN, bucket_expr(table.num_buckets))

        new_files = table.write_bucket_data(merged, label=f"epoch-{epoch}")
        replaced = {str(b): new_files.get(str(b), []) for b in affected}

        # ---- offsets row + atomic commit ------------------------------
        offsets_row = {
            "epoch": int(epoch),
            "last_lsn": int(batch_max_lsn),
            "applied": int(applied),
            "skipped": 0,
            "partition_lineage": json.dumps(lineage, sort_keys=True),
            "committed_at": _dt.datetime.now(_dt.timezone.utc).replace(tzinfo=None),
            "state": PIPE_UP_TO_DATE,
        }
        offsets_rel = table.write_offsets_row(offsets_row, label=f"epoch-{epoch}")
        table.catalog.commit(
            table.catalog.current(),
            replaced_buckets=replaced,
            added_offsets_files=[offsets_rel],
            summary_updates={
                cfg.prop_epoch: int(epoch),
                cfg.prop_max_lsn: int(batch_max_lsn),
                **(
                    {"aqueduct.added-columns": ",".join(added_cols)}
                    if added_cols
                    else {}
                ),
            },
            schema_fields=[f.jsonValue() for f in new_fields] if added_cols else None,
        )
        offsets_row["state"] = PIPE_UP_TO_DATE
        offsets_row["added_columns"] = added_cols
        return offsets_row
    finally:
        table.drop_stage(staged_path)
