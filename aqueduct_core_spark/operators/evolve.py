"""Additive schema evolution (north rule: new columns like ``tool``
metadata appear mid-stream and must be absorbed without rewrite).

The reference gets payload evolution for free because payloads are
opaque JSON strings (``pipe-api/.../Message.java:14-31`` — the engine
never introspects ``data``).  Here payload fields are real columns, so
evolution is explicit: a batch carrying a never-seen column extends the
table schema (metadata-only — old Parquet files simply lack the column
and read back as nulls; Iceberg ``ALTER TABLE ADD COLUMN`` on the
production backend), and a batch *missing* known columns gets them
null-filled.  Only additive changes are allowed; a type change or drop
raises.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

from aqueduct_core_spark.schema import KEY_COLUMNS, LSN_COLUMN

#: change-log columns that are engine metadata, not payload
_NON_PAYLOAD = {
    "lsn", "op", "event_size", "cluster_id", "location_group",
    "_salt", "_bucket", "_lsn",
}


class IncompatibleSchemaChange(Exception):
    pass


def batch_payload_fields(batch: DataFrame) -> list[T.StructField]:
    """Payload fields of an incoming change batch, key columns first."""
    return [f for f in batch.schema.fields if f.name not in _NON_PAYLOAD]


def evolve_table_fields(
    table_fields: list[T.StructField], batch: DataFrame
) -> tuple[list[T.StructField], list[str]]:
    """Return (new table field list, names of added columns).

    Additive only: existing columns must keep their type; new batch
    payload columns are appended before ``_lsn``.
    """
    by_name = {f.name: f for f in table_fields}
    added: list[str] = []
    out = [f for f in table_fields if f.name != LSN_COLUMN]
    for f in batch_payload_fields(batch):
        if f.name in by_name:
            if by_name[f.name].dataType != f.dataType:
                raise IncompatibleSchemaChange(
                    f"column {f.name}: {by_name[f.name].dataType} -> {f.dataType}"
                )
        else:
            out.append(T.StructField(f.name, f.dataType, True))
            added.append(f.name)
    out.append(T.StructField(LSN_COLUMN, T.LongType(), False))
    return out, added


def align_batch(batch: DataFrame, table_fields: list[T.StructField]) -> DataFrame:
    """Null-fill table columns the batch doesn't carry (e.g. replaying
    an epoch-0 segment after evolution) and order columns canonically.
    Engine metadata columns pass through untouched."""
    have = set(batch.columns)
    cols = [F.col(c) for c in batch.columns]
    for f in table_fields:
        if f.name == LSN_COLUMN or f.name in have or f.name in KEY_COLUMNS:
            continue
        cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    return batch.select(*cols)
