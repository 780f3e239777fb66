"""Change-log source: declarative reads over the append-only log.

Re-expresses the reference's central read path
(``PostgresqlStorage.read`` — query builders
``/root/reference/pipe-storage-postgresql/.../PostgresqlStorage.java:432-473``)
as a composable set of DataFrame predicates.  All of them reach the
Parquet/Iceberg scan via Catalyst pushdown (check ``PushedFilters`` in
``.explain``); nothing is filtered post-hoc.

Filter inventory (SURVEY §2.2):
- F1 offset range  — ``lsn BETWEEN start AND ceiling`` (inclusive both
  ends; start-inclusive resume semantics, StorageSpec.groovy:107-123)
- F2 type filter   — empty list ⇒ all types (StorageSpec.groovy:82-105)
- F3 cluster + location-group routing —
  ``cluster_id IN (…) AND (location_group IS NULL OR location_group IN …)``
  (PostgresqlStorage.java:469-473)
- F4 projection    — fixed column select (column pruning)
- F5 tombstone     — ``op = 'D'``
- F7 event-time threshold — ``ts <= t``
- O1/O2 total-order sort + limit (PostgresqlStorage.java:444-445)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from aqueduct_core_spark.schema import CHANGES_SCHEMA, OP_DELETE


def read_log(spark: SparkSession, path: str, schema=None) -> DataFrame:
    return spark.read.schema(schema or CHANGES_SCHEMA).parquet(path)


def offset_range(df: DataFrame, start_lsn: int, end_lsn: int | None = None) -> DataFrame:
    """F1: inclusive both ends; ``end_lsn`` is the visibility ceiling
    (the reference bounds reads by the cached globalLatestOffset —
    PostgresqlStorage.java:158-168)."""
    out = df.where(F.col("lsn") >= start_lsn)
    if end_lsn is not None:
        out = out.where(F.col("lsn") <= end_lsn)
    return out


def type_filter(df: DataFrame, ops: list[str] | None) -> DataFrame:
    """F2: empty/None op list means no filtering."""
    if not ops:
        return df
    return df.where(F.col("op").isin(ops))


def routing_filter(
    df: DataFrame,
    cluster_ids: list[int] | None,
    location_groups: list[int] | None = None,
) -> DataFrame:
    """F3: only rows for your clusters, plus group-targeted rows."""
    if cluster_ids:
        df = df.where(F.col("cluster_id").isin([int(c) for c in cluster_ids]))
    if location_groups is not None and "location_group" in df.columns:
        df = df.where(
            F.col("location_group").isNull()
            | F.col("location_group").isin([int(g) for g in location_groups])
        )
    return df


def tombstones(df: DataFrame) -> DataFrame:
    """F5."""
    return df.where(F.col("op") == OP_DELETE)


def until_event_time(df: DataFrame, threshold) -> DataFrame:
    """F7: ``created_utc <= ?`` analog (SQLiteQueries.java:52, 67)."""
    return df.where(F.col("ts") <= F.lit(threshold))


def page(
    df: DataFrame,
    start_lsn: int,
    limit: int,
    ops: list[str] | None = None,
    cluster_ids: list[int] | None = None,
    end_lsn: int | None = None,
) -> DataFrame:
    """One reference-style poll page: routed, range-bounded, totally
    ordered by lsn, row-limited (the ORDER BY + LIMIT contract,
    PostgresqlStorage.java:444-445, 463-464)."""
    out = offset_range(df, start_lsn, end_lsn)
    out = type_filter(out, ops)
    out = routing_filter(out, cluster_ids)
    return out.orderBy("lsn").limit(limit)


def max_offset_for_types(df: DataFrame, ops: list[str] | None) -> DataFrame:
    """A6: max offset among the given consumer types (empty = all) —
    reference ``getMaxOffsetForConsumers`` (SQLiteQueries.java:114-124,
    SQLiteStorage.java:397-418).  Returns a 1-row DataFrame
    ``(max_offset_consumers)``; NULL when no matching rows."""
    return type_filter(df, ops).agg(F.max("lsn").alias("max_offset_consumers"))


def global_latest_offset(df: DataFrame) -> int:
    """A1: ``SELECT max(msg_offset)`` (GlobalLatestOffsetCache.java:16).
    On the snapshot-manifest table this is free from the commit summary;
    on a raw log it is one agg."""
    row = df.agg(F.max("lsn").alias("m")).collect()[0]
    return int(row["m"]) if row["m"] is not None else -1
