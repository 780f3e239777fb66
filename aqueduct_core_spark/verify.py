"""Verification utilities: replay-equality checks.

Spark-side equivalents of the reference's consistency checks, usable on
arbitrarily large tables (no driver materialization):

- :func:`consistency_sum` — A4, SUM of per-key max lsn over live keys
  (``/root/reference/pipe-storage-sqlite/.../SQLiteQueries.java:57-64``,
  tests ``SQLiteStorageIntegrationSpec.groovy:1065-1207``): a cheap
  whole-table replay-equality checksum.
- :func:`state_digest` — order-insensitive content hash of the final
  state (xxhash64 per row, summed) for state-vs-state comparison
  without collecting either side.
- :func:`states_equal` — exact anti-join equality between two state
  DataFrames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from aqueduct_core_spark.operators import lww
from aqueduct_core_spark.schema import KEY_COLUMNS, LSN_COLUMN, OP_DELETE


def consistency_sum(changes: DataFrame, payload_cols: list[str] | None = None) -> int:
    """Offset-consistency checksum computed from a raw change log:
    resolve LWW winners, drop tombstone/conv-deleted keys, sum lsns."""
    payload_cols = payload_cols or ["role", "text", "tool", "ts"]
    winners, conv_del = lww.resolve_batch(changes, payload_cols)
    live = winners.where(F.col("op") != OP_DELETE)
    row = live.agg(F.sum(LSN_COLUMN).alias("s")).collect()[0]
    return int(row["s"]) if row["s"] is not None else 0


def table_consistency_sum(state: DataFrame) -> int:
    """Same checksum computed from a materialized transcripts state."""
    row = state.agg(F.sum(LSN_COLUMN).alias("s")).collect()[0]
    return int(row["s"]) if row["s"] is not None else 0


def state_digest(state: DataFrame, cols: list[str] | None = None) -> int:
    """Order-insensitive 64-bit digest: sum of per-row xxhash64 over a
    canonical column set.  Two equal states have equal digests; fully
    distributed (one agg)."""
    cols = cols or [c for c in state.columns if c != LSN_COLUMN]
    # decimal accumulator: overflow-free under ANSI mode.  Null flags
    # ride along because xxhash64 skips NULL operands — without them a
    # value shifted between nullable columns hashes identically
    # (operators/antientropy._row_hash, same construction).
    ordered = sorted(cols)
    h = F.xxhash64(
        *[F.col(c) for c in ordered],
        *[F.col(c).isNull() for c in ordered],
    ).cast("decimal(38,0)")
    row = state.agg(F.sum(h).alias("d")).collect()[0]
    return int(row["d"]) if row["d"] is not None else 0


def ts_lsn_inversions(changes: DataFrame, block_bits: int = 14) -> int:
    """Count lsn-block-level violations of "event time is monotone with
    lsn" — the source-clock assumption compact_log's dead-state drop
    (and the reference's created_utc-threshold compaction,
    SQLiteQueries.java:52) relies on.

    One distributed agg over ``lsn >> block_bits`` blocks (bounded rows,
    same trick as trigger planning), then a single-pass window check
    that each block's min ts is ≥ every earlier block's max ts.  Zero ⇒
    any row above a compaction ts-threshold also has a higher lsn than
    every row below it, at block granularity.  Sub-block jitter (a few
    ms inside one 2^14-lsn block) is invisible and harmless: compaction
    thresholds are hours, blocks are instants."""
    from pyspark.sql.window import Window

    blocks = changes.groupBy(
        F.shiftright(F.col("lsn"), block_bits).alias("_blk")
    ).agg(F.min("ts").alias("lo"), F.max("ts").alias("hi"))
    w = Window.orderBy("_blk").rowsBetween(Window.unboundedPreceding, -1)
    viol = blocks.select(
        (F.col("lo") < F.max("hi").over(w)).alias("bad")
    ).where(F.col("bad"))
    return viol.count()


def states_equal(a: DataFrame, b: DataFrame, cols: list[str] | None = None) -> bool:
    """Exact set equality via symmetric anti-joins (null-safe)."""
    cols = cols or sorted(set(a.columns) & set(b.columns))
    aa, bb = a.select(*cols), b.select(*cols)
    if aa.count() != bb.count():
        return False
    cond = [aa[c].eqNullSafe(bb[c]) for c in cols]
    only_a = aa.join(bb, cond, "left_anti").count()
    return only_a == 0
