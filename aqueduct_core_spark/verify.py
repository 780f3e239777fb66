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


def log_audit(changes: DataFrame, lsn_col: str = "lsn") -> DataFrame:
    """One-row change-log integrity summary — the binlog/WAL gap audit
    a CDC consumer runs before trusting a replay window.

    Columns: ``n_events``, ``n_lsns`` (distinct non-null), ``dup_lsns``
    (re-delivered or mis-assigned offsets), ``null_lsns`` (events that
    arrived with NO offset at all — a different defect class),
    ``min_lsn``/``max_lsn``, and ``missing_lsns`` — how many offsets
    inside the observed range never arrived.  The reference's BIGSERIAL
    offsets legitimately skip values on rollback (SURVEY §1.2), so
    ``missing_lsns`` is a signal to reconcile against the source's own
    gap accounting, while ``dup_lsns > 0`` is always a transport bug
    (offsets are unique — reference ``Message.java`` identity).
    ``dup_lsns`` counts only non-null offsets (``count(lsn)``, not
    ``count(*)``) so a feed with null offsets reports ``null_lsns``
    instead of being misdiagnosed as re-delivery.

    Scale: one hash aggregation; the exact distinct count runs as
    Spark's standard two-stage partial aggregation (shuffle carries
    distinct lsns once, never rows).
    """
    lsn = F.col(lsn_col)
    return (
        changes.agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count(lsn).alias("_n_nonnull"),
            F.countDistinct(lsn).alias("n_lsns"),
            F.min(lsn).cast("long").alias("min_lsn"),
            F.max(lsn).cast("long").alias("max_lsn"),
        )
        .select(
            "n_events",
            "n_lsns",
            (F.col("_n_nonnull") - F.col("n_lsns")).alias("dup_lsns"),
            (F.col("n_events") - F.col("_n_nonnull")).alias("null_lsns"),
            "min_lsn",
            "max_lsn",
            (F.col("max_lsn") - F.col("min_lsn") + 1 - F.col("n_lsns"))
            .alias("missing_lsns"),
        )
    )


def turn_integrity(state: DataFrame) -> DataFrame:
    """Hierarchical-contiguity audit over a merged transcript state:
    conversations whose live turn set is NOT ``0..max_turn`` dense.

    A transcript's parent→child contract says turns are an ordered
    dense sequence; a hole means a turn-level tombstone (or a lost
    event) punched out a middle turn while later turns survived —
    exactly the rows a training-data exporter must either repair or
    drop, since a prefix render (``functions.examples.sft_examples``)
    would silently stitch non-adjacent turns together.

    Returns ``(conv_id, n_turns, min_turn, max_turn, missing_turns)``
    for offending conversations only (``min_turn > 0`` or
    ``missing_turns > 0``).  One hash aggregation with map-side
    combine; ``countDistinct`` is exact and bounded by
    turns-per-conversation.
    """
    return (
        state.groupBy("conv_id")
        .agg(
            F.countDistinct("turn_idx").alias("n_turns"),
            F.min("turn_idx").alias("min_turn"),
            F.max("turn_idx").alias("max_turn"),
        )
        .select(
            "conv_id",
            "n_turns",
            "min_turn",
            "max_turn",
            (F.col("max_turn") - F.col("min_turn") + 1 - F.col("n_turns"))
            .alias("missing_turns"),
        )
        .where((F.col("missing_turns") > 0) | (F.col("min_turn") > 0))
    )


def states_equal(a: DataFrame, b: DataFrame, cols: list[str] | None = None) -> bool:
    """Exact set equality via symmetric anti-joins (null-safe)."""
    cols = cols or sorted(set(a.columns) & set(b.columns))
    aa, bb = a.select(*cols), b.select(*cols)
    if aa.count() != bb.count():
        return False
    cond = [aa[c].eqNullSafe(bb[c]) for c in cols]
    only_a = aa.join(bb, cond, "left_anti").count()
    return only_a == 0


def op_transitions(changes: DataFrame) -> DataFrame:
    """CDC protocol-order profile: per-key op-sequence transition
    counts over the turn-keyed change stream, with a strictness flag.

    For every (conv_id, turn_idx) key the events sort by lsn; each
    event contributes one ``(prev_op → op)`` transition (first event:
    ``'START' → op``).  Returns ``(prev_op, op, n_events,
    protocol_ok)`` — the tiny matrix that characterizes a feed's shape
    and surfaces producers that violate strict CDC semantics:
    ``START→U`` (update before any insert — an out-of-retention
    snapshot or a lost insert), ``I→I`` (double insert), ``D→U``/
    ``D→D`` (mutating a deleted key without re-insert).  The engine's
    LWW merge absorbs all of these deterministically (lsn order wins
    regardless), so the audit is diagnostic, not corrective — the
    reference's storage likewise upserts any op order
    (PostgresqlStorage.java upsert semantics) while its producers are
    expected to emit strict I/U/D sequences.

    Scale: one window over the key shuffle (the table's own bucket
    key) + a ≤16-row aggregation with map-side combine.
    """
    from pyspark.sql.window import Window

    turns = changes.where(F.col("turn_idx").isNotNull())
    w = Window.partitionBy("conv_id", "turn_idx").orderBy("lsn")
    t = turns.select(
        F.coalesce(F.lag("op").over(w), F.lit("START")).alias("prev_op"),
        "op",
    )
    ok = (
        F.when((F.col("prev_op") == "START") & (F.col("op") == "I"), True)
        .when((F.col("prev_op") == "I") & F.col("op").isin("U", "D"), True)
        .when((F.col("prev_op") == "U") & F.col("op").isin("U", "D"), True)
        .when((F.col("prev_op") == "D") & (F.col("op") == "I"), True)
        .otherwise(False)
    )
    return (
        t.groupBy("prev_op", "op")
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
        .withColumn("protocol_ok", ok)
        .orderBy("prev_op", "op")
    )
