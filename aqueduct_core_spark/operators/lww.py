"""Last-writer-wins resolution kernel.

Reference semantics being re-expressed:

- per-key argmax "latest wins" — the LWW dedup anti-join
  ``DELETE … WHERE msg_offset NOT IN (SELECT max(msg_offset) … GROUP BY
  msg_key, type)`` (``/root/reference/pipe-storage-sqlite/.../SQLiteQueries.java:51-52``,
  tests ``SQLiteStorageIntegrationSpec.groovy:696-907``);
- deletion kills everything at-or-below the deletion's offset for that
  key (``/root/reference/pipe-storage-postgresql/.../PostgresqlStorage.java:479-493``);
- tombstone = ``data IS NULL`` → here explicit ``op = 'D'``
  (``SQLiteQueries.java:54-55``).

Spark-first design: the argmax is a **hash aggregation on
``max(struct(lsn, …))``**, not a window — partial (map-side) combine
makes it skew-resilient (a hot conversation's events collapse to one
row per key on the map side before the shuffle), and there is no
per-partition sort.  With ``salt_buckets > 0`` the aggregation runs in
two explicitly salted phases (see :mod:`aqueduct_core_spark.operators.skew`).
Tie-breaking is deterministic because ``lsn`` is unique; the struct
comparison falls back to ``ts`` then ``op`` if a malformed log ever
duplicated an lsn.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from aqueduct_core_spark.schema import KEY_COLUMNS, LSN_COLUMN, OP_DELETE


def split_hierarchy(changes: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Split the log into turn-level events and conversation-level
    (parent) events — hierarchical parent→child resolution.

    Conversation-level metadata events always precede their turns in
    lsn order (generator invariant; the reference guarantees ordered
    offsets — pipe-api/.../Writer.java:5-11), so parents need no join
    back: only conversation-level *deletes* affect turn state.
    """
    turn_events = changes.where(F.col("turn_idx").isNotNull())
    conv_events = changes.where(F.col("turn_idx").isNull())
    return turn_events, conv_events


def conv_delete_watermarks(conv_events: DataFrame) -> DataFrame:
    """Max delete lsn per conversation: any turn whose winning lsn is
    at-or-below this dies (reference J1 'mark everything ≤ the latest
    deletion offset', PostgresqlStorage.java:479-493)."""
    return (
        conv_events.where(F.col("op") == OP_DELETE)
        .groupBy("conv_id")
        .agg(F.max("lsn").alias("conv_del_lsn"))
    )


def argmax_winners(
    turn_events: DataFrame,
    payload_cols: list[str],
    salt_buckets: int = 0,
) -> DataFrame:
    """One row per (conv_id, turn_idx): the max-lsn event.

    ``payload_cols`` are the non-key payload columns to carry (dynamic —
    grows under schema evolution).  ``salt_buckets > 0`` switches to the
    two-phase salted aggregation; ``max(struct(lsn, …))`` is associative
    and ``lsn`` unique, so the salted result is identical.
    """
    fields = ["lsn", "op"] + [c for c in payload_cols if c not in ("lsn", "op")]
    winner = F.max(F.struct(*[F.col(c) for c in fields])).alias("w")

    if salt_buckets > 0:
        from aqueduct_core_spark.operators.skew import SALT_COLUMN, with_salt

        partial = (
            with_salt(turn_events, salt_buckets)
            .groupBy(*KEY_COLUMNS, SALT_COLUMN)
            .agg(winner)
        )
        agged = partial.groupBy(*KEY_COLUMNS).agg(F.max("w").alias("w"))
    else:
        agged = turn_events.groupBy(*KEY_COLUMNS).agg(winner)

    out_cols = [F.col(c) for c in KEY_COLUMNS]
    out_cols += [F.col(f"w.{c}").alias(c) for c in payload_cols]
    out_cols += [F.col("w.op").alias("op"), F.col("w.lsn").alias(LSN_COLUMN)]
    return agged.select(*out_cols)


def resolve_batch(
    changes: DataFrame, payload_cols: list[str], salt_buckets: int = 0
) -> tuple[DataFrame, DataFrame]:
    """Resolve a micro-batch of change events to:

    - ``winners``: one row per touched key (the MERGE-source cardinality
      guarantee Iceberg requires) with the winning payload, ``op``
      ('D' ⇒ the key's final state in this batch is deleted) and
      ``_lsn``; conversation-level deletes already applied to the
      batch's own rows.
    - ``conv_del``: per-conversation delete watermarks, still to be
      applied against pre-existing table state during MERGE.
    """
    turn_events, conv_events = split_hierarchy(changes)
    conv_del = conv_delete_watermarks(conv_events)
    winners = argmax_winners(turn_events, payload_cols, salt_buckets)

    # Conversation-level deletes vs the batch's own winners: a winner
    # at-or-below the conversation's delete watermark becomes a delete
    # for that key (op='D' rather than dropped, because it must also
    # kill older table state for the same key).
    winners = (
        winners.join(F.broadcast(conv_del), on="conv_id", how="left")
        .withColumn(
            "op",
            F.when(
                F.col("conv_del_lsn").isNotNull()
                & (F.col(LSN_COLUMN) <= F.col("conv_del_lsn")),
                F.lit(OP_DELETE),
            ).otherwise(F.col("op")),
        )
        .drop("conv_del_lsn")
    )
    return winners, conv_del


def lww_dedup_window(turn_events: DataFrame) -> DataFrame:
    """Window-function formulation of the same kernel (reference J2/W2):
    ``row_number() OVER (PARTITION BY key ORDER BY lsn DESC) = 1``.

    Kept as a secondary implementation for parity testing and for
    callers that need *all* columns of the winning row untouched.  The
    aggregate formulation is preferred at scale (no sort, partial
    combine).
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy(*KEY_COLUMNS).orderBy(
        F.col("lsn").desc(), F.col("ts").desc()
    )
    return (
        turn_events.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
