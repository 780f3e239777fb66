"""Training-example extraction from conversation transcripts.

The engine's merged state (LWW resolution of the change log) and its
SCD2 history are not just serving surfaces — they are the raw material
for supervised-fine-tuning and preference datasets.  This module turns
them into training examples with plain DataFrame plans:

- :func:`sft_examples` — (context, target) pairs: every turn of a
  chosen role becomes a target with the rendered transcript prefix as
  its context.  The standard SFT example shape.
- :func:`preference_pairs` — (rejected, chosen) pairs mined from the
  CDC *update history*: when a turn was overwritten in the log (a
  regeneration / edit), every superseded version pairs with the final
  surviving version of the same key.  The edit stream IS a preference
  signal — this is the one dataset shape only a CDC engine can produce,
  because append-only corpus snapshots never see the superseded text.

Scale notes (the 100 TB lens): both operators are a single window
shuffle partitioned by conversation (resp. turn key); skew is bounded
by the longest single conversation — the same bound every per-conv
operator in the engine carries (``operators/temporal.py``,
``operators/rollup.py``).  No UDFs, no driver collect, no self-join;
``preference_pairs`` attaches the chosen version with ``first()`` over
the same descending window that ranks versions, so the pairing is free
once the history is sorted.

Reference provenance: the update history these pairs mine is the
reference's core data model — every mutation is a new offset on the
same key and old versions stay readable until compaction
(pipe-storage-postgresql/.../PostgresqlStorage.java:252-266 upsert-
keeping-history semantics; SQLiteQueries.java:51-55 compaction is what
*removes* superseded versions).  Run extraction upstream of retention.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["sft_examples", "preference_pairs"]


def sft_examples(
    state: DataFrame,
    target_role: str,
    sep: str = "\n",
    min_context_turns: int = 1,
) -> DataFrame:
    """(context, target) SFT pairs from the merged transcript state.

    Every turn whose ``role`` equals ``target_role`` becomes one
    example: ``target`` is that turn's text, ``context`` is the
    rendered ``role: text`` lines of ALL earlier turns of the same
    conversation in stable turn order, joined with ``sep``.  Turns with
    fewer than ``min_context_turns`` preceding turns are dropped (a
    target with no context teaches nothing).

    Plan: one window shuffle on ``conv_id`` (running ``collect_list``
    over the preceding frame renders each prefix exactly once — no
    per-target re-scan, no quadratic array slicing); the role filter
    runs after the window so every turn contributes to contexts even
    when it never becomes a target.
    """
    line = F.concat_ws(": ", F.col("role"), F.col("text"))
    w = (
        Window.partitionBy("conv_id")
        .orderBy("turn_idx")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        state.select(
            "conv_id",
            "turn_idx",
            "role",
            F.col("text").alias("target"),
            F.count(F.lit(1)).over(w).alias("n_context_turns"),
            F.concat_ws(sep, F.collect_list(line).over(w)).alias("context"),
        )
        .where(
            (F.col("role") == target_role)
            & (F.col("n_context_turns") >= min_context_turns)
        )
        .select("conv_id", "turn_idx", "n_context_turns", "context", "target")
    )


def preference_pairs(
    changes: DataFrame,
    payload_cols: tuple[str, ...] = ("role", "text", "tool", "ts"),
) -> DataFrame:
    """(rejected, chosen) preference pairs from the CDC update history.

    A key that was written more than once carries an implicit
    preference label: the author (or upstream system) replaced the old
    text with a new one.  For every (conv_id, turn_idx) whose LATEST
    version is still current (the turn is alive in the final state),
    each superseded version closed by an ``'update'`` (i.e. genuinely
    overwritten — versions ended by turn or conversation deletes are
    removals, not preferences) yields one pair:

    ==================  ====================================================
    rejected_lsn/text   the superseded version (one row per such version)
    chosen_lsn/text     the key's final, current version
    rejected_role /
    chosen_role         roles of the two versions (filter downstream if the
                        pair should stay within one speaker role)
    n_versions          total versions the key ever had
    ==================  ====================================================

    Built on :func:`aqueduct_core_spark.operators.temporal.scd2_history`
    (itself two shuffles); the pairing adds ONE more window over the
    turn key — ``first()`` on the lsn-descending sort attaches the
    chosen version to every row, so no self-join materializes the
    pairs.
    """
    from aqueduct_core_spark.operators.temporal import scd2_history

    hist = scd2_history(changes, payload_cols)
    wd = Window.partitionBy("conv_id", "turn_idx").orderBy(
        F.col("valid_from_lsn").desc()
    )
    wall = Window.partitionBy("conv_id", "turn_idx")
    ranked = hist.select(
        "conv_id",
        "turn_idx",
        F.col("valid_from_lsn").alias("rejected_lsn"),
        F.col("role").alias("rejected_role"),
        F.col("text").alias("rejected_text"),
        "end_reason",
        F.row_number().over(wd).alias("_rn"),
        F.first("valid_from_lsn").over(wd).alias("chosen_lsn"),
        F.first("role").over(wd).alias("chosen_role"),
        F.first("text").over(wd).alias("chosen_text"),
        F.first("is_current").over(wd).alias("_latest_current"),
        F.count(F.lit(1)).over(wall).alias("n_versions"),
    )
    return ranked.where(
        (F.col("_rn") > 1)
        & F.col("_latest_current")
        & (F.col("end_reason") == "update")
    ).select(
        "conv_id",
        "turn_idx",
        "rejected_lsn",
        "rejected_role",
        "rejected_text",
        "chosen_lsn",
        "chosen_role",
        "chosen_text",
        "n_versions",
    )
