"""Event-time / log-order operators: as-of join and sessionization.

Spark has no native as-of join; the classic range-join formulation
(``r.ord <= l.ord`` + per-key argmax) explodes into an O(|L|·|R|)
BroadcastNestedLoop or range join at scale.  :func:`asof_join_log`
re-expresses it as ONE sort-based window over a tagged union — a
single shuffle on the join key, linear work within each partition —
the shape that survives a 100 TB log.

Reference semantics: the hierarchical delete watermark is itself an
as-of relationship ("the latest conversation-level tombstone at or
below this event's offset" — the reference deletes everything
at-or-below a parent deletion's offset,
``/root/reference/pipe-storage-postgresql/.../PostgresqlStorage.java:479-493``);
:func:`asof_join_log` generalizes that join shape to any
(key, ordering, payload) triple.  Sessionization is the event-time
grouping a transcript-analytics pipeline runs over conversation
activity (the batch twin of Structured Streaming's session windows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def asof_join_log(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    ord_col: str,
    right_payload: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """For every left row, attach the payload of the latest right row
    with the same key and ``right.ord <= left.ord`` (inclusive); null
    when no such row exists.

    Mechanics: tag both sides, union them (``allowMissingColumns``
    fills the other side's columns with null), and run ONE
    ``last(..., ignorenulls=True)`` window over a single STRUCT of the
    payload columns, ordered by ``(ord, side)`` with
    rows-unbounded-preceding frame.  The struct — not one window per
    column — is what preserves row semantics: the struct of a right
    row is non-null even when individual fields are null, so the left
    row gets *the latest right row's* payload verbatim; per-column
    fills would stitch fields from different right rows whenever the
    latest one carries a null field (with this engine's schema,
    ``tool`` is null on most rows — stale-value resurrection would be
    routine).  Right rows sort *before* left rows at equal ``ord``, so
    a right row at exactly the left row's ordinate is visible to it
    (at-or-before).  Cost: one hash shuffle on ``keys`` + an
    in-partition sort — no range-join candidate explosion, and per-key
    skew is bounded by the largest single key's history (the same
    bound every per-key window in the engine already carries).
    """
    r = right.select(
        *keys,
        F.col(ord_col).alias(ord_col),
        F.struct(*[F.col(c).alias(c) for c in right_payload]).alias("_rpay"),
    ).withColumn("_side", F.lit(0))
    l = left.withColumn("_side", F.lit(1))
    u = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(ord_col).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = u.select(
        "*", F.last(F.col("_rpay"), ignorenulls=True).over(w).alias("_rpay_f")
    )
    out_cols = [c for c in left.columns] + [
        F.col("_rpay_f")[c].alias(c + suffix) for c in right_payload
    ]
    return filled.where(F.col("_side") == 1).select(*out_cols)


def sessionize(
    changes: DataFrame,
    gap_minutes: int = 30,
    key_col: str = "conv_id",
    ts_col: str = "ts",
    ord_col: str = "lsn",
) -> DataFrame:
    """Gap-based sessions per key: a new session starts when the gap to
    the previous event (event-time order, ``ord_col`` tiebreak) exceeds
    ``gap_minutes``.  Returns one row per session: bounds, size, and
    the lsn range it covers.

    Two windows over the same (key → ts,lsn) sort — Spark plans ONE
    shuffle + one sort and evaluates both window functions in a single
    pass — then a hash aggregation on (key, session_id) with map-side
    combine.  The batch twin of Structured Streaming's
    ``session_window``; kept as plain expressions so the identical
    semantics are oracle-checkable in SQL.
    """
    w = Window.partitionBy(key_col).orderBy(F.col(ts_col).asc(), F.col(ord_col).asc())
    gap_s = F.col(ts_col).cast("long") - F.lag(F.col(ts_col)).over(w).cast("long")
    new_session = F.when(
        gap_s.isNull() | (gap_s > gap_minutes * 60), F.lit(1)
    ).otherwise(F.lit(0))
    cum = Window.partitionBy(key_col).orderBy(
        F.col(ts_col).asc(), F.col(ord_col).asc()
    ).rowsBetween(Window.unboundedPreceding, 0)
    tagged = changes.select(
        F.col(key_col),
        F.col(ts_col),
        F.col(ord_col),
        F.sum(new_session).over(cum).cast("int").alias("session_id"),
    )
    return tagged.groupBy(key_col, "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("start_ts"),
        F.max(ts_col).alias("end_ts"),
        F.min(ord_col).alias("first_lsn"),
        F.max(ord_col).alias("last_lsn"),
    )


def scd2_history(
    changes: DataFrame,
    payload_cols: tuple[str, ...] = ("role", "text", "tool", "ts"),
) -> DataFrame:
    """Slowly-changing-dimension **type-2** history of the transcript
    table: one row per *version* of each (conv_id, turn_idx) key, with
    the log-offset validity interval ``[valid_from_lsn, valid_to_lsn)``
    (``valid_to_lsn`` NULL = still current), the reason the version was
    closed, and the version's payload.

    Semantics (mirrors the engine's LWW + hierarchical-delete rules —
    the reference deletes everything at-or-below a parent deletion's
    offset, ``/root/reference/pipe-storage-postgresql/.../
    PostgresqlStorage.java:479-493``):

    - every turn-level ``I``/``U`` event *opens* a version at its lsn;
    - the next turn-level event on the same key (any op) closes it —
      ``end_reason`` ``'update'`` (next is I/U) or ``'delete'`` (next
      is a turn tombstone); turn tombstones emit no version themselves;
    - a conversation-level tombstone at lsn T closes every version of
      the conversation's turns open at T (``valid_from_lsn <= T``,
      at-or-below semantics) — ``end_reason 'conv_delete'`` when it
      lands before the key's own next event;
    - ``is_current`` = the interval is still open.

    Plan shape (the 100 TB lens): two shuffles total.  One window over
    ``(conv_id, turn_idx) → lsn`` for the lead()s, then the
    conv-tombstone closure as a *union-window* (tombstones tagged into
    the per-conversation stream, running ``min`` of tombstone lsns over
    a DESCENDING lsn sort = earliest tombstone at-or-after each
    version) — no range join, no per-version × per-tombstone fan-out;
    per-conv skew is bounded by the largest single conversation, the
    same bound :func:`sessionize` and the as-of join already carry.
    """
    turns = changes.where(F.col("turn_idx").isNotNull())
    w = Window.partitionBy("conv_id", "turn_idx").orderBy(F.col("lsn").asc())
    seq = turns.select(
        "conv_id",
        "turn_idx",
        "lsn",
        "op",
        *payload_cols,
        F.lead("lsn").over(w).alias("_turn_to"),
        F.lead("op").over(w).alias("_next_op"),
    )
    versions = seq.where(F.col("op").isin("I", "U")).withColumn("_is_tomb", F.lit(0))

    conv_tombs = (
        changes.where(F.col("turn_idx").isNull() & (F.col("op") == "D"))
        .select("conv_id", "lsn")
        .withColumn("_is_tomb", F.lit(1))
    )
    u = versions.unionByName(conv_tombs, allowMissingColumns=True)
    # lsn DESC + running min over preceding rows == earliest conv
    # tombstone with tomb.lsn >= version.lsn (lsns are unique, so the
    # at-or-after comparison never ties).
    wd = (
        Window.partitionBy("conv_id")
        .orderBy(F.col("lsn").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    closed = u.withColumn(
        "_conv_close",
        F.min(F.when(F.col("_is_tomb") == 1, F.col("lsn"))).over(wd),
    ).where(F.col("_is_tomb") == 0)

    valid_to = F.least(F.col("_turn_to"), F.col("_conv_close"))
    end_reason = (
        F.when(
            F.col("_conv_close").isNotNull()
            & (F.col("_turn_to").isNull() | (F.col("_conv_close") < F.col("_turn_to"))),
            F.lit("conv_delete"),
        )
        .when(F.col("_next_op") == "D", F.lit("delete"))
        .when(F.col("_turn_to").isNotNull(), F.lit("update"))
    )
    return closed.select(
        "conv_id",
        "turn_idx",
        F.col("lsn").alias("valid_from_lsn"),
        valid_to.alias("valid_to_lsn"),
        end_reason.alias("end_reason"),
        valid_to.isNull().alias("is_current"),
        F.col("op").alias("row_op"),
        *payload_cols,
    )


def state_at_lsn(
    changes: DataFrame,
    lsn: int,
    payload_cols: tuple[str, ...] = ("role", "text", "tool", "ts"),
) -> DataFrame:
    """Point-in-time state at ANY log offset — log time travel without
    snapshot retention: the slice of the :func:`scd2_history` whose
    validity interval covers ``lsn`` (``valid_from_lsn <= lsn`` and the
    version is still open at it).  Equals the LWW + hierarchical-delete
    state of the log prefix ``<= lsn`` (the SCD2 prefix property,
    proven in ``tests/test_property.py``), while snapshot
    :meth:`read_as_of` time travel is bounded by manifest retention.
    Same two-shuffle plan as the history; the lsn predicate prunes
    before the final projection.
    """
    h = scd2_history(changes, payload_cols)
    return h.where(
        (F.col("valid_from_lsn") <= F.lit(int(lsn)))
        & (F.col("valid_to_lsn").isNull() | (F.col("valid_to_lsn") > F.lit(int(lsn))))
    ).select(
        "conv_id",
        "turn_idx",
        *payload_cols,
        F.col("valid_from_lsn").alias("lsn"),
    )


def turn_runs(
    state: DataFrame,
    key,
    min_run: int = 2,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
) -> DataFrame:
    """Consecutive-run (gaps-and-islands) analysis over each
    conversation's turn order: maximal runs of turns sharing the same
    ``key`` value, filtered to runs of at least ``min_run``.

    The degenerate-generation detector for agent transcripts: with
    ``key`` = normalized text it finds looping assistants (the same
    reply emitted turn after turn — the repetition failure mode
    corpus-level dedup cannot see because each *document* is unique);
    with ``key`` = role it audits strict user/assistant alternation
    (two same-role turns in a row = a broken transcript assembly).

    Returns ``(conv_id, key, from_turn, to_turn, run_len)`` ordered
    deterministically.  ``key``: a column name or Column expression
    evaluated per turn; NULL keys compare null-safely (a run of NULLs
    is a run).

    Shape at scale: one shuffle on ``conv_col`` (the table's own
    bucket key, so reads off the transcript table are co-partitioned),
    two window passes over the same per-conversation sort (Spark plans
    one sort), one hash aggregation with map-side combine.  Runs are
    bounded by turns-per-conversation, never by corpus size.
    """
    k = key if not isinstance(key, str) else F.col(key)
    w = Window.partitionBy("conv_id").orderBy("_t")
    cum = (
        Window.partitionBy("conv_id")
        .orderBy("_t")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    new_run = (
        F.when(F.row_number().over(w) == 1, F.lit(1))
        .when(F.lag(F.col("_k")).over(w).eqNullSafe(F.col("_k")), F.lit(0))
        .otherwise(F.lit(1))
    )
    tagged = (
        state.select(
            F.col(conv_col).alias("conv_id"),
            F.col(order_col).alias("_t"),
            k.alias("_k"),
        )
        .withColumn("_run", F.sum(new_run).over(cum).cast("int"))
    )
    return (
        tagged.groupBy("conv_id", "_run")
        .agg(
            F.first("_k").alias("key"),
            F.min("_t").alias("from_turn"),
            F.max("_t").alias("to_turn"),
            F.count(F.lit(1)).cast("long").alias("run_len"),
        )
        .where(F.col("run_len") >= min_run)
        .select("conv_id", "key", "from_turn", "to_turn", "run_len")
        .orderBy("conv_id", "from_turn")
    )


def turn_latency(
    state: DataFrame,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-conversation inter-turn latency profile: the gap in seconds
    between consecutive turns' event times, aggregated per conversation
    — the agent-responsiveness view of a transcript corpus ("how long
    did each reply take", "which conversations stalled").

    Gaps are computed in TURN order using each turn's LWW-resolved
    timestamp, so a NEGATIVE gap is itself a signal: a later turn whose
    final write predates an earlier turn's (out-of-order edits — the
    auditable cousin of :func:`turn_runs`' loop detection).  Returns
    ``(conv_id, n_gaps, mean_gap_s, min_gap_s, max_gap_s)`` for every
    conversation with at least two timestamped turns; seconds carry
    microsecond precision, rounded to 6 dp for engine-reproducible
    values.

    Shape at scale: the same single conversation-key shuffle as every
    per-conv operator here (one window pass + one map-side-combined
    aggregation); cost bounded by turns-per-conversation.
    """
    from aqueduct_core_spark.functions.text import round6

    w = Window.partitionBy(conv_col).orderBy(order_col)
    gap = F.col(ts_col).cast("double") - F.lag(F.col(ts_col)).over(w).cast(
        "double"
    )
    per = state.select(F.col(conv_col).alias("conv_id"), gap.alias("_g")).where(
        F.col("_g").isNotNull()
    )
    return per.groupBy("conv_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_gaps"),
        round6(F.avg("_g")).alias("mean_gap_s"),
        round6(F.min("_g")).alias("min_gap_s"),
        round6(F.max("_g")).alias("max_gap_s"),
    )
