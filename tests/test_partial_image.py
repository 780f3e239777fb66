"""Patch-semantics LWW (partial row images): latest non-null per column,
tombstones reset the patch history."""

import datetime as dt

from aqueduct_core_spark.operators.lww import partial_merged_state


def _changes(spark, rows):
    """rows: (lsn, op, conv, turn, role, text, tool)"""
    data = [
        (lsn, op, conv, turn, role, text, tool, dt.datetime(2026, 1, 1, 0, 0, lsn % 60))
        for (lsn, op, conv, turn, role, text, tool) in rows
    ]
    return spark.createDataFrame(
        data,
        "lsn long, op string, conv_id string, turn_idx int, "
        "role string, text string, tool string, ts timestamp",
    )


def _state(df):
    return {
        (r["conv_id"], r["turn_idx"]): (r["role"], r["text"], r["tool"])
        for r in df.collect()
    }


def test_latest_non_null_per_column(spark):
    c = _changes(
        spark,
        [
            (1, "I", "c1", 0, "user", "hello", None),
            (2, "U", "c1", 0, None, "hello v2", None),   # patches text only
            (3, "U", "c1", 0, "assistant", None, None),  # patches role only
            (4, "U", "c1", 0, None, None, "search"),     # patches tool only
        ],
    )
    got = _state(partial_merged_state(c))
    # each column keeps its own latest non-null write
    assert got == {("c1", 0): ("assistant", "hello v2", "search")}


def test_delete_resets_patch_history(spark):
    c = _changes(
        spark,
        [
            (1, "I", "c1", 0, "user", "secret", "tool-a"),
            (2, "D", "c1", 0, None, None, None),          # turn tombstone
            (3, "I", "c1", 0, None, "fresh", None),       # re-insert, partial
        ],
    )
    got = _state(partial_merged_state(c))
    # role/tool must NOT resurrect from before the delete
    assert got == {("c1", 0): (None, "fresh", None)}


def test_tombstone_last_kills_row(spark):
    c = _changes(
        spark,
        [
            (1, "I", "c1", 0, "user", "hi", None),
            (2, "D", "c1", 0, None, None, None),
        ],
    )
    assert partial_merged_state(c).count() == 0


def test_conversation_delete_watermark(spark):
    c = _changes(
        spark,
        [
            (1, "I", "c1", 0, "user", "old", "t"),
            (2, "D", "c1", None, None, None, None),       # conv-level delete
            (3, "U", "c1", 0, None, "new", None),         # survives (> watermark)
            (4, "I", "c1", 1, "user", "gone", None),      # wait: lsn 4 > 2, alive
        ],
    )
    got = _state(partial_merged_state(c))
    # turn 0: only post-watermark writes contribute — role/tool dead
    assert got[("c1", 0)] == (None, "new", None)
    assert got[("c1", 1)] == ("user", "gone", None)


def test_winner_lsn_and_ts_are_row_level(spark):
    c = _changes(
        spark,
        [
            (1, "I", "c1", 0, "user", "a", None),
            (5, "U", "c1", 0, None, "b", None),
        ],
    )
    row = partial_merged_state(c).collect()[0]
    assert row["lsn"] == 5
    assert row["ts"].second == 5  # the latest write's ts, not a coalesce
