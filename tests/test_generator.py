"""Generator determinism + FIXTURES.md §2 invariants."""

import pandas as pd

from aqueduct_core_spark.generator import (
    consistency_sum_pdf,
    expected_state_pdf,
    generate_changes_pdf,
)


def test_deterministic():
    a = generate_changes_pdf(30, seed=42)
    b = generate_changes_pdf(30, seed=42)
    pd.testing.assert_frame_equal(a, b)
    c = generate_changes_pdf(30, seed=7)
    assert not a.equals(c)


def test_lsn_unique_and_sorted():
    df = generate_changes_pdf(50)
    assert df["lsn"].is_unique
    assert df["lsn"].is_monotonic_increasing


def test_ops_and_hierarchy():
    df = generate_changes_pdf(200)
    assert set(df["op"].unique()) == {"I", "U", "D"}
    # conversation-level metadata event precedes every turn event
    conv_meta = df[df["turn_idx"].isna() & (df["op"] == "I")].groupby("conv_id")["lsn"].min()
    first_turn = df[df["turn_idx"].notna()].groupby("conv_id")["lsn"].min()
    joined = pd.concat([conv_meta.rename("meta"), first_turn.rename("turn")], axis=1).dropna()
    assert (joined["meta"] < joined["turn"]).all()


def test_hot_conversations_exist():
    df = generate_changes_pdf(200, hot_fraction=0.01)
    per_conv = df.groupby("conv_id").size()
    assert per_conv.max() > 20 * per_conv.median()


def test_oracle_reducer_basic():
    # hand-built log: I, U (wins), D on another key, conv delete + rebirth
    rows = [
        # lsn op conv turn role text
        (1, "I", "c1", None, None, "meta"),
        (2, "I", "c1", 0, "user", "v0"),
        (3, "U", "c1", 0, "user", "v1"),
        (4, "I", "c1", 1, "assistant", "a0"),
        (5, "D", "c1", 1, None, None),
        (6, "I", "c2", None, None, "meta"),
        (7, "I", "c2", 0, "user", "x0"),
        (8, "D", "c2", None, None, None),   # conv-level delete kills lsn<=8
        (9, "I", "c2", 1, "user", "post"),  # survives (lsn > 8)
    ]
    pdf = pd.DataFrame(rows, columns=["lsn", "op", "conv_id", "turn_idx", "role", "text"])
    pdf["tool"] = None
    pdf["ts"] = pd.to_datetime(pdf["lsn"], unit="s")
    pdf["turn_idx"] = pdf["turn_idx"].astype("Int32")
    state = expected_state_pdf(pdf)
    got = {(r.conv_id, r.turn_idx): r.text for r in state.itertuples()}
    assert got == {("c1", 0): "v1", ("c2", 1): "post"}
    assert consistency_sum_pdf(pdf) == 3 + 9
