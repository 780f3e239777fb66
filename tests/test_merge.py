"""End-to-end replay: change log → apply_batch loop → final state equals
the independent pandas oracle (FIXTURES.md §4; mirrors the reference's
replay-to-final-state specs SQLiteStorageIntegrationSpec.groovy:696-907).
"""

import pandas as pd
import pytest

from aqueduct_core_spark.catalog.table import ParquetTranscriptTable
from aqueduct_core_spark.config import EngineConfig
from aqueduct_core_spark.generator import expected_state_pdf, generate_changes_pdf
from aqueduct_core_spark.operators.merge import apply_batch
from aqueduct_core_spark.schema import CHANGES_SCHEMA, LSN_COLUMN


def to_spark(spark, pdf):
    pdf = pdf.copy()
    pdf["turn_idx"] = pdf["turn_idx"].astype("object").where(pdf["turn_idx"].notna(), None)
    return spark.createDataFrame(pdf, schema=CHANGES_SCHEMA)


def final_state_pdf(table):
    out = table.read_internal().toPandas()
    return out.sort_values(["conv_id", "turn_idx", "ts"], ignore_index=True)


def assert_state_equal(got: pd.DataFrame, exp: pd.DataFrame):
    exp = exp.reset_index(drop=True)
    got = got.reset_index(drop=True)
    assert len(got) == len(exp), f"row count {len(got)} != {len(exp)}"
    for col in ["conv_id", "turn_idx", "role", "text", "tool", "_lsn"]:
        pd.testing.assert_series_equal(
            got[col].reset_index(drop=True),
            exp[col].rename(col).reset_index(drop=True),
            check_dtype=False,
            obj=col,
        )
    got_ts = pd.to_datetime(got["ts"]).dt.floor("us").reset_index(drop=True)
    exp_ts = pd.to_datetime(exp["ts"]).dt.floor("us").reset_index(drop=True)
    assert (got_ts == exp_ts).all()


@pytest.fixture()
def changes_pdf():
    return generate_changes_pdf(40, seed=42, hot_fraction=0.05)


def test_single_batch_replay(spark, tmp_table_dir, changes_pdf):
    cfg = EngineConfig(num_buckets=8, salt_buckets=4)
    table = ParquetTranscriptTable.create(spark, tmp_table_dir, num_buckets=8)
    m = apply_batch(table, to_spark(spark, changes_pdf), epoch=0, cfg=cfg)
    assert m["state"] == "UP_TO_DATE"
    assert m["last_lsn"] == int(changes_pdf["lsn"].max())
    assert_state_equal(final_state_pdf(table), expected_state_pdf(changes_pdf))


def test_multi_batch_replay_matches_oracle(spark, tmp_table_dir, changes_pdf):
    cfg = EngineConfig(num_buckets=8, salt_buckets=4)
    table = ParquetTranscriptTable.create(spark, tmp_table_dir, num_buckets=8)
    # cut at arbitrary row positions so conversations straddle batches
    n = len(changes_pdf)
    cuts = [0, n // 4 + 3, n // 2 + 7, 3 * n // 4 + 1, n]
    for e, (a, b) in enumerate(zip(cuts, cuts[1:])):
        apply_batch(table, to_spark(spark, changes_pdf.iloc[a:b]), epoch=e, cfg=cfg)
    assert_state_equal(final_state_pdf(table), expected_state_pdf(changes_pdf))
    # offsets bookkeeping: one row per epoch, monotone last_lsn
    off = table.read_offsets().toPandas().sort_values("epoch")
    assert list(off["epoch"]) == [0, 1, 2, 3]
    assert off["last_lsn"].is_monotonic_increasing


def test_duplicate_epoch_is_idempotent(spark, tmp_table_dir, changes_pdf):
    cfg = EngineConfig(num_buckets=8, salt_buckets=0)
    table = ParquetTranscriptTable.create(spark, tmp_table_dir, num_buckets=8)
    n = len(changes_pdf)
    first, second = changes_pdf.iloc[: n // 2], changes_pdf.iloc[n // 2 :]
    apply_batch(table, to_spark(spark, first), epoch=0, cfg=cfg)
    apply_batch(table, to_spark(spark, second), epoch=1, cfg=cfg)
    v_before = table.catalog.current_version()
    # exact re-delivery of epoch 1 (crash-replay) → clean skip, no new snapshot
    m = apply_batch(table, to_spark(spark, second), epoch=1, cfg=cfg)
    assert m["state"] == "SKIPPED_DUPLICATE_EPOCH"
    assert table.catalog.current_version() == v_before
    assert_state_equal(final_state_pdf(table), expected_state_pdf(changes_pdf))


def test_merge_prunes_buckets(spark, tmp_table_dir, changes_pdf):
    """Staged strategy: a batch touching one conversation must not
    rewrite unrelated buckets (inline trades pruning for one-job
    epochs and rewrites the full layout)."""
    cfg = EngineConfig(num_buckets=8, merge_strategy="staged")
    table = ParquetTranscriptTable.create(spark, tmp_table_dir, num_buckets=8)
    apply_batch(table, to_spark(spark, changes_pdf), epoch=0, cfg=cfg)
    snap0 = table.catalog.current()

    one_conv = changes_pdf[changes_pdf["conv_id"] == "conv-00000003"].copy()
    one_conv["lsn"] = one_conv["lsn"] + 10_000_000
    one_conv["op"] = "U"
    one_conv = one_conv[one_conv["turn_idx"].notna()]
    apply_batch(table, to_spark(spark, one_conv), epoch=1, cfg=cfg)
    snap1 = table.catalog.current()

    changed = [b for b in snap0["files"] if snap0["files"][b] != snap1["files"].get(b)]
    assert len(changed) == 1  # exactly the conversation's bucket


def test_window_vs_agg_lww_parity(spark, changes_pdf):
    from aqueduct_core_spark.operators import lww

    df = to_spark(spark, changes_pdf)
    turns, _ = lww.split_hierarchy(df)
    payload = ["role", "text", "tool", "ts"]
    a = lww.argmax_winners(turns, payload).select("conv_id", "turn_idx", LSN_COLUMN)
    b = lww.lww_dedup_window(turns).select("conv_id", "turn_idx", "lsn")
    assert a.count() == b.count()
    assert a.join(b, (a.conv_id == b.conv_id) & (a.turn_idx == b.turn_idx) & (a[LSN_COLUMN] == b.lsn)).count() == a.count()


def test_inline_vs_staged_equivalence(spark, tmp_path, changes_pdf):
    """Both merge strategies must converge to the identical final state
    (inline = one-job full-layout commit; staged = bucket-pruned)."""
    states = {}
    for strategy in ("mor", "inline", "staged"):
        cfg = EngineConfig(num_buckets=8, merge_strategy=strategy)
        table = ParquetTranscriptTable.create(
            spark, str(tmp_path / strategy), num_buckets=8
        )
        df = to_spark(spark, changes_pdf)
        n = len(changes_pdf)
        cut = int(changes_pdf["lsn"].iloc[n // 2])
        from pyspark.sql import functions as F

        apply_batch(table, df.where(F.col("lsn") <= cut), epoch=0, cfg=cfg)
        apply_batch(table, df.where(F.col("lsn") > cut), epoch=1, cfg=cfg)
        states[strategy] = final_state_pdf(table)
    assert_state_equal(states["inline"], states["staged"])
    assert_state_equal(states["inline"], states["mor"])
    assert_state_equal(states["inline"], expected_state_pdf(changes_pdf))


def test_mor_fold(spark, tmp_table_dir, changes_pdf):
    """MOR deltas fold into the base after mor_fold_every epochs; the
    resolved state is identical before and after the fold."""
    cfg = EngineConfig(num_buckets=8, merge_strategy="mor", mor_fold_every=2)
    table = ParquetTranscriptTable.create(spark, tmp_table_dir, num_buckets=8)
    df = to_spark(spark, changes_pdf)
    cut = int(changes_pdf["lsn"].iloc[len(changes_pdf) // 2])
    from pyspark.sql import functions as F

    m0 = apply_batch(table, df.where(F.col("lsn") <= cut), epoch=0, cfg=cfg)
    assert not m0.get("folded")
    snap = table.catalog.current()
    assert any(snap["delta_files"].values()) and not any(snap["files"].values())

    m1 = apply_batch(table, df.where(F.col("lsn") > cut), epoch=1, cfg=cfg)
    assert m1.get("folded")
    snap = table.catalog.current()
    assert not any(snap["delta_files"].values()) and any(snap["files"].values())
    assert_state_equal(final_state_pdf(table), expected_state_pdf(changes_pdf))
