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
    """A batch touching one conversation must not rewrite unrelated buckets."""
    cfg = EngineConfig(num_buckets=8)
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
