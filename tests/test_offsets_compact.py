"""Offsets-log compaction: the per-epoch bookkeeping files merge into
one without changing what ``read_offsets`` returns, and exactly-once
bookkeeping (manifest-summary epoch/lsn stamps) is untouched.

Scale rationale: a 10^10-event replay at 10^6-event triggers commits
~10^4 epochs — one tiny offsets parquet each.  Without compaction every
manifest lists (and every metrics read opens) all of them forever.
"""

import pandas as pd

from aqueduct_core_spark.catalog.table import ParquetTranscriptTable
from aqueduct_core_spark.config import EngineConfig
from aqueduct_core_spark.generator import generate_changes_pdf
from aqueduct_core_spark.operators.compact import compact_offsets, maintain
from aqueduct_core_spark.operators.merge import apply_batch
from aqueduct_core_spark.schema import CHANGES_SCHEMA


def to_spark(spark, pdf):
    pdf = pdf.copy()
    pdf["turn_idx"] = (
        pdf["turn_idx"].astype("object").where(pdf["turn_idx"].notna(), None)
    )
    return spark.createDataFrame(pdf, schema=CHANGES_SCHEMA)


def offsets_pdf(table) -> pd.DataFrame:
    return (
        table.read_offsets()
        .toPandas()
        .sort_values("epoch", ignore_index=True)
        .drop(columns=["committed_at"])  # wall-clock stamp, not content
    )


def replay_epochs(spark, table, cfg, n_epochs=8):
    pdf = generate_changes_pdf(30, seed=7)
    step = max(1, len(pdf) // n_epochs)
    for e in range(n_epochs):
        lo, hi = e * step, (e + 1) * step if e < n_epochs - 1 else len(pdf)
        apply_batch(table, to_spark(spark, pdf.iloc[lo:hi]), epoch=e, cfg=cfg)


def test_compact_offsets_preserves_content(spark, tmp_table_dir):
    cfg = EngineConfig(num_buckets=4, mor_fold_every=0)
    table = ParquetTranscriptTable.create(spark, tmp_table_dir, num_buckets=4)
    replay_epochs(spark, table, cfg, n_epochs=8)

    before = offsets_pdf(table)
    assert len(table.catalog.current()["offsets_files"]) == 8
    epoch_before = table.last_committed_epoch()
    lsn_before = table.last_committed_lsn()

    out = compact_offsets(table, keep_last=2)
    assert out["compacted"] == 6 and out["files"] == 3

    snap = table.catalog.current()
    assert len(snap["offsets_files"]) == 3
    pd.testing.assert_frame_equal(offsets_pdf(table), before)
    # exactly-once stamps ride the manifest summary, not these files
    assert table.last_committed_epoch() == epoch_before
    assert table.last_committed_lsn() == lsn_before

    # the log keeps appending normally after a compaction
    extra = generate_changes_pdf(5, seed=99)
    extra["lsn"] = extra["lsn"] + lsn_before + 1
    apply_batch(table, to_spark(spark, extra), epoch=8, cfg=cfg)
    assert len(table.catalog.current()["offsets_files"]) == 4
    assert len(offsets_pdf(table)) == 9

    # recompaction folds the previous merged file again: list stays O(keep)
    out2 = compact_offsets(table, keep_last=1)
    assert len(table.catalog.current()["offsets_files"]) == 2
    assert len(offsets_pdf(table)) == 9


def test_compact_offsets_noop_below_threshold(spark, tmp_table_dir):
    cfg = EngineConfig(num_buckets=4, mor_fold_every=0)
    table = ParquetTranscriptTable.create(spark, tmp_table_dir, num_buckets=4)
    replay_epochs(spark, table, cfg, n_epochs=3)
    v = table.catalog.current_version()
    out = compact_offsets(table, keep_last=4)
    assert out["compacted"] == 0
    assert table.catalog.current_version() == v  # no empty commit


def test_maintain_triggers_offsets_compaction(spark, tmp_table_dir):
    cfg = EngineConfig(num_buckets=4, mor_fold_every=0)
    table = ParquetTranscriptTable.create(spark, tmp_table_dir, num_buckets=4)
    replay_epochs(spark, table, cfg, n_epochs=8)
    before = offsets_pdf(table)
    out = maintain(table, compact_offsets_if_files=4, keep_snapshots=50)
    assert out["offsets"]["compacted"] > 0
    assert len(table.catalog.current()["offsets_files"]) <= 8
    pd.testing.assert_frame_equal(offsets_pdf(table), before)
