"""Snapshot backup/restore: pinned export, in-place read, resume-after-
restore convergence under exactly-once replay."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from aqueduct_core_spark.catalog.backup import export_snapshot, restore_snapshot
from aqueduct_core_spark.catalog.table import ParquetTranscriptTable
from aqueduct_core_spark.config import EngineConfig
from aqueduct_core_spark.generator import generate_changes
from aqueduct_core_spark.streaming.pipeline import replay
from aqueduct_core_spark.verify import state_digest, states_equal


def test_backup_restore_resumes_exactly_once(spark, tmp_path):
    cfg = EngineConfig(num_buckets=4, max_events_per_trigger=500)
    log = generate_changes(spark, n_convs=40, seed=54).cache()
    mx = int(log.agg(F.max("lsn")).collect()[0][0])

    primary = ParquetTranscriptTable.create(spark, str(tmp_path / "p"), num_buckets=4)
    replay(primary, log.where(F.col("lsn") < mx // 2), cfg, start_epoch=0, start_lsn=0)

    out = export_snapshot(primary, str(tmp_path / "bk"))
    assert out["files"] > 0 and out["bytes"] > 0
    mid_digest = state_digest(primary.read_internal())

    # primary moves on; the backup stays pinned at the export point
    replay(primary, log.where(F.col("lsn") >= mx // 2), cfg)
    assert state_digest(primary.read_internal()) != mid_digest

    # a backup is a readable table directory as-is (no import step)
    bk = ParquetTranscriptTable.load(spark, str(tmp_path / "bk"))
    assert state_digest(bk.read_internal()) == mid_digest

    # disaster: primary destroyed -> restore -> resume the SAME full log;
    # applied epochs skip idempotently and the state converges
    control = primary.read_internal().cache()
    control.count()
    shutil.rmtree(str(tmp_path / "p"))
    restored = restore_snapshot(spark, str(tmp_path / "bk"), str(tmp_path / "p2"))
    assert state_digest(restored.read_internal()) == mid_digest
    replay(restored, log, cfg)  # resumes from the backup's lsn watermark
    assert states_equal(restored.read_internal(), control)
    control.unpersist()
    log.unpersist()


def test_export_pins_an_older_version(spark, tmp_path):
    cfg = EngineConfig(num_buckets=4, max_events_per_trigger=10**9)
    log = generate_changes(spark, n_convs=20, seed=55).cache()
    mx = int(log.agg(F.max("lsn")).collect()[0][0])
    t = ParquetTranscriptTable.create(spark, str(tmp_path / "t"), num_buckets=4)
    replay(t, log.where(F.col("lsn") < mx // 2), cfg, start_epoch=0, start_lsn=0)
    v_mid = t.catalog.current_version()
    d_mid = state_digest(t.read_internal())
    replay(t, log, cfg)

    export_snapshot(t, str(tmp_path / "bk-old"), version=v_mid)
    old = ParquetTranscriptTable.load(spark, str(tmp_path / "bk-old"))
    assert state_digest(old.read_internal()) == d_mid
    log.unpersist()


def test_export_fails_loud_on_missing_files_and_busy_dest(spark, tmp_path):
    cfg = EngineConfig(num_buckets=4, max_events_per_trigger=10**9)
    log = generate_changes(spark, n_convs=10, seed=56)
    t = ParquetTranscriptTable.create(spark, str(tmp_path / "t"), num_buckets=4)
    replay(t, log, cfg, start_epoch=0, start_lsn=0)

    export_snapshot(t, str(tmp_path / "bk"))
    with pytest.raises(ValueError, match="already holds"):
        export_snapshot(t, str(tmp_path / "bk"))
    with pytest.raises(ValueError, match="already holds"):
        restore_snapshot(spark, str(tmp_path / "bk"), str(t.root))

    # corrupt the source: a referenced file vanishes -> export aborts
    snap = t.catalog.current()
    pools = list(snap["files"].values()) + list(snap["delta_files"].values())
    victim = os.path.join(t.root, next(fl for fl in pools if fl)[0])
    os.remove(victim)
    with pytest.raises(FileNotFoundError, match="backup aborted"):
        export_snapshot(t, str(tmp_path / "bk2"))
    # the aborted export left no VERSION -> not restorable
    with pytest.raises(FileNotFoundError, match="not a completed backup"):
        restore_snapshot(spark, str(tmp_path / "bk2"), str(tmp_path / "t2"))
