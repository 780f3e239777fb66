"""Snapshot rollback: undo a bad epoch, then converge by re-replay.

The rollback commit must (a) restore the target version's state
bit-for-bit, (b) revert the exactly-once epoch/lsn stamp so replay
resumes from the rolled-back watermark, and (c) leave history intact —
the undone snapshots stay readable until expired.
"""

import pyspark.sql.functions as F
import pytest

from aqueduct_core_spark.catalog.table import ParquetTranscriptTable
from aqueduct_core_spark.config import EngineConfig
from aqueduct_core_spark.generator import generate_changes
from aqueduct_core_spark.streaming.pipeline import replay
from aqueduct_core_spark.verify import state_digest


def _rows(df):
    return sorted(map(tuple, df.collect()))


@pytest.fixture()
def two_epoch_table(spark, tmp_path):
    root = str(tmp_path / "transcripts")
    table = ParquetTranscriptTable.create(spark, root, num_buckets=8)
    log = generate_changes(spark, n_convs=120, seed=21)
    split = int(log.agg(F.max("lsn")).collect()[0][0]) // 2
    cfg = EngineConfig(num_buckets=8)
    replay(table, log.where(F.col("lsn") < split), cfg,
           start_epoch=0, start_lsn=0, lsn_bounds=(0, split - 1))
    v_good = table.catalog.current_version()
    replay(table, log.where(F.col("lsn") >= split), cfg)
    return table, log, split, v_good


def test_rollback_restores_state_and_watermark(spark, two_epoch_table):
    table, log, split, v_good = two_epoch_table
    v_bad = table.catalog.current_version()
    assert v_bad > v_good

    good_rows = _rows(table.read_as_of(v_good))
    good_epoch = int(table.catalog.load(v_good)["summary"]["aqueduct.epoch"])
    good_lsn = int(table.catalog.load(v_good)["summary"]["aqueduct.max-lsn"])

    snap = table.rollback(v_good)
    # a NEW version, not a pointer rewind: history stays readable
    assert snap["snapshot_id"] == v_bad + 1
    assert _rows(table.read()) == good_rows
    assert table.last_committed_epoch() == good_epoch
    assert table.last_committed_lsn() == good_lsn
    assert _rows(table.read_as_of(v_bad)) != good_rows  # undone, still readable


def test_replay_after_rollback_converges(spark, two_epoch_table):
    table, log, split, v_good = two_epoch_table
    final_digest = state_digest(table.read_internal())

    table.rollback(v_good)
    # resume replay of the undone range from the reverted watermark
    replay(table, log.where(F.col("lsn") >= split), EngineConfig(num_buckets=8))
    assert state_digest(table.read_internal()) == final_digest


def test_rollback_offsets_revert(spark, two_epoch_table):
    table, log, split, v_good = two_epoch_table
    n_offsets_bad = table.read_offsets().count()
    table.rollback(v_good)
    assert table.read_offsets().count() < n_offsets_bad


def test_snapshots_metadata_table(spark, two_epoch_table):
    table, log, split, v_good = two_epoch_table
    v_bad = table.catalog.current_version()
    table.rollback(v_good)

    snaps = {r["version"]: r for r in table.snapshots().collect()}
    assert set(snaps) == set(table.catalog.history())
    cur = snaps[table.catalog.current_version()]
    assert cur["parent"] == v_bad
    assert cur["rollback_to"] == v_good
    assert cur["epoch"] == snaps[v_good]["epoch"]
    assert cur["max_lsn"] == snaps[v_good]["max_lsn"]
    # lineage chains: every non-root parent is a retained version
    for r in snaps.values():
        assert r["parent"] is None or r["parent"] in snaps
