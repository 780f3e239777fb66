"""Snapshot bootstrap + overlapping live tail (the classic CDC initial
load): a table seeded from another table's state snapshot, then tailed
from an lsn BEFORE the snapshot point, must converge to exactly the
full-replay state — LWW by lsn makes the overlap idempotent."""

from pyspark.sql import functions as F

from aqueduct_core_spark.catalog.table import ParquetTranscriptTable
from aqueduct_core_spark.config import EngineConfig
from aqueduct_core_spark.generator import generate_changes
from aqueduct_core_spark.streaming.pipeline import (
    bootstrap_from_state,
    replay,
    resume_lsn,
)
from aqueduct_core_spark.verify import state_digest, states_equal


def test_bootstrap_plus_overlapping_tail_converges(spark, tmp_path):
    cfg = EngineConfig(num_buckets=4, mor_fold_every=10**9)
    changes = generate_changes(spark, n_convs=80, seed=33).cache()
    max_lsn = int(changes.agg(F.max("lsn")).collect()[0][0])
    snap_at = int(max_lsn * 0.6)
    overlap_from = int(max_lsn * 0.4)  # tail starts BEFORE the snapshot

    # source of truth: full replay
    truth = ParquetTranscriptTable.create(spark, str(tmp_path / "truth"), num_buckets=4)
    replay(truth, changes, cfg, start_epoch=0, start_lsn=0,
           lsn_bounds=(0, max_lsn))

    # upstream at snapshot time
    upstream = ParquetTranscriptTable.create(spark, str(tmp_path / "up"), num_buckets=4)
    replay(upstream, changes.where(F.col("lsn") <= snap_at), cfg,
           start_epoch=0, start_lsn=0, lsn_bounds=(0, snap_at))

    # bootstrap a new replica from the snapshot, tail with overlap
    replica = ParquetTranscriptTable.create(spark, str(tmp_path / "rep"), num_buckets=4)
    m = bootstrap_from_state(replica, upstream.read_internal(), cfg)
    assert m["bootstrap_as_of_lsn"] <= snap_at
    assert resume_lsn(replica) == m["bootstrap_as_of_lsn"] + 1
    assert state_digest(replica.read()) == state_digest(upstream.read())

    replay(replica, changes.where(F.col("lsn") >= overlap_from), cfg,
           start_lsn=overlap_from, lsn_bounds=(overlap_from, max_lsn))
    assert states_equal(replica.read_internal(), truth.read_internal())
    changes.unpersist()


def test_bootstrap_empty_snapshot(spark, tmp_path):
    cfg = EngineConfig(num_buckets=4)
    empty_src = ParquetTranscriptTable.create(spark, str(tmp_path / "e"), num_buckets=4)
    replica = ParquetTranscriptTable.create(spark, str(tmp_path / "r"), num_buckets=4)
    m = bootstrap_from_state(replica, empty_src.read_internal(), cfg)
    assert m["bootstrap_as_of_lsn"] == -1
    assert resume_lsn(replica) == 0
