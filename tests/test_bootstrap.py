"""Snapshot bootstrap + overlapping live tail (the classic CDC initial
load): a table seeded from another table's state snapshot, then tailed
from an lsn BEFORE the snapshot point, must converge to exactly the
full-replay state — LWW by lsn makes the overlap idempotent."""

from pyspark.sql import functions as F

from aqueduct_core_spark.catalog.table import ParquetTranscriptTable
from aqueduct_core_spark.config import EngineConfig
from aqueduct_core_spark.generator import generate_changes
from aqueduct_core_spark.streaming.pipeline import (
    IncompleteBootstrap,
    bootstrap_chunked,
    bootstrap_from_state,
    bootstrap_incomplete,
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


def test_chunked_bootstrap_matches_one_shot(spark, tmp_path):
    cfg = EngineConfig(num_buckets=4, mor_fold_every=10**9)
    changes = generate_changes(spark, n_convs=60, seed=34).cache()
    upstream = ParquetTranscriptTable.create(spark, str(tmp_path / "up"), num_buckets=4)
    replay(upstream, changes, cfg, start_epoch=0, start_lsn=0)

    replica = ParquetTranscriptTable.create(spark, str(tmp_path / "rep"), num_buckets=4)
    r = bootstrap_chunked(replica, upstream.read_internal(), cfg, n_chunks=4)
    assert r["complete"] and r["chunks_applied"] == 4
    assert not bootstrap_incomplete(replica)
    assert state_digest(replica.read()) == state_digest(upstream.read())
    # same watermark contract as the one-shot path
    assert resume_lsn(replica) == r["as_of_lsn"] + 1
    # as_of = max SURVIVING row lsn — it may trail the upstream
    # watermark (trailing tombstones leave no row); the tail then
    # re-delivers those events, which LWW makes idempotent
    assert r["as_of_lsn"] <= upstream.last_committed_lsn()
    # idempotent once complete
    again = bootstrap_chunked(replica, upstream.read_internal(), cfg, n_chunks=4)
    assert again["complete"] and again["chunks_applied"] == 0
    changes.unpersist()


def test_chunked_bootstrap_crash_resume_and_guards(spark, tmp_path):
    cfg = EngineConfig(num_buckets=4, mor_fold_every=10**9)
    changes = generate_changes(spark, n_convs=60, seed=35).cache()
    upstream = ParquetTranscriptTable.create(spark, str(tmp_path / "up"), num_buckets=4)
    replay(upstream, changes, cfg, start_epoch=0, start_lsn=0)
    snap = upstream.read_internal()

    replica = ParquetTranscriptTable.create(spark, str(tmp_path / "rep"), num_buckets=4)
    r = bootstrap_chunked(replica, snap, cfg, n_chunks=5, max_chunks=2)
    assert not r["complete"] and r["next_chunk"] == 2
    assert bootstrap_incomplete(replica)
    # the half-bootstrapped watermark must not feed a tail
    import pytest

    with pytest.raises(IncompleteBootstrap):
        resume_lsn(replica)
    # chunk-count drift on resume fails loud
    with pytest.raises(ValueError, match="n_chunks"):
        bootstrap_chunked(replica, snap, cfg, n_chunks=8)
    # resume (same params) picks up at chunk 2 and completes
    r2 = bootstrap_chunked(replica, snap, cfg, n_chunks=5)
    assert r2["complete"] and r2["chunks_applied"] == 3
    assert state_digest(replica.read()) == state_digest(upstream.read())
    assert resume_lsn(replica) == r2["as_of_lsn"] + 1
    changes.unpersist()


def test_chunked_bootstrap_interleaved_tail_converges(spark, tmp_path):
    """DBLog-style interleaving: log slices applied BETWEEN snapshot
    chunks; LWW-by-lsn makes the application order irrelevant and the
    final state equals the full replay."""
    cfg = EngineConfig(num_buckets=4, mor_fold_every=10**9)
    changes = generate_changes(spark, n_convs=80, seed=36).cache()
    max_lsn = int(changes.agg(F.max("lsn")).collect()[0][0])
    snap_at = int(max_lsn * 0.6)

    truth = ParquetTranscriptTable.create(spark, str(tmp_path / "truth"), num_buckets=4)
    replay(truth, changes, cfg, start_epoch=0, start_lsn=0, lsn_bounds=(0, max_lsn))

    upstream = ParquetTranscriptTable.create(spark, str(tmp_path / "up"), num_buckets=4)
    replay(upstream, changes.where(F.col("lsn") <= snap_at), cfg,
           start_epoch=0, start_lsn=0, lsn_bounds=(0, snap_at))
    snap = upstream.read_internal()

    replica = ParquetTranscriptTable.create(spark, str(tmp_path / "rep"), num_buckets=4)
    # chunk, tail slice, chunk, tail slice, final chunk
    mid = (snap_at + 1 + max_lsn) // 2
    r = bootstrap_chunked(replica, snap, cfg, n_chunks=3, max_chunks=1)
    replay(replica, changes, cfg, start_lsn=snap_at + 1, end_lsn=mid,
           lsn_bounds=(snap_at + 1, mid))
    r = bootstrap_chunked(replica, snap, cfg, n_chunks=3, max_chunks=1)
    replay(replica, changes, cfg, start_lsn=mid + 1, end_lsn=max_lsn,
           lsn_bounds=(mid + 1, max_lsn))
    r = bootstrap_chunked(replica, snap, cfg, n_chunks=3)
    assert r["complete"]
    # the interleaved tail advanced the watermark past as_of; nothing
    # re-reads the tail range
    assert resume_lsn(replica) == max_lsn + 1
    assert states_equal(replica.read_internal(), truth.read_internal())
    changes.unpersist()


def test_chunked_bootstrap_empty_chunks_advance(spark, tmp_path):
    """More chunks than conversations: empty chunks must still commit
    progress, or completion would never be reached."""
    cfg = EngineConfig(num_buckets=2, mor_fold_every=10**9)
    changes = generate_changes(spark, n_convs=3, seed=37)
    upstream = ParquetTranscriptTable.create(spark, str(tmp_path / "up"), num_buckets=2)
    replay(upstream, changes, cfg, start_epoch=0, start_lsn=0)

    replica = ParquetTranscriptTable.create(spark, str(tmp_path / "rep"), num_buckets=2)
    r = bootstrap_chunked(replica, upstream.read_internal(), cfg, n_chunks=16)
    assert r["complete"] and r["chunks_applied"] == 16
    assert state_digest(replica.read()) == state_digest(upstream.read())
    assert resume_lsn(replica) == r["as_of_lsn"] + 1


def test_bootstrap_empty_snapshot(spark, tmp_path):
    cfg = EngineConfig(num_buckets=4)
    empty_src = ParquetTranscriptTable.create(spark, str(tmp_path / "e"), num_buckets=4)
    replica = ParquetTranscriptTable.create(spark, str(tmp_path / "r"), num_buckets=4)
    m = bootstrap_from_state(replica, empty_src.read_internal(), cfg)
    assert m["bootstrap_as_of_lsn"] == -1
    assert resume_lsn(replica) == 0
