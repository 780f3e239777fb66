"""Regression tests for the core-path review findings: WAP empty-epoch
and crash-recovery behavior, version-pinned schemas, feed-across-fold,
and bootstrap schema-evolution carry-through."""

import os

import pyspark.sql.functions as F
import pytest

from aqueduct_core_spark.catalog.snapshot import CommitConflict
from aqueduct_core_spark.catalog.table import ParquetTranscriptTable
from aqueduct_core_spark.config import EngineConfig
from aqueduct_core_spark.generator import generate_changes
from aqueduct_core_spark.operators.compact import fold_deltas
from aqueduct_core_spark.operators.merge import apply_audited, apply_batch
from aqueduct_core_spark.streaming.feed import FeedCursor
from aqueduct_core_spark.streaming.pipeline import replay


N_BUCKETS = 4


def _table(spark, tmp_path, name="t"):
    return ParquetTranscriptTable.create(
        spark, str(tmp_path / name), num_buckets=N_BUCKETS
    )


def _cfg():
    return EngineConfig(num_buckets=N_BUCKETS, max_events_per_trigger=10**9)


def test_apply_audited_empty_batch_does_not_crash(spark, tmp_path):
    """An idle/empty trigger stages nothing; publish(None)/abandon(None)
    must never run — the stream died on a harmless empty batch."""
    table = _table(spark, tmp_path)
    log = generate_changes(spark, n_convs=10, seed=1)
    replay(table, log, _cfg())
    v0 = table.catalog.current_version()

    empty = log.where(F.lit(False))
    m = apply_audited(table, empty, epoch=999, cfg=_cfg(),
                      audits={"nonempty": lambda df: True})
    assert m["published"] is False and m["audit_failures"] == []
    assert table.catalog.current_version() == v0  # nothing committed


def test_time_travel_reads_pinned_schema(spark, tmp_path):
    """A read at a pre-evolution version must not grow a phantom all-null
    column from the CURRENT schema."""
    table = _table(spark, tmp_path)
    log = generate_changes(spark, n_convs=10, seed=2)
    replay(table, log, _cfg())
    v1 = table.catalog.current_version()

    evolved = (
        generate_changes(spark, n_convs=10, seed=3)
        .withColumn("lsn", F.col("lsn") + 10**7)
        .withColumn("model", F.lit("m-1"))
    )
    apply_batch(table, evolved, epoch=99, cfg=_cfg())
    assert "model" in table.read().columns
    assert "model" not in table.read_as_of(v1).columns
    assert "model" not in table.read_internal(version=v1).columns


def test_wap_audit_sees_staged_epochs_added_column(spark, tmp_path):
    """The audit reads the STAGED snapshot — including a column the
    staged epoch itself added (current-schema reads hid it)."""
    table = _table(spark, tmp_path)
    log = generate_changes(spark, n_convs=10, seed=4)
    replay(table, log, _cfg())

    seen = {}

    def audit(df):
        seen["cols"] = df.columns
        return "model" in df.columns and df.where(
            F.col("model").isNotNull()).count() > 0

    evolved = (
        generate_changes(spark, n_convs=5, seed=5)
        .withColumn("lsn", F.col("lsn") + 10**7)
        .withColumn("model", F.lit("m-2"))
    )
    m = apply_audited(table, evolved, epoch=50, cfg=_cfg(),
                      audits={"model_present": audit})
    assert m["published"] is True and m["audit_failures"] == []
    assert "model" in seen["cols"]


def test_feed_crosses_fold_when_caught_up(spark, tmp_path):
    """A caught-up consumer keeps tailing across a scheduled fold
    instead of being forced into a full resync every mor_fold_every
    epochs (the fold guard rejected every post-fold interval)."""
    table = _table(spark, tmp_path)
    log = generate_changes(spark, n_convs=30, seed=6).cache()
    mx = int(log.agg(F.max("lsn")).collect()[0][0])
    first = log.where(F.col("lsn") <= mx // 2)
    second = log.where(F.col("lsn") > mx // 2)

    replay(table, first, _cfg())
    cur = FeedCursor(table)  # caught up at the pre-fold head
    assert cur.poll() is None

    assert fold_deltas(table, consumers=[cur])["folded"] is True
    replay(table, second, _cfg(),
           start_epoch=table.last_committed_epoch() + 1,
           start_lsn=table.last_committed_lsn() + 1)

    feed = cur.poll()  # must NOT raise
    assert feed is not None
    # the feed carries exactly the post-fold epoch's winners: every
    # lsn it reports is from the second half
    lsns = [r[0] for r in feed.select("_lsn").distinct().collect()]
    assert lsns and all(l > mx // 2 for l in lsns)
    cur.commit()
    assert cur.poll() is None


def test_feed_still_raises_across_fold_consuming_unseen_deltas(spark, tmp_path):
    """A consumer that lagged past a fold (the fold folded deltas it
    never saw) must still fail loud, not silently under-report."""
    table = _table(spark, tmp_path)
    log = generate_changes(spark, n_convs=30, seed=7).cache()
    mx = int(log.agg(F.max("lsn")).collect()[0][0])

    replay(table, log.where(F.col("lsn") <= mx // 2), _cfg())
    cur = FeedCursor(table)  # acked at pre-second-epoch head
    replay(table, log.where(F.col("lsn") > mx // 2), _cfg(),
           start_epoch=table.last_committed_epoch() + 1,
           start_lsn=table.last_committed_lsn() + 1)
    # fold WITHOUT consulting the lagging consumer: its unseen deltas fold
    assert fold_deltas(table)["folded"] is True
    with pytest.raises(ValueError, match="fold consuming undelivered"):
        cur.poll()


def test_feed_still_raises_across_erase(spark, tmp_path):
    """erase_conversations rewrites history without the fold stamp —
    the feed must keep failing loud across it (compliance: the feed
    must not re-publish or silently skip the erased interval)."""
    from aqueduct_core_spark.operators.erase import erase_conversations

    table = _table(spark, tmp_path)
    log = generate_changes(spark, n_convs=30, seed=8)
    replay(table, log, _cfg())
    cur = FeedCursor(table)
    key = table.read().select("conv_id").orderBy("conv_id").first()[0]
    erase_conversations(table, [key])
    with pytest.raises(ValueError, match="history rewrite"):
        cur.poll()


def test_publish_crash_after_claim_rolls_forward(spark, tmp_path):
    """A crash between the publish decision claim and the pointer swap
    must not wedge recovery in CommitConflict: the claim IS the
    decision, so recovery completes the swap and the epoch replay
    skips as a duplicate."""
    table = _table(spark, tmp_path)
    log = generate_changes(spark, n_convs=10, seed=9)
    replay(table, log, _cfg())
    nxt = (
        generate_changes(spark, n_convs=5, seed=10)
        .withColumn("lsn", F.col("lsn") + 10**7)
    )
    # stage epoch 7 unpublished, then simulate the crash: decision
    # claimed "publish", pointer never swapped
    apply_batch(table, nxt, epoch=7, cfg=_cfg(), publish=False)
    v = table.catalog.staged_version()
    snap = table.catalog.load(v)
    assert table.catalog._claim_decision(snap, "publish") == "publish"
    head_before = table.catalog.current_version()
    assert head_before == v - 1  # swap indeed never happened

    # recovery: the SAME epoch retries through apply_audited
    m = apply_audited(table, nxt, epoch=7, cfg=_cfg(),
                      audits={"ok": lambda df: True})
    assert table.catalog.current_version() == v  # publish completed
    assert m.get("state") == "SKIPPED_DUPLICATE_EPOCH"


def test_abandon_crash_after_claim_is_idempotent(spark, tmp_path):
    """Same crash window on the abandon side: re-running abandon
    completes the removal instead of raising."""
    table = _table(spark, tmp_path)
    log = generate_changes(spark, n_convs=10, seed=11)
    replay(table, log, _cfg())
    nxt = (
        generate_changes(spark, n_convs=5, seed=12)
        .withColumn("lsn", F.col("lsn") + 10**7)
    )
    apply_batch(table, nxt, epoch=8, cfg=_cfg(), publish=False)
    v = table.catalog.staged_version()
    snap = table.catalog.load(v)
    assert table.catalog._claim_decision(snap, "abandon") == "abandon"
    # crashed before the manifest removal; recovery abandons again
    table.catalog.abandon(v)
    assert table.catalog.staged_version() is None
    # and publish of the decided-abandon stage conflicts loudly
    with pytest.raises((CommitConflict, FileNotFoundError)):
        table.catalog.publish(v)


def test_bootstrap_carries_evolved_columns(spark, tmp_path):
    """bootstrap_from_state must not silently drop a column the
    upstream evolved — rows re-enter at their original lsn, so the
    tail never re-delivers them and the data would be lost for good."""
    from aqueduct_core_spark.streaming.pipeline import bootstrap_from_state

    upstream = _table(spark, tmp_path, "up")
    log = generate_changes(spark, n_convs=10, seed=13).withColumn(
        "model", F.when(F.col("op") != "D", F.lit("m-3"))
    )
    replay(upstream, log, _cfg())
    assert "model" in upstream.read().columns

    replica = _table(spark, tmp_path, "rep")
    bootstrap_from_state(replica, upstream.read_internal(), cfg=_cfg())
    assert "model" in replica.read().columns
    up = upstream.read().where(F.col("model").isNotNull()).count()
    rep = replica.read().where(F.col("model").isNotNull()).count()
    assert up == rep > 0


def test_epoch_collision_with_different_data_fails_loud(spark, tmp_path):
    """An already-committed epoch number carrying DIFFERENT data (fresh
    checkpoint against an ingested table) must raise, not silently
    skip real events; a true re-delivery still skips."""
    from aqueduct_core_spark.operators.merge import EpochCollision

    table = _table(spark, tmp_path)
    log = generate_changes(spark, n_convs=20, seed=14).cache()
    mx = int(log.agg(F.max("lsn")).collect()[0][0])
    first = log.where(F.col("lsn") <= mx // 2)
    apply_batch(table, first, epoch=0, cfg=_cfg())

    # true re-delivery of epoch 0: idempotent skip
    m = apply_batch(table, first, epoch=0, cfg=_cfg())
    assert m["state"] == "SKIPPED_DUPLICATE_EPOCH"
    # same epoch number, different data: loud collision
    with pytest.raises(EpochCollision, match="NOT a re-delivery"):
        apply_batch(table, log.where(F.col("lsn") > mx // 2), epoch=0, cfg=_cfg())
    # an empty batch on a colliding id (idle trigger) still skips quietly
    m = apply_batch(table, log.where(F.lit(False)), epoch=0, cfg=_cfg())
    assert m["state"] == "SKIPPED_DUPLICATE_EPOCH"


def test_audited_stream_survives_idle_trigger(spark, tmp_path):
    """An audited stream's empty micro-batch stages nothing and must
    not raise AuditFailed (published=False with no failures)."""
    from aqueduct_core_spark.streaming.pipeline import run_available_now

    table = _table(spark, tmp_path)
    log = generate_changes(spark, n_convs=10, seed=15)
    os.makedirs(str(tmp_path / "empty_dir"))
    log.limit(0).write.parquet(str(tmp_path / "empty_dir" / "none"),
                               mode="overwrite")
    run_available_now(
        spark, table, str(tmp_path / "empty_dir" / "none"),
        str(tmp_path / "ck"), _cfg(),
        audits={"always": lambda df: True},
    )
    assert table.catalog.current_version() == 0  # nothing committed, no crash
