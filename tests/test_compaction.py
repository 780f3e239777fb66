"""Retention compaction: LWW log compaction below a threshold +
tombstone purge (reference SQLiteQueries.java:51-55 semantics, tests
SQLiteStorageIntegrationSpec.groovy:696-907); table maintenance."""

import pandas as pd

from aqueduct_core_spark.catalog.table import ParquetTranscriptTable
from aqueduct_core_spark.config import EngineConfig
from aqueduct_core_spark.generator import expected_state_pdf, generate_changes_pdf
from aqueduct_core_spark.operators.compact import (
    compact_log,
    count_by_type,
    expire_snapshots,
    rewrite_data_files,
)
from aqueduct_core_spark.operators.merge import apply_batch
from aqueduct_core_spark.verify import consistency_sum, state_digest, states_equal
from tests.test_merge import assert_state_equal, final_state_pdf, to_spark


def test_compacted_log_replays_to_same_state(spark, tmp_path):
    pdf = generate_changes_pdf(40, seed=42)
    df = to_spark(spark, pdf)
    threshold = pdf["ts"].quantile(0.6)  # compact the older 60%

    compacted = compact_log(df, threshold)
    assert compacted.count() < df.count()

    t1 = ParquetTranscriptTable.create(spark, str(tmp_path / "full"), num_buckets=8)
    t2 = ParquetTranscriptTable.create(spark, str(tmp_path / "comp"), num_buckets=8)
    cfg = EngineConfig(num_buckets=8)
    apply_batch(t1, df, epoch=0, cfg=cfg)
    apply_batch(t2, compacted, epoch=0, cfg=cfg)

    a, b = t1.read_internal(), t2.read_internal()
    assert states_equal(a, b)
    assert state_digest(a) == state_digest(b)


def test_tombstone_purge(spark):
    pdf = generate_changes_pdf(60, seed=42)
    df = to_spark(spark, pdf)
    tmax = pdf["ts"].max()
    # compact everything, purge all tombstones
    compacted = compact_log(df, tmax, deletions_threshold=tmax)
    assert compacted.where("op = 'D'").count() == 0
    # without purge, tombstone winners survive
    kept = compact_log(df, tmax)
    assert kept.where("op = 'D'").count() > 0


def test_ttl_mark_and_purge_replay_equal(spark, tmp_path):
    """F6 two-phase compaction (mark time_to_live → purge expired,
    PostgresqlStorage.java:479-493 + :475-477): replaying the purged
    log yields the same final state — including the hierarchical case
    where the conversation tombstone itself is purged but the turns it
    killed must stay dead."""
    from aqueduct_core_spark.operators.compact import mark_deletion_ttl, purge_expired

    pdf = generate_changes_pdf(60, seed=1)  # seed 1 contains conv-level deletes
    assert (pdf["turn_idx"].isna() & (pdf["op"] == "D")).any(), "need conv deletes"
    df = to_spark(spark, pdf)
    tmax = pdf["ts"].max()

    marked = mark_deletion_ttl(df, threshold=tmax, ttl_ts=tmax)
    # every tombstone marks itself (lsn <= its own delete lsn)
    assert marked.where("op = 'D' AND time_to_live IS NULL").count() == 0
    purged = purge_expired(marked, now_ts=tmax).drop("time_to_live")
    assert purged.count() < df.count()
    # no purged row may survive in the replayed state
    t1 = ParquetTranscriptTable.create(spark, str(tmp_path / "full"), num_buckets=8)
    t2 = ParquetTranscriptTable.create(spark, str(tmp_path / "purged"), num_buckets=8)
    cfg = EngineConfig(num_buckets=8)
    apply_batch(t1, df, epoch=0, cfg=cfg)
    apply_batch(t2, purged, epoch=0, cfg=cfg)
    assert states_equal(t1.read_internal(), t2.read_internal())
    assert state_digest(t1.read_internal()) == state_digest(t2.read_internal())

    # not-yet-expired TTLs are kept (purge honors the timestamp)
    kept = purge_expired(marked, now_ts=tmax - pd.Timedelta(days=1))
    assert kept.count() == df.count()


def test_consistency_sum_matches_oracle(spark):
    pdf = generate_changes_pdf(40, seed=42)
    from aqueduct_core_spark.generator import consistency_sum_pdf

    assert consistency_sum(to_spark(spark, pdf)) == consistency_sum_pdf(pdf)


def test_count_by_type(spark):
    pdf = generate_changes_pdf(20, seed=42)
    got = {r["op"]: r["cnt"] for r in count_by_type(to_spark(spark, pdf)).collect()}
    exp = pdf["op"].value_counts().to_dict()
    assert got == exp


def test_rewrite_and_expire(spark, tmp_path):
    """Many small commits → rewrite coalesces files, expire removes
    orphans, state is unchanged."""
    pdf = generate_changes_pdf(30, seed=42)
    cfg = EngineConfig(num_buckets=4)
    table = ParquetTranscriptTable.create(spark, str(tmp_path / "t"), num_buckets=4)
    n = len(pdf)
    step = n // 5
    for e in range(5):
        lo, hi = e * step, (e + 1) * step if e < 4 else n
        apply_batch(table, to_spark(spark, pdf.iloc[lo:hi]), epoch=e, cfg=cfg)

    before = final_state_pdf(table)

    def total_files():
        snap = table.catalog.current()
        return sum(len(v) for v in snap["files"].values()) + sum(
            len(v) for v in snap.get("delta_files", {}).values()
        )

    files_before = total_files()
    rewrite_data_files(table)
    removed = expire_snapshots(table, keep_last=1)
    assert removed > 0
    assert total_files() <= files_before
    assert_state_equal(final_state_pdf(table), before)


def test_maintain_policy_loop(spark, tmp_path):
    """One-call maintenance: fold when delta pressure, skip rewrite
    below the file threshold, expire old manifests (keeping tags),
    sweep orphans — state unchanged, idempotent on a timer."""
    from aqueduct_core_spark.catalog.table import ParquetTranscriptTable
    from aqueduct_core_spark.config import EngineConfig
    from aqueduct_core_spark.generator import generate_changes
    from aqueduct_core_spark.operators.compact import maintain
    from aqueduct_core_spark.streaming.pipeline import replay
    from aqueduct_core_spark.verify import states_equal

    cfg = EngineConfig(num_buckets=4, max_events_per_trigger=300,
                       mor_fold_every=10**9)  # never auto-fold
    log = generate_changes(spark, n_convs=40, seed=47).cache()
    t = ParquetTranscriptTable.create(spark, str(tmp_path / "t"), num_buckets=4)
    replay(t, log, cfg)
    pre = t.read_internal()
    snap = t.catalog.current()
    assert snap.get("delta_files")  # delta pressure exists
    t.tag("pin")  # tag v_current: must survive expiry
    pinned_v = t.catalog.current_version()

    m = maintain(t, fold_if_delta_epochs=1, rewrite_if_files_per_bucket=1000,
                 keep_snapshots=1, orphan_older_than_s=0)
    assert m["fold"]["folded"] is True
    assert m["rewrite"] == {"rewritten": False,
                            "files_per_bucket": m["rewrite"]["files_per_bucket"]}
    assert not t.catalog.current()["delta_files"]
    assert states_equal(t.read_internal(), pre)
    # expiry kept the tag and the current version only
    hist = t.catalog.history()
    assert pinned_v in hist and t.catalog.current_version() in hist
    assert len(hist) <= 3

    # second run is a no-op: nothing folds, nothing removed, version fixed
    v = t.catalog.current_version()
    m2 = maintain(t, fold_if_delta_epochs=1, rewrite_if_files_per_bucket=1000,
                  keep_snapshots=1, orphan_older_than_s=0)
    assert m2["fold"] == {"folded": False}
    assert m2["orphans_removed"] == 0 and m2["expired_files_removed"] == 0
    assert t.catalog.current_version() == v
    log.unpersist()


def test_table_write_codec_property(spark, tmp_path):
    """`codec` is a table property: every writer (epoch deltas, folds)
    honors it, the files really are zstd, and state is byte-equal to a
    snappy table fed the same log."""
    import os

    import pyarrow.parquet as pq

    from aqueduct_core_spark.operators.compact import fold_deltas

    pdf = generate_changes_pdf(40, seed=42)
    df = to_spark(spark, pdf)
    cfg = EngineConfig(num_buckets=8)

    tz = ParquetTranscriptTable.create(
        spark, str(tmp_path / "z"), num_buckets=8, codec="zstd"
    )
    ts = ParquetTranscriptTable.create(
        spark, str(tmp_path / "s"), num_buckets=8
    )
    assert tz.codec == "zstd" and ts.codec == "snappy"
    for t in (tz, ts):
        apply_batch(t, df, epoch=0, cfg=cfg)
        fold_deltas(t)

    def codecs(root):
        out = set()
        for dirpath, _dirs, files in os.walk(root):
            for f in files:
                if f.endswith(".parquet"):
                    md = pq.ParquetFile(os.path.join(dirpath, f)).metadata
                    out.add(md.row_group(0).column(0).compression)
        return out

    assert codecs(tz.root) == {"ZSTD"}
    assert "ZSTD" not in codecs(ts.root)
    assert states_equal(tz.read_internal(), ts.read_internal())
    assert state_digest(tz.read_internal()) == state_digest(ts.read_internal())
