"""FeedCursor: at-least-once incremental consumption of the table feed
with persisted resume — the store-node tail loop against the TABLE."""

import pytest
from pyspark.sql import functions as F

from aqueduct_core_spark.catalog.table import ParquetTranscriptTable
from aqueduct_core_spark.config import EngineConfig
from aqueduct_core_spark.generator import generate_changes
from aqueduct_core_spark.operators.compact import fold_deltas
from aqueduct_core_spark.operators.merge import apply_batch
from aqueduct_core_spark.schema import LSN_COLUMN
from aqueduct_core_spark.streaming.feed import FeedCursor
from aqueduct_core_spark.streaming.pipeline import replay
from aqueduct_core_spark.verify import states_equal


def _setup(spark, tmp_path, n_convs=50):
    cfg = EngineConfig(num_buckets=4, mor_fold_every=10**9,
                       max_events_per_trigger=400)
    log = generate_changes(spark, n_convs=n_convs, seed=48).cache()
    primary = ParquetTranscriptTable.create(spark, str(tmp_path / "p"), num_buckets=4)
    return cfg, log, primary


def _drain(cursor, replica, cfg, epoch0):
    """Poll-apply-commit until the cursor is caught up; returns epochs applied."""
    n = 0
    while True:
        feed = cursor.poll()
        if feed is None:
            return n
        apply_batch(replica, feed.withColumnRenamed(LSN_COLUMN, "lsn"),
                    epoch=epoch0 + n, cfg=cfg)
        cursor.commit()
        n += 1


def test_cursor_replica_converges_and_persists(spark, tmp_path):
    cfg, log, primary = _setup(spark, tmp_path)
    mx = int(log.agg(F.max("lsn")).collect()[0][0])
    state = str(tmp_path / "cursor.json")

    replica = ParquetTranscriptTable.create(spark, str(tmp_path / "r"), num_buckets=4)
    cur = FeedCursor(primary, state_path=state)
    assert cur.poll() is None  # nothing committed yet

    replay(primary, log.where(F.col("lsn") < mx // 2), cfg, start_epoch=0, start_lsn=0)
    n1 = _drain(cur, replica, cfg, 0)
    assert n1 >= 1
    assert states_equal(replica.read_internal(), primary.read_internal())

    # a "restarted" consumer resumes from the persisted position: a new
    # cursor object sees nothing new until the primary advances
    cur2 = FeedCursor(primary, state_path=state)
    assert cur2.version == cur.version
    assert cur2.poll() is None

    replay(primary, log.where(F.col("lsn") >= mx // 2), cfg)
    n2 = _drain(cur2, replica, cfg, n1)
    assert n2 >= 1
    assert states_equal(replica.read_internal(), primary.read_internal())
    log.unpersist()


def test_cursor_redelivers_on_crash_before_commit(spark, tmp_path):
    cfg, log, primary = _setup(spark, tmp_path, n_convs=30)
    state = str(tmp_path / "cursor.json")
    replay(primary, log, cfg, start_epoch=0, start_lsn=0)

    cur = FeedCursor(primary, start_version=0, state_path=state)
    first = cur.poll()
    assert first is not None
    n = first.count()
    # crash before commit: a fresh cursor re-delivers the SAME window
    cur3 = FeedCursor(primary, start_version=0, state_path=state)
    again = cur3.poll()
    assert again is not None and again.count() == n
    cur3.commit()
    assert cur3.poll() is None
    log.unpersist()


def test_cursor_fold_outruns_retention_then_reset(spark, tmp_path):
    cfg, log, primary = _setup(spark, tmp_path, n_convs=30)
    replay(primary, log, cfg, start_epoch=0, start_lsn=0)
    cur = FeedCursor(primary, start_version=0)

    fold_deltas(primary)  # history rewritten past the cursor
    with pytest.raises(ValueError, match="undelivered deltas"):
        cur.poll()

    # recovery: full resync — re-seed from state, cursor jumps to current
    v = cur.reset()
    assert v == primary.catalog.current_version()
    assert cur.poll() is None
    log.unpersist()


def test_publisher_downstream_site_converges(spark, tmp_path):
    """FeedPublisher: the published envelope segments ARE a drainable
    change log — a downstream site drains them with the ordinary
    json-envelope ingest and converges to the primary's exact state;
    publishing is exactly-once (idle publish no-ops, crash debris in
    _pending is invisible and overwritten, position rides the committed
    segment names)."""
    import os

    from aqueduct_core_spark.streaming.feed import FeedPublisher
    from aqueduct_core_spark.streaming.pipeline import run_available_now

    cfg, log, primary = _setup(spark, tmp_path)
    mx = int(log.agg(F.max("lsn")).collect()[0][0])
    pub = FeedPublisher.create(primary, str(tmp_path / "pub"))

    # re-creating an existing publisher would re-base past unpublished
    # intervals: fail loud, re-open with the constructor instead
    with pytest.raises(FileExistsError):
        FeedPublisher.create(primary, str(tmp_path / "pub"))
    FeedPublisher(primary, str(tmp_path / "pub"))  # re-open is fine

    # idle publish before anything commits: no-op
    assert pub.publish()["published"] is False

    # crash debris: a torn staging attempt is invisible to consumers
    # and to position() (swept later under the TTL contract)
    debris = tmp_path / "pub" / "_pending" / "000000000000.deadbeef"
    debris.mkdir(parents=True)
    (debris / "part-junk.txt").write_text("{torn write\n")

    replay(primary, log.where(F.col("lsn") < mx // 2), cfg,
           start_epoch=0, start_lsn=0)
    m1 = pub.publish()
    assert m1["published"] and m1["from_version"] == 0
    replay(primary, log, cfg)  # the rest of the log

    # single-winner: a racer's rename landed on this from_v an instant
    # ago (its content not yet visible to our listing) — our rename
    # fails on the non-empty target, we discard our copy and report the
    # lost race instead of double-publishing
    racer = tmp_path / "pub" / "segments" / f"{m1['to_version']:012d}"
    racer.mkdir()
    (racer / "part-racer.txt").write_text("")
    lost = pub.publish()
    assert lost["published"] is False and lost["lost_race"] is True
    import shutil as _sh

    _sh.rmtree(racer)

    m2 = pub.publish()
    assert m2["published"] and m2["from_version"] == m1["to_version"]
    assert pub.publish()["published"] is False  # caught up
    assert pub.position() == primary.catalog.current_version()
    assert sorted(os.listdir(tmp_path / "pub" / "segments")) == sorted(
        [m1["segment"], m2["segment"]]
    )
    assert (debris / "part-junk.txt").exists()  # young debris untouched

    # downstream site: plain json-envelope drain over the published glob
    site = ParquetTranscriptTable.create(
        spark, str(tmp_path / "site"), num_buckets=4
    )
    run_available_now(
        spark, site, pub.wire_glob(), str(tmp_path / "ck"), cfg,
        wire_format="json-envelope",
    )
    assert states_equal(primary.read_internal(), site.read_internal())

    # retention contract: a fold inside an unpublished interval fails
    # loud instead of under-publishing
    nxt = generate_changes(spark, n_convs=10, seed=99).withColumn(
        "lsn", F.col("lsn") + F.lit(mx + 1)
    )
    apply_batch(primary, nxt, epoch=10_000, cfg=cfg)
    fold_deltas(primary)
    with pytest.raises(ValueError, match="undelivered deltas"):
        pub.publish()


def test_fold_blocks_on_lagging_consumers(spark, tmp_path):
    """Retention coordination: fold/rewrite block while a registered
    feed consumer lags (folding would break its unfolded-interval
    contract and force a full resync); once the consumer drains, the
    fold proceeds and the feed stays consumable end-to-end."""
    from aqueduct_core_spark.operators.compact import fold_deltas, maintain

    cfg, log, primary = _setup(spark, tmp_path)
    replica = ParquetTranscriptTable.create(spark, str(tmp_path / "r"), num_buckets=4)
    cur = FeedCursor(primary, state_path=str(tmp_path / "c.json"))

    replay(primary, log, cfg, start_epoch=0, start_lsn=0)
    assert cur.version < primary.catalog.current_version()  # lagging

    m = fold_deltas(primary, consumers=[cur])
    assert m == {"folded": False, "blocked_by": 1}
    mm = maintain(primary, consumers=[cur])
    assert mm["fold"]["folded"] is False
    assert mm["rewrite"].get("blocked_by_consumers") is True

    n = _drain(cur, replica, cfg, 0)  # feed still unfolded: consumable
    assert n >= 1 and states_equal(primary.read_internal(), replica.read_internal())

    m = fold_deltas(primary, consumers=[cur])
    assert m["folded"] is True  # caught up: retention released


def test_publisher_gzips_segments_and_drain_sniffs(spark, tmp_path):
    """Wire compression (reference parity: pipe-codec gzips bodies over
    a 1,024-byte threshold — ContentEncoder.java:23, GzipCodec.java:43-85):
    published segment files are .gz, a plain-codec publisher of the SAME
    interval is measurably larger, and the downstream json-envelope
    drain converges with no configuration — codec-by-extension."""
    import glob
    import os

    from aqueduct_core_spark.streaming.feed import FeedPublisher
    from aqueduct_core_spark.streaming.pipeline import run_available_now
    from aqueduct_core_spark.verify import states_equal

    cfg, log, primary = _setup(spark, tmp_path)
    gz = FeedPublisher.create(primary, str(tmp_path / "pub-gz"))
    plain = FeedPublisher.create(
        primary, str(tmp_path / "pub-plain"), codec=None
    )
    assert gz.codec == "gzip"  # the default IS compressed
    replay(primary, log, cfg)
    assert gz.publish()["published"] and plain.publish()["published"]

    def seg_bytes(pub, pattern):
        files = glob.glob(os.path.join(pub._segments_dir, "*", pattern))
        assert files, pattern
        return sum(os.path.getsize(f) for f in files)

    gz_bytes = seg_bytes(gz, "part-*.txt.gz")
    plain_bytes = seg_bytes(plain, "part-*.txt")
    assert gz_bytes < plain_bytes / 2, (gz_bytes, plain_bytes)

    site = ParquetTranscriptTable.create(
        spark, str(tmp_path / "site"), num_buckets=4
    )
    run_available_now(
        spark, site, gz.wire_glob(), str(tmp_path / "ck-gz"), cfg,
        wire_format="json-envelope",
    )
    assert states_equal(primary.read_internal(), site.read_internal())
