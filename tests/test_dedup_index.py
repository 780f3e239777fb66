"""Incremental near-dup index: admission-control dedup against a
persisted LSH signature index, maintained from the table change feed."""

import os

import pytest
from pyspark.sql import functions as F

from aqueduct_core_spark.catalog.table import ParquetTranscriptTable
from aqueduct_core_spark.config import EngineConfig
from aqueduct_core_spark.functions.dedup import minhash_dedup
from aqueduct_core_spark.functions.dedup_index import (
    DedupIndex,
    conversation_documents,
    sync_index_from_feed,
)
from aqueduct_core_spark.generator import generate_changes
from aqueduct_core_spark.streaming.feed import FeedCursor
from aqueduct_core_spark.streaming.pipeline import replay


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, text string")


BASE = [
    ("h1", "the quick brown fox jumps over the lazy dog again and again"),
    ("h2", "pyspark dataframes shuffle on wide dependencies like joins"),
    ("h3", "completely unrelated text about cooking pasta with garlic"),
]
INCOMING = [
    # near-dup of h1 (one word changed)
    ("n1", "the quick brown fox jumps over the lazy cat again and again"),
    # exact dup of h2
    ("n2", "pyspark dataframes shuffle on wide dependencies like joins"),
    # novel
    ("n3", "quantum chromodynamics binds quarks into hadrons via gluons"),
]


def test_check_flags_history_dups_and_passes_novel(spark, tmp_path):
    ix = DedupIndex.create(spark, str(tmp_path / "ix"), num_parts=4)
    ix.add(_docs(spark, BASE))
    pairs = ix.check(
        _docs(spark, INCOMING),
        corpus=_docs(spark, BASE),
        threshold=0.3,
    ).collect()
    got = {(r["id_in"], r["id_indexed"]) for r in pairs}
    assert ("n1", "h1") in got
    assert ("n2", "h2") in got
    assert not any(i == "n3" for i, _ in got), "novel doc must pass"
    assert all(0 <= r["jaccard"] <= 1 for r in pairs)


def test_incremental_adds_equal_one_shot_build(spark, tmp_path):
    one = DedupIndex.create(spark, str(tmp_path / "one"), num_parts=4)
    one.add(_docs(spark, BASE))
    inc = DedupIndex.create(spark, str(tmp_path / "inc"), num_parts=4)
    for row in BASE:
        inc.add(_docs(spark, [row]))
    q = _docs(spark, INCOMING)
    a = {(r["id_in"], r["id_indexed"]) for r in one.check(q).collect()}
    b = {(r["id_in"], r["id_indexed"]) for r in inc.check(q).collect()}
    assert a == b and a, "three adds must index exactly like one"


def test_check_matches_batch_lsh_candidates(spark, tmp_path):
    """Index-based candidates across history×incoming == what the batch
    LSH pipeline finds on the union (restricted to cross-set pairs)."""
    ix = DedupIndex.create(spark, str(tmp_path / "ix"), num_parts=4)
    ix.add(_docs(spark, BASE))
    allr = BASE + INCOMING
    batch = minhash_dedup(_docs(spark, allr), threshold=0.3)
    cross = {
        tuple(sorted((r["id_a"], r["id_b"])))
        for r in batch.collect()
        if (r["id_a"].startswith("h")) != (r["id_b"].startswith("h"))
    }
    inc = {
        tuple(sorted((r["id_in"], r["id_indexed"])))
        for r in ix.check(
            _docs(spark, INCOMING), corpus=_docs(spark, BASE), threshold=0.3
        ).collect()
    }
    assert inc == cross


def test_reindex_retracts_old_signature_and_matches_new(spark, tmp_path):
    ix = DedupIndex.create(spark, str(tmp_path / "ix"), num_parts=4)
    ix.add(_docs(spark, BASE))
    # h1's document changed entirely -> old near-dup must stop matching
    ix.reindex(_docs(spark, [("h1", "a totally different document now")]))
    got = {
        (r["id_in"], r["id_indexed"])
        for r in ix.check(_docs(spark, INCOMING)).collect()
    }
    assert ("n1", "h1") not in got
    assert ("n2", "h2") in got, "untouched docs keep matching"
    # and the new text IS matchable
    probe = _docs(spark, [("p1", "a totally different document now")])
    got2 = {(r["id_in"], r["id_indexed"]) for r in ix.check(probe).collect()}
    assert ("p1", "h1") in got2


def test_remove_then_compact_reclaims_and_preserves_answers(spark, tmp_path):
    ix = DedupIndex.create(spark, str(tmp_path / "ix"), num_parts=4)
    ix.add(_docs(spark, BASE))
    ix.remove(_docs(spark, [("h2", "")]).select("doc_id"))
    before = {
        (r["id_in"], r["id_indexed"])
        for r in ix.check(_docs(spark, INCOMING)).collect()
    }
    assert not any(x == "h2" for _, x in before)
    out = ix.compact()
    assert out["version"] > 0
    after = {
        (r["id_in"], r["id_indexed"])
        for r in ix.check(_docs(spark, INCOMING)).collect()
    }
    assert after == before
    assert ix._meta()["tombstones"] == []
    # compact dropped the retired add/rm dirs
    labels = [d for d in os.listdir(ix.root) if d.startswith(("add-", "rm-"))]
    assert labels == []


def test_touched_parts_prune_the_index_read(spark, tmp_path):
    ix = DedupIndex.create(spark, str(tmp_path / "ix"), num_parts=16)
    ix.add(_docs(spark, BASE))
    one = _docs(spark, INCOMING[:1])
    parts = ix.touched_parts(ix._buckets(one, "text", "doc_id"))
    assert 0 < len(parts) <= 16
    # pruned read returns a strict subset of index rows when the batch
    # misses some parts (bands=16 buckets for one doc rarely covers 16
    # distinct residues, but guard the assertion either way)
    n_all = ix._read_parts(None).count()
    n_pruned = ix._read_parts(parts).count()
    assert n_pruned <= n_all


def test_sync_from_feed_tracks_conversation_growth(spark, tmp_path):
    cfg = EngineConfig(num_buckets=4, max_events_per_trigger=10**9)
    log = generate_changes(spark, n_convs=20, seed=53).cache()
    mx = int(log.agg(F.max("lsn")).collect()[0][0])
    table = ParquetTranscriptTable.create(spark, str(tmp_path / "t"), num_buckets=4)
    ix = DedupIndex.create(spark, str(tmp_path / "ix"), num_parts=4)
    cur = FeedCursor(table, state_path=str(tmp_path / "cur.json"))

    replay(table, log.where(F.col("lsn") < mx // 2), cfg, start_epoch=0, start_lsn=0)
    out1 = sync_index_from_feed(ix, table, cur)
    assert out1["batches"] >= 1

    # the index now mirrors conversation-level docs: every current
    # conversation is findable by probing with its own exact text
    docs_now = conversation_documents(table.read())
    probe = docs_now.withColumn("doc_id", F.concat(F.lit("probe-"), "doc_id"))
    hits = ix.check(probe, corpus=docs_now, threshold=0.99)
    matched = {
        r["id_in"].removeprefix("probe-"): r["id_indexed"] for r in hits.collect()
    }
    assert all(k == v for k, v in matched.items())
    assert len(matched) == docs_now.count()

    # grow conversations; sync; the index must reflect the NEW text
    replay(table, log.where(F.col("lsn") >= mx // 2), cfg)
    out2 = sync_index_from_feed(ix, table, cur)
    assert out2["batches"] >= 1
    docs2 = conversation_documents(table.read())
    probe2 = docs2.withColumn("doc_id", F.concat(F.lit("probe-"), "doc_id"))
    hits2 = ix.check(probe2, corpus=docs2, threshold=0.99)
    matched2 = {
        r["id_in"].removeprefix("probe-"): r["id_indexed"] for r in hits2.collect()
    }
    assert all(k == v for k, v in matched2.items())
    assert len(matched2) == docs2.count()
    log.unpersist()


def test_params_stamped_and_bands_must_divide(spark, tmp_path):
    with pytest.raises(ValueError, match="must divide"):
        DedupIndex.create(spark, str(tmp_path / "bad"), num_hashes=64, bands=10)
    ix = DedupIndex.create(
        spark, str(tmp_path / "ok"), num_hashes=32, bands=8, hash_method="md5"
    )
    m = ix._meta()
    assert (m["num_hashes"], m["bands"], m["hash_method"]) == (32, 8, "md5")
    # load() round-trips the stamped params
    m2 = DedupIndex.load(spark, str(tmp_path / "ok"))._meta()
    assert m2 == m


def test_streaming_maintainer_keeps_index_fresh(spark, tmp_path):
    """The index rides foreachBatch via DedupIndexMaintainer: after a
    multi-epoch streaming drain every current conversation is findable
    in the index by its own text, and a second drain of the same log
    (fresh checkpoint -> idempotently-skipped epochs) leaves the
    cursor untouched."""
    from aqueduct_core_spark.functions.dedup_index import DedupIndexMaintainer
    from aqueduct_core_spark.streaming.pipeline import run_available_now

    cfg = EngineConfig(num_buckets=4, mor_fold_every=10**9)
    changes_dir = str(tmp_path / "changes")
    generate_changes(spark, n_convs=30, seed=29).repartition(4).write.parquet(
        changes_dir
    )
    table = ParquetTranscriptTable.create(spark, str(tmp_path / "t"), num_buckets=4)
    ix = DedupIndex.create(spark, str(tmp_path / "ix"), num_parts=4)
    cur = FeedCursor(table, state_path=str(tmp_path / "cur.json"))

    run_available_now(
        spark, table, changes_dir, str(tmp_path / "ckpt"), cfg,
        max_files_per_trigger=2,
        maintainers=[DedupIndexMaintainer(ix, cur)],
    )
    assert table.catalog.current_version() >= 2  # multiple epochs ran
    assert cur.version == table.catalog.current_version()

    docs_now = conversation_documents(table.read())
    probe = docs_now.withColumn("doc_id", F.concat(F.lit("probe-"), "doc_id"))
    hits = ix.check(probe, corpus=docs_now, threshold=0.99)
    matched = {
        r["id_in"].removeprefix("probe-"): r["id_indexed"] for r in hits.collect()
    }
    assert all(k == v for k, v in matched.items())
    assert len(matched) == docs_now.count()

    v = cur.version
    run_available_now(
        spark, table, changes_dir, str(tmp_path / "ckpt2"), cfg,
        max_files_per_trigger=2,
        maintainers=[DedupIndexMaintainer(ix, cur)],
    )
    assert cur.version == v  # skipped epochs -> no feed -> no index churn


def test_reindex_conflict_is_atomic(spark, tmp_path):
    """reindex is ONE CAS commit: a conflict must leave the index
    exactly as it was — never a published retraction whose re-add was
    lost (live documents invisible to check() until manual repair)."""
    from aqueduct_core_spark.catalog.meta import MetaCommitConflict

    ix = DedupIndex.create(spark, str(tmp_path / "ix"), num_parts=4)
    ix.add(_docs(spark, BASE))
    before = ix._meta()

    # inject a racing commit between reindex's meta read and its publish
    real_stage_add = ix._stage_add

    def stage_then_race(meta, *a, **k):
        out = real_stage_add(meta, *a, **k)
        racer = DedupIndex.load(spark, ix.root)
        m = racer._meta()
        racer._vm.commit(m, int(m["version"]))
        return out

    ix._stage_add = stage_then_race
    grown = _docs(spark, [("h1", BASE[0][1] + " grew a new turn")])
    with pytest.raises(MetaCommitConflict):
        ix.reindex(grown)

    after = ix._meta()
    # neither the tombstone nor the re-add landed
    assert after["tombstones"] == before["tombstones"] == []
    assert after["files"] == before["files"]
    # h1's original signature is still live: an incoming exact dup hits
    hits = ix.check(_docs(spark, [("q", BASE[0][1])]))
    assert ("q", "h1") in {tuple(r) for r in hits.collect()}


def test_compact_sweep_spares_racing_adds_files(spark, tmp_path):
    """compact()'s orphan sweep is bounded to the label dirs that
    existed when the compact STARTED: an add() that reads the
    post-compact meta and commits after it must keep its files (the
    unbounded sweep deleted them while the meta referenced them)."""
    root = str(tmp_path / "ix")
    ix = DedupIndex.create(spark, root, num_parts=4)
    ix.add(_docs(spark, BASE))
    ix.remove(_docs(spark, BASE[:1]).select("doc_id"))

    fresh = [("f1", "a freshly ingested document racing the compaction")]
    real_commit = ix._vm.commit

    def commit_then_race(meta, base):
        out = real_commit(meta, base)
        DedupIndex.load(spark, root).add(_docs(spark, fresh))
        return out

    ix._vm.commit = commit_then_race
    ix.compact()

    final = DedupIndex.load(spark, root)
    m = final._meta()
    for fl in m["files"].values():
        for f in fl:
            assert os.path.exists(os.path.join(root, f)), f
    # and the raced add is queryable
    hits = final.check(_docs(spark, [("q", fresh[0][1])]))
    assert ("q", "f1") in {tuple(r) for r in hits.collect()}


def test_ingest_equals_check_then_add(spark, tmp_path):
    """ingest() (one signature pass) must equal check()-then-add():
    same candidate pairs, same post-add index answers — and the pairs
    frame must stay valid when consumed AFTER the add (pinned to the
    pre-add file list)."""
    a = DedupIndex.create(spark, str(tmp_path / "a"), num_parts=4)
    b = DedupIndex.create(spark, str(tmp_path / "b"), num_parts=4)
    base, inc = _docs(spark, BASE), _docs(spark, INCOMING)
    a.add(base)
    b.add(base)

    expected = {(r.id_in, r.id_indexed) for r in a.check(inc).collect()}
    a.add(inc)

    pairs, m = b.ingest(inc)
    assert m["files_added"] > 0
    # consume AFTER the add — a batch must not match itself via the index
    got = {(r.id_in, r.id_indexed) for r in pairs.collect()}
    assert got == expected and len(got) > 0

    probe = _docs(spark, [("p1", BASE[0][1])])
    assert (
        {r.id_indexed for r in a.check(probe).collect()}
        == {r.id_indexed for r in b.check(probe).collect()}
    )
