"""Cross-PROCESS single-writer proof (T8) + maintenance-race hardening.

The reference proves two whole compaction processes racing
(PostgresqlStorageIntegrationSpec.groovy:448-482, advisory-lock NOWAIT);
here the analog is two OS processes racing SnapshotCatalog.commit on
one table root — the loser must get CommitConflict from the O_EXCL
manifest claim on a real filesystem, in every round.
"""

import multiprocessing as mp
import os
import time

import pytest

from aqueduct_core_spark.catalog.snapshot import CommitConflict, SnapshotCatalog


def _racer(root: str, barrier, results, idx: int, rounds: int):
    cat = SnapshotCatalog(root)
    wins = conflicts = 0
    for _ in range(rounds):
        barrier.wait()  # both processes attempt the same version together
        base = cat.current()
        try:
            cat.commit(base, summary_updates={"who": idx})
            wins += 1
        except CommitConflict:
            conflicts += 1
        barrier.wait()  # round barrier: nobody reads current() early
    results[idx] = (wins, conflicts)


def test_commit_race_cross_process(tmp_path):
    root = str(tmp_path / "table")
    cat = SnapshotCatalog(root)
    cat.create(schema_fields=[], properties={})

    rounds = 20
    ctx = mp.get_context("fork")
    barrier = ctx.Barrier(2)
    mgr = ctx.Manager()
    results = mgr.dict()
    ps = [
        ctx.Process(target=_racer, args=(root, barrier, results, i, rounds))
        for i in range(2)
    ]
    for p in ps:
        p.start()
    for p in ps:
        p.join(timeout=120)
        assert p.exitcode == 0
    (w0, c0), (w1, c1) = results[0], results[1]
    # every round: exactly one winner, exactly one CommitConflict loser
    assert w0 + w1 == rounds, (w0, w1, c0, c1)
    assert c0 + c1 == rounds, (w0, w1, c0, c1)
    assert cat.current()["snapshot_id"] == rounds
    # the lineage is a single chain — no forked history survived
    for v in range(1, rounds + 1):
        assert cat.load(v)["parent_id"] == v - 1


def test_orphan_cleanup_protects_inflight_epoch_stage(spark, tmp_path):
    """Item: enforce the orphan-cleanup contract structurally — a stage
    belonging to an epoch NEWER than the last committed one survives
    cleanup even with older_than_s=0 (age alone cannot prove a live
    epoch's stage dead)."""
    from aqueduct_core_spark.catalog.table import ParquetTranscriptTable
    from aqueduct_core_spark.config import EngineConfig
    from aqueduct_core_spark.generator import generate_changes_pdf
    from aqueduct_core_spark.operators.compact import remove_orphan_files
    from aqueduct_core_spark.operators.merge import apply_batch
    from aqueduct_core_spark.schema import CHANGES_SCHEMA

    pdf = generate_changes_pdf(n_convs=20, seed=5)
    changes = spark.createDataFrame(pdf, schema=CHANGES_SCHEMA)
    t = ParquetTranscriptTable.create(spark, str(tmp_path / "t"), num_buckets=4)
    cfg = EngineConfig(num_buckets=4, merge_strategy="staged")
    apply_batch(t, changes, epoch=0, cfg=cfg)  # last committed epoch = 0

    # simulate an IN-FLIGHT epoch 1: its stage exists, commit not landed
    live = t.stage_path("epoch-1")
    os.makedirs(live)
    with open(os.path.join(live, "part-0.parquet"), "wb") as f:
        f.write(b"x")
    # and a DEAD stage from the already-committed epoch 0 (crash debris)
    dead = t.stage_path("epoch-0")
    os.makedirs(dead)
    with open(os.path.join(dead, "leftover.parquet"), "wb") as f:
        f.write(b"x")
    old = time.time() - 10
    for p in (dead, os.path.join(dead, "leftover.parquet"),
              live, os.path.join(live, "part-0.parquet")):
        os.utime(p, (old, old))

    removed = remove_orphan_files(t, older_than_s=0)
    assert os.path.exists(live), "in-flight epoch stage must survive"
    assert not os.path.exists(dead), "committed epoch's stage debris must go"
    assert removed >= 1


def test_orphan_cleanup_tolerates_racing_deleter(spark, tmp_path, monkeypatch):
    """A concurrent fold/cleanup deleting files mid-walk must not abort
    the pass (ADVICE: unhandled FileNotFoundError)."""
    from aqueduct_core_spark.catalog.table import ParquetTranscriptTable
    from aqueduct_core_spark.config import EngineConfig
    from aqueduct_core_spark.generator import generate_changes_pdf
    from aqueduct_core_spark.operators import compact
    from aqueduct_core_spark.operators.merge import apply_batch
    from aqueduct_core_spark.schema import CHANGES_SCHEMA

    pdf = generate_changes_pdf(n_convs=10, seed=6)
    changes = spark.createDataFrame(pdf, schema=CHANGES_SCHEMA)
    t = ParquetTranscriptTable.create(spark, str(tmp_path / "t"), num_buckets=4)
    apply_batch(t, changes, epoch=0, cfg=EngineConfig(num_buckets=4))

    # unreferenced orphan, old enough to be collected
    orphan_dir = os.path.join(t.root, "data", "ghost")
    os.makedirs(orphan_dir)
    orphan = os.path.join(orphan_dir, "gone.parquet")
    with open(orphan, "wb") as f:
        f.write(b"x")
    os.utime(orphan, (time.time() - 100, time.time() - 100))

    real_getmtime = os.path.getmtime

    def racy_getmtime(path):
        if path == orphan:
            os.remove(orphan)  # racing deleter wins just before our stat
        return real_getmtime(path)

    monkeypatch.setattr("os.path.getmtime", racy_getmtime)
    # must complete without raising
    compact.remove_orphan_files(t, older_than_s=1)
    assert not os.path.exists(orphan)


def test_orphan_cleanup_keeps_markers_of_live_dirs(spark, tmp_path):
    """_SUCCESS/.crc markers inside directories holding referenced data
    are neither deleted nor counted."""
    from aqueduct_core_spark.catalog.table import ParquetTranscriptTable
    from aqueduct_core_spark.config import EngineConfig
    from aqueduct_core_spark.generator import generate_changes_pdf
    from aqueduct_core_spark.operators.compact import remove_orphan_files
    from aqueduct_core_spark.operators.merge import apply_batch
    from aqueduct_core_spark.schema import CHANGES_SCHEMA

    pdf = generate_changes_pdf(n_convs=10, seed=7)
    changes = spark.createDataFrame(pdf, schema=CHANGES_SCHEMA)
    t = ParquetTranscriptTable.create(spark, str(tmp_path / "t"), num_buckets=4)
    apply_batch(t, changes, epoch=0, cfg=EngineConfig(num_buckets=4))

    markers = []
    for dp, _dn, fns in os.walk(os.path.join(t.root, "delta")):
        for fn in fns:
            if fn == "_SUCCESS" or fn.endswith(".crc"):
                markers.append(os.path.join(dp, fn))
        for fn in fns:
            os.utime(os.path.join(dp, fn), (time.time() - 100,) * 2)
    assert markers, "expected Spark job markers in the delta dir"
    removed = remove_orphan_files(t, older_than_s=1)
    assert removed == 0
    for m in markers:
        assert os.path.exists(m), f"live dir marker {m} was deleted"


def test_compact_log_validates_ts_monotonicity(spark):
    """ADVICE: the dead-state drop assumes ts monotone with lsn — the
    optional validator must catch a source that violates it."""
    import datetime as dt

    from aqueduct_core_spark.operators.compact import compact_log
    from aqueduct_core_spark.verify import ts_lsn_inversions

    t0 = dt.datetime(2024, 1, 1)

    def row(lsn, ts_off_h):
        return (lsn, "I", "c-1", 0, "user", "x", None,
                t0 + dt.timedelta(hours=ts_off_h), 10, 0, None)

    from aqueduct_core_spark.schema import CHANGES_SCHEMA

    # block_bits=14: put rows in different blocks with inverted ts
    ok = spark.createDataFrame(
        [row(0, 0), row(1 << 14, 1), row(2 << 14, 2)], CHANGES_SCHEMA
    )
    assert ts_lsn_inversions(ok) == 0
    compact_log(ok, threshold=t0 + dt.timedelta(hours=1),
                validate_ts_monotone=True).collect()

    bad = spark.createDataFrame([row(0, 5), row(1 << 14, 1)], CHANGES_SCHEMA)
    assert ts_lsn_inversions(bad) > 0
    with pytest.raises(ValueError, match="monotone"):
        compact_log(bad, threshold=t0 + dt.timedelta(hours=2),
                    validate_ts_monotone=True)


def _meta_racer(root: str, barrier, results, idx: int, rounds: int):
    from aqueduct_core_spark.catalog.meta import MetaCommitConflict, VersionedMeta

    vm = VersionedMeta(root)
    wins = conflicts = 0
    for _ in range(rounds):
        barrier.wait()  # both processes attempt the same version together
        meta = vm.read()
        meta["who"] = idx
        try:
            vm.commit(meta, base_version=meta["version"])
            wins += 1
        except MetaCommitConflict:
            conflicts += 1
        barrier.wait()  # round barrier: nobody reads early
    results[idx] = (wins, conflicts)


def test_versioned_meta_race_cross_process(tmp_path):
    """The satellite surfaces' CAS meta (catalog/meta.py) holds across
    OS processes too: two drivers racing the same base version — e.g.
    a compliance process racing the streaming apply process on one
    SCD2 history — produce exactly one winner per round, and the
    version chain never forks or regresses."""
    from aqueduct_core_spark.catalog.meta import VersionedMeta

    root = str(tmp_path / "meta")
    vm = VersionedMeta(root)
    vm.init({"epoch": -1})

    rounds = 20
    ctx = mp.get_context("fork")
    barrier = ctx.Barrier(2)
    mgr = ctx.Manager()
    results = mgr.dict()
    ps = [
        ctx.Process(target=_meta_racer, args=(root, barrier, results, i, rounds))
        for i in range(2)
    ]
    for p in ps:
        p.start()
    for p in ps:
        p.join(timeout=120)
        assert p.exitcode == 0
    (w0, c0), (w1, c1) = results[0], results[1]
    assert w0 + w1 == rounds, (w0, w1, c0, c1)
    assert c0 + c1 == rounds, (w0, w1, c0, c1)
    assert vm.read()["version"] == rounds
